package graft
class EntrySmokeSpec extends SparkSuite {
  test("driver entry() smoke: rows > 0") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows=$n")
    assert(n > 0)
  }

  test("oracle keys are a subset of query keys (no orphan oracles)") {
    // the driver joins oracleSql to queries by name — a typo'd key
    // would silently drop a correctness row
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // since round 4 every driver query has an oracle (q14/q20/q21 via
    // the committed-memo method)
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }
}
