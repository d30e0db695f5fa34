package graft
class EntrySmokeSpec extends SparkSuite {
  test("driver entry() smoke: rows > 0") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows=$n")
    assert(n > 0)
  }

  test("oracle keys are a subset of query keys (no orphan oracles)") {
    // the driver joins oracleSql to queries by name — a typo'd key
    // would silently drop a correctness row. The `_input_*` namespace
    // is exempt: those are identity self-oracles for Verify's committed
    // fixture dumps (which are not queries) — each must match a dump
    // name in Verify.scala, checked here against the dump registry.
    val fixtureOracles = SparkEntry.oracleSql.keySet.filter(_.startsWith("_input_"))
    assert(fixtureOracles == Verify.fixtureNames,
      s"fixture self-oracles out of sync with Verify dumps: " +
        s"only-oracle=${fixtureOracles -- Verify.fixtureNames} " +
        s"only-dump=${Verify.fixtureNames -- fixtureOracles}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet -- fixtureOracles
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // since round 4 every driver query has an oracle (q14/q20/q21 via
    // the committed-memo method)
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }
}
