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
    // q14/q20 are the two sanctioned no_oracle scalar projections
    assert(unoracled == Set("q14_lang_quality", "q20_media_features"),
      s"unexpected no-oracle queries: $unoracled")
  }
}
