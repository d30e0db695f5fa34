package graft
class EntrySmokeSpec extends SparkSuite {
  test("driver entry() smoke: rows > 0") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows=$n")
    assert(n > 0)
  }
}
