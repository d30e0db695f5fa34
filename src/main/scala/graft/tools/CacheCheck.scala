package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 probe: does a second, separately-constructed invocation of
  * the same query subtree (new PagesGen.map closure instance) hit the
  * CacheManager entry persisted by the first? */
object CacheCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def normPlan() = {
      import org.apache.spark.sql.functions._
      val m = graft.pipeline.Pipeline.extractMentions(
        graft.SparkEntry.pagesFor(spark, sfDir))
      graft.pipeline.Pipeline.normalize(
        m.select(col("mention_id").as("id"), col("name")))
    }
    val a = normPlan().persist()
    val t0 = System.nanoTime()
    a.count()
    println(f"CACHECHECK first  ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val b = normPlan() // fresh closures end to end
    val usesCache = b.queryExecution.withCachedData.toString
      .contains("InMemoryRelation")
    val t1 = System.nanoTime()
    b.count()
    println(f"CACHECHECK second ${(System.nanoTime() - t1) / 1e9}%.1fs " +
      s"usesCache=$usesCache")
    spark.stop()
  }
}
