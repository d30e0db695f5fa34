package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: blocking-key census distribution at a given sf dir —
  * evidence for choosing maxBlockSize / runawayBlockSize. */
object BlockCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // "coined:<nEntities>" switches to the StressProbe corpus
    val pages =
      if (sfDir.startsWith("coined:"))
        graft.pages.PagesGen.generate(spark, sfDir.stripPrefix("coined:").toInt,
          4, partitions = 64, coined = true)
      else graft.SparkEntry.pagesFor(spark, sfDir)
    val m = graft.pipeline.Pipeline.extractMentions(pages)
    val n = graft.pipeline.Pipeline.normalize(
      m.select(col("mention_id").as("id"), col("name")))
    val keyed = graft.pipeline.Pipeline.withBlockingKeys(n)
    val sizes = keyed.groupBy("key").agg(count(lit(1)).as("bs")).cache()
    println("CENSUS total keys=" + sizes.count())
    for ((lo, hi) <- Seq((2, 200), (201, 500), (501, 1000), (1001, 2000), (2001, 4000), (4001, 100000))) {
      val rows = sizes.where(col("bs").between(lo, hi))
        .agg(count(lit(1)).as("keys"), sum(col("bs") * (col("bs") - 1) / 2).as("pairs"))
        .collect()(0)
      println(s"CENSUS bucket [$lo,$hi]: keys=${rows.get(0)} selfPairs=${rows.get(1)}")
    }
    sizes.orderBy(col("bs").desc).limit(12).collect()
      .foreach(r => println(s"CENSUS top key=${r.get(0)} bs=${r.get(1)}"))
    spark.stop()
  }
}
