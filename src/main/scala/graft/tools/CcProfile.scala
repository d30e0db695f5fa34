package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline

/** Dev probe: split endToEnd wall-clock into edges vs CC vs the final
  * join-back, and count CC rounds (via the label sum trace). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CCPROF $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val pages = graft.SparkEntry.pagesFor(spark, sfDir)
    val mentions = Pipeline.extractMentions(pages)
    val norm = Pipeline.normalize(
      mentions.select(col("mention_id").as("id"), col("name"))).persist()
    val edges = Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(norm)).persist()
    t("edges")(println("  rows=" + edges.count()))
    val clusters = t("cc")(
      Pipeline.cluster(edges, norm.select("id")).persist())
    t("cc-materialize")(println("  rows=" + clusters.count()))
    val joined = mentions.join(clusters, mentions("mention_id") === clusters("id"))
      .where(!graft.expr.functions.is_person(col("name")))
      .select(col("mention_id"), col("url"), col("name"), col("component"))
    t("joinback+ckpt")(println("  rows=" + joined.localCheckpoint().count()))
    spark.stop()
  }
}
