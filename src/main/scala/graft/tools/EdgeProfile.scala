package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline
import graft.expr.{functions => gf}

/** Dev probe: stage-by-stage timing of the er_edges path at a given
  * sf dir — pair generation, dedup, prefilter, cascade — to locate
  * where wall-clock goes when the candidate volume changes. */
object EdgeProfile {
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
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val pages = graft.SparkEntry.pagesFor(spark, sfDir)
    val m = Pipeline.extractMentions(pages)
    val norm = Pipeline.normalize(
      m.select(col("mention_id").as("id"), col("name"))).persist()
    t("normalize")(println("  rows=" + norm.count()))
    val keyed = Pipeline.withBlockingKeys(norm).persist()
    t("keying")(println("  rows=" + keyed.count()))
    val pairs = Pipeline.candidatePairsSelf(keyed, cacheKeyed = false).persist()
    t("pairs+distinct")(println("  rows=" + pairs.count()))
    val cand = Pipeline.attachNames(pairs, norm).persist()
    t("attach")(println("  rows=" + cand.count()))
    val pre = cand.where(gf.prefilter_pass(col("nos_a"), col("nos_b"), Pipeline.Config().cutoff)).persist()
    t("prefilter")(println("  rows=" + pre.count()))
    val scored = pre.withColumn("code",
      gf.opt_barrier(gf.match_score(col("pre_a"), col("pre_b"))))
      .where(col("code") > 0)
    t("cascade")(println("  rows=" + scored.count()))
    pairs.unpersist(); cand.unpersist(); pre.unpersist()
    // fused path end-to-end (what er_edges actually runs)
    val fused = Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(norm))
    t("fused-edges")(println("  rows=" + fused.count()))
    spark.stop()
  }
}
