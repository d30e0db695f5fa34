package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Pipeline

/** Dev probe: step-wise timing + explain of the blocking plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.1fs ($n)")
    }

    val pages = graft.SparkEntry.pagesFor(spark, sfDir)
    val m = Pipeline.extractMentions(pages).select(col("mention_id").as("id"), col("name"))
    def norm = Pipeline.normalize(m)

    time("warm-extract")(m.count())
    val n = norm
    n.persist()
    time("norm-persist")(n.count())
    val keyed = Pipeline.withBlockingKeys(n)
    time("keyed")(keyed.count())
    val sizes = Pipeline.blockSizes(keyed)
    val dropped = sizes.where(col("block_size") > 200)
    val capped = keyed.join(broadcast(dropped.select("key")), Seq("key"), "left_anti")
    val a = capped.select(col("key"), col("id").as("id_a"))
    val b = capped.select(col("key"), col("id").as("id_b"))
    val raw = a.join(b.hint("SHUFFLE_HASH"), Seq("key"))
      .where(col("id_a") < col("id_b")).select("id_a", "id_b")
    time("raw-pairs")(raw.count())
    val dd = raw.distinct()
    time("pairs-distinct")(dd.count())
    time("attach-names")(Pipeline.attachNames(dd, n).count())
    time("full-candidatesSelf")(Pipeline.candidatesSelf(n).count())
    val edges = Pipeline.scoreCandidates(Pipeline.candidatesSelf(n))
    time("score-over-candidates")(edges.count())
    edges.persist()
    time("edges-persist")(edges.count())
    time("cc")(graft.cluster.ConnectedComponents.assignAll(
      edges.select(col("id_a"), col("id_b")), n.select("id")).count())
    time("endToEnd-fresh")(Pipeline.endToEnd(pages).count())
    spark.stop()
  }
}
