package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Dev scale probe for the TWO-SIDED (matcher.py main × base) flow at
  * N× bench scale — the regime where hot MAIN keys dominate and the
  * 2-D grid salting carries the skew. Reports stage timings, edge
  * volume, and match precision vs generator ground truth (url encodes
  * the entity id; base ids ARE entity ids).
  * Usage: runMain graft.tools.TwoSidedStress <nEntities> */
object TwoSidedStress {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toLong).getOrElse(80000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t0 = System.nanoTime()
    def mark(label: String): Unit =
      println(f"TSSTRESS $label ${(System.nanoTime() - t0) / 1e9}%.1fs")

    val pages = PagesGen.generate(spark, nEnt, 4, partitions = 64, coined = true)
    val mentions = Pipeline.extractMentions(pages).persist()
    val main = Pipeline.normalize(
      mentions.select(col("mention_id").as("id"), col("name"))).persist()
    println(s"TSSTRESS main ${main.count()}")
    mark("normalize-main")
    val baseRaw = PagesGen.baseUniverse(spark, nEnt, coined = true)
    val base = Pipeline.normalize(baseRaw).persist()
    println(s"TSSTRESS base ${base.count()}")
    mark("normalize-base")
    val edges = Pipeline.scoreCandidates(
      Pipeline.edgeCandidatesTwoSided(main, base)).persist()
    println(s"TSSTRESS edges ${edges.count()}")
    mark("score")
    // precision vs truth: an accepted (mention, base) pair is correct
    // iff the mention's entity == base id
    val truth = mentions.select(col("mention_id").as("id_a"), col("url"))
    val joined = edges.join(truth, Seq("id_a"))
      .select(col("url"), col("id_b")).as[(String, Long)].collect()
    val tp = joined.count { case (u, b) => PagesGen.entityOf(u) == b }
    println(f"TSSTRESS precision ${tp.toDouble / math.max(1, joined.length)}%.4f " +
      s"(tp=$tp of ${joined.length})")
    // recall: entities whose ANY mention matched their own base row
    val hit = joined.collect { case (u, b) if PagesGen.entityOf(u) == b =>
      PagesGen.entityOf(u) }.distinct.length
    println(f"TSSTRESS entity-recall ${hit.toDouble / nEnt}%.4f ($hit/$nEnt)")
    mark("total")
    spark.stop()
  }
}
