package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.{Absorb, Pipeline}

/** Round-7 diagnosis probe for the 320k absorb divergence: build the
  * absorbed edge set (seed one-shot + per-batch absorb edges) and the
  * one-shot union edge set, DIFF them, and for sample diff pairs print
  * the names and the shared blocking keys with their seed/union census
  * counts — the mechanism of any divergence falls out of which keys
  * generated (or failed to generate) the differing pairs.
  *
  * Usage: runMain graft.tools.EdgeDiff [nEntities] [incEntities] [nInc]
  */
object EdgeDiff {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toLong).getOrElse(80000L)
    val incEnt = args.lift(1).map(_.toLong).getOrElse(2000L)
    val nInc = args.lift(2).map(_.toInt).getOrElse(4)
    val seedEnt = nEnt - nInc * incEnt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mentions = Pipeline.extractMentions(
        PagesGen.generate(spark, nEnt, 4, partitions = 64, coined = true))
      .withColumn("entity",
        regexp_extract(col("url"), "^https://host(\\d+)-", 1).cast("long"))
      .persist()
    val norm = Pipeline.normalize(
        mentions.select(col("mention_id").as("id"), col("name")))
      .join(mentions.select(col("mention_id").as("id"), col("entity")), Seq("id"))
      .select("id", "pre_proc", "nosuffix", "entity").persist()
    println(s"EDGEDIFF corpus ${norm.count()}")
    def slice(lo: Long, hi: Long) = norm
      .where(col("entity") >= lo && col("entity") < hi)
      .select("id", "pre_proc", "nosuffix")

    // absorbed edges = seed one-shot + per-batch absorb outputs
    val cfg = Pipeline.Config()
    val seedEdges = Pipeline.scoreCandidates(
        Pipeline.edgeCandidatesSelf(slice(0, seedEnt).persist(), cfg), cfg)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    println(s"EDGEDIFF seed_edges ${seedEdges.size}")
    val table = s"graft_ediff_${System.nanoTime()}"
    val path = java.nio.file.Files.createTempDirectory("graft_ediff").toString
    var st = Absorb.init(spark, table, 64, path, slice(0, seedEnt), cfg)
    var absorbed = seedEdges
    try {
      for (b <- 0 until nInc) {
        val lo = seedEnt + b * incEnt
        val r = Absorb.absorb(spark, st, slice(lo, lo + incEnt).persist(), cfg,
          monitor = false)
        st = r.standing
        absorbed ++= r.newEdges.select("id_a", "id_b")
          .as[(Long, Long)].collect().toSet
      }
      val union = norm.select("id", "pre_proc", "nosuffix").persist()
      val oneShot = Pipeline.scoreCandidates(
          Pipeline.edgeCandidatesSelf(union, cfg), cfg)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      println(s"EDGEDIFF absorbed ${absorbed.size} oneshot ${oneShot.size}")
      val extra = absorbed diff oneShot   // absorb emitted, one-shot didn't
      val missing = oneShot diff absorbed // one-shot emitted, absorb didn't
      println(s"EDGEDIFF extra ${extra.size} missing ${missing.size}")
      // explain a few: names + shared keys + seed/union census of those keys
      val keyedUnion = Pipeline.withBlockingKeys(union)
        .select(col("id"), col("key")).persist()
      val unionCensus = keyedUnion.groupBy("key")
        .agg(count(lit(1)).as("n_union"))
      val keyedSeed = Pipeline.withBlockingKeys(slice(0, seedEnt))
        .select(col("id"), col("key"))
      val seedCensus = keyedSeed.groupBy("key").agg(count(lit(1)).as("n_seed"))
      def explain(tag: String, pairs: Set[(Long, Long)]): Unit = {
        val sample = pairs.take(3).toSeq
        if (sample.isEmpty) return
        val ids = sample.flatMap(p => Seq(p._1, p._2)).distinct
        val nm = union.where(col("id").isin(ids: _*))
          .select("id", "pre_proc").as[(Long, String)].collect().toMap
        sample.foreach { case (a, bb) =>
          println(s"EDGEDIFF $tag pair ($a,$bb) names " +
            s"'${nm.getOrElse(a, "?")}' | '${nm.getOrElse(bb, "?")}'")
          val ka = keyedUnion.where(col("id") === a).select("key")
            .as[String].collect().toSet
          val kb = keyedUnion.where(col("id") === bb).select("key")
            .as[String].collect().toSet
          val shared = (ka intersect kb).toSeq.sorted
          val censu = unionCensus
            .join(seedCensus, Seq("key"), "full_outer")
            .where(col("key").isin(shared: _*))
            .select("key", "n_seed", "n_union")
            .as[(String, Option[Long], Option[Long])].collect()
          censu.foreach { case (k, ns, nu) =>
            println(s"EDGEDIFF $tag   key $k seed=${ns.getOrElse(0L)} " +
              s"union=${nu.getOrElse(0L)}")
          }
        }
      }
      explain("EXTRA", extra)
      explain("MISSING", missing)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
