package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.pages.PagesGen
import graft.pipeline.{Absorb, Pipeline}

/** Scale stress of the CLOSED steady-state loop (Absorb): a standing
  * corpus is seeded one-shot, then crawl increments are absorbed one
  * by one — cross edges via the bucketed join, increment self edges,
  * bucket-preserving append, contracted-graph label maintenance — and
  * the FINAL label table is checked bit-identical to a one-shot
  * endToEnd clustering of the union corpus (the AbsorbSpec contract,
  * at stress scale).
  *
  * Usage: runMain graft.tools.AbsorbStress [nEntities] [incEntities] [nInc]
  * Defaults 80000 / 2000 / 4 → a 288k-mention standing corpus
  * absorbing four 8k-mention increments (320k mentions total — the
  * same scale as StressProbe's committed runs).
  *
  * Reported per batch: wall, new-edge count, top component sizes (the
  * per-increment over-merge monitor). Then the one-shot comparison
  * wall and the equality verdict.
  */
object AbsorbStress {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toLong).getOrElse(80000L)
    val incEnt = args.lift(1).map(_.toLong).getOrElse(2000L)
    val nInc = args.lift(2).map(_.toInt).getOrElse(4)
    val seedEnt = nEnt - nInc * incEnt
    require(seedEnt > 0, "increments exceed the corpus")
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
    def now(): Double = (System.nanoTime() - t0) / 1e9
    def mark(label: String): Unit = println(f"ABSORB $label ${now()}%.1fs")

    val pages = PagesGen.generate(spark, nEnt, 4, partitions = 64, coined = true)
    val mentions = Pipeline.extractMentions(pages)
      .withColumn("entity",
        regexp_extract(col("url"), "^https://host(\\d+)-", 1).cast("long"))
      .persist()
    val norm = Pipeline.normalize(
        mentions.select(col("mention_id").as("id"), col("name")))
      .join(mentions.select(col("mention_id").as("id"), col("entity")), Seq("id"))
      .select("id", "pre_proc", "nosuffix", "entity").persist()
    println(s"ABSORB mentions ${norm.count()} (seed $seedEnt ents, " +
      s"$nInc × $incEnt-ent increments)")
    mark("normalize")

    def slice(lo: Long, hi: Long) = norm
      .where(col("entity") >= lo && col("entity") < hi)
      .select("id", "pre_proc", "nosuffix")

    val table = s"graft_absorb_stress_${System.nanoTime()}"
    val path = java.nio.file.Files.createTempDirectory("graft_absorb_stress").toString
    val cfg = Pipeline.Config()
    var st = Absorb.init(spark, table, 64, path, slice(0, seedEnt).persist(), cfg)
    println(s"ABSORB seed_labels ${st.labels.count()}")
    mark("seed")
    try {
      var tPrev = now()
      for (b <- 0 until nInc) {
        val lo = seedEnt + b * incEnt
        val r = Absorb.absorb(spark, st, slice(lo, lo + incEnt).persist(), cfg)
        st = r.standing
        val ne = r.newEdges.count()
        val top = r.componentStats.limit(3).collect()
          .map(x => s"${x.getLong(0)}x${x.getLong(1)}").mkString(",")
        println(f"ABSORB batch$b wall ${now() - tPrev}%.1fs new_edges $ne " +
          s"top_components $top")
        tPrev = now()
      }
      mark("absorbed_all")
      val got = st.labels.as[(Long, Long)].collect().toSet

      // one-shot comparison on the union corpus
      val tOne = now()
      val union = norm.select("id", "pre_proc", "nosuffix")
      val oneShot = ConnectedComponents.assignAll(
        Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(union, cfg), cfg)
          .select("id_a", "id_b"), union.select("id"), star = cfg.starCc)
      val want = oneShot.as[(Long, Long)].collect().toSet
      println(f"ABSORB one_shot_wall ${now() - tOne}%.1fs")
      val ok = got == want
      println(s"ABSORB equality ${if (ok) "IDENTICAL" else "DIVERGED"} " +
        s"(absorbed ${got.size} labels, one-shot ${want.size})")
      if (!ok) {
        println(s"ABSORB extra ${(got diff want).take(5)}")
        println(s"ABSORB missing ${(want diff got).take(5)}")
        sys.exit(1)
      }
      ConnectedComponents.componentStats(st.labels).limit(8).collect()
        .foreach(r => println(s"ABSORB compsize ${r.get(0)} x${r.get(1)}"))
      mark("total")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
