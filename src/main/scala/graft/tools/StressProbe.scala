package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Dev scale probe: the full pages → clusters dataflow at N× the bench
  * scale, reporting stage timings, candidate/edge volumes, and
  * ground-truth pairwise precision/recall (mention urls encode the
  * entity id).
  * Usage: runMain graft.tools.StressProbe <nEntities> [runaway]
  *        [nobroadcast] [star] [hub=N]
  *  - nobroadcast: Config.broadcastNames=false — the 10^12-document
  *    hydration configuration (shuffle joins instead of name
  *    broadcasts); output must be identical, this measures its wall;
  *  - star: cluster with the alternating large/small-star CC
  *    (rounds logged by runStar);
  *  - hub=N: Config.maxHubDegree=N — hub pruning in the main flow. */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toLong).getOrElse(80000L)
    // optional 2nd arg: runawayBlockSize (200 = round-2-style drop-all-
    // hot-blocks capping, for the recall/cost tradeoff table)
    val runaway = args.lift(1).map(_.toInt).getOrElse(4000)
    val flags = args.drop(1).toSet
    val noBroadcast = flags.contains("nobroadcast")
    val star = flags.contains("star")
    val hub = flags.collectFirst { case f if f.startsWith("hub=") =>
      f.stripPrefix("hub=").toInt }
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
      println(f"STRESS $label ${(System.nanoTime() - t0) / 1e9}%.1fs")

    val pages = PagesGen.generate(spark, nEnt, 4, partitions = 64, coined = true)
    val mentions = Pipeline.extractMentions(pages).persist()
    println(s"STRESS mentions ${mentions.count()}")
    mark("extract")
    val norm = Pipeline.normalize(
      mentions.select(col("mention_id").as("id"), col("name"))).persist()
    println(s"STRESS norm ${norm.count()}")
    mark("normalize")
    val cfg = Pipeline.Config(runawayBlockSize = runaway,
      broadcastNames = !noBroadcast, starCc = star, maxHubDegree = hub)
    println(s"STRESS config broadcastNames=${cfg.broadcastNames} " +
      s"starCc=${cfg.starCc} maxHubDegree=${cfg.maxHubDegree} runaway=$runaway")
    val cand = Pipeline.edgeCandidatesSelf(norm, cfg)
    val edges0 = Pipeline.scoreCandidates(cand, cfg).persist()
    println(s"STRESS edges ${edges0.count()}")
    mark("score")
    val edges = cfg.maxHubDegree match {
      case Some(d) => graft.cluster.ConnectedComponents
        .pruneHubs(edges0.select(col("id_a"), col("id_b")), d,
          broadcastHubs = cfg.broadcastNames)
        .toDF("id_a", "id_b").persist()
      case None => edges0
    }
    if (cfg.maxHubDegree.isDefined)
      println(s"STRESS edges_hubpruned ${edges.count()}")
    val clusters = Pipeline.cluster(edges, norm.select("id"), cfg)
    println(s"STRESS clustered ${clusters.count()}")
    mark("cluster")
    graft.cluster.ConnectedComponents.componentStats(clusters)
      .limit(8).collect()
      .foreach(r => println(s"STRESS compsize ${r.get(0)} x${r.get(1)}"))

    // ground-truth pairwise P/R within predicted clusters
    val truth = mentions.select(col("mention_id").as("id"), col("url"))
      .as[(Long, String)].collect().map { case (id, u) => id -> PagesGen.entityOf(u) }.toMap
    val truePairs = truth.values.groupBy(identity).values
      .map { g => g.size.toLong * (g.size - 1) / 2 }.sum
    def pr(label: String, cl: org.apache.spark.sql.DataFrame): Unit = {
      val assign = cl.as[(Long, Long)].collect()
      var tp = 0L; var fp = 0L
      assign.groupBy(_._2).values.filter(_.length > 1).foreach { members =>
        val ids = members.map(_._1)
        for (i <- ids.indices; j <- (i + 1) until ids.length) {
          if (truth(ids(i)) == truth(ids(j))) tp += 1 else fp += 1
        }
      }
      val prec = tp.toDouble / math.max(1, tp + fp)
      val rec = tp.toDouble / math.max(1, truePairs)
      println(f"STRESS $label P=$prec%.4f R=$rec%.4f (tp=$tp fp=$fp truePairs=$truePairs)")
    }
    pr("pairwise", clusters)
    // hub-pruned variant: the production over-merge mitigation
    val pruned = graft.cluster.ConnectedComponents.pruneHubs(
      edges.select(col("id_a"), col("id_b")), maxDegree = 20,
      broadcastHubs = cfg.broadcastNames)
    val clusters2 = Pipeline.cluster(pruned.toDF("id_a", "id_b"),
      norm.select("id"), cfg)
    pr("pairwise-hubpruned(20)", clusters2)
    mark("total")
    spark.stop()
  }
}
