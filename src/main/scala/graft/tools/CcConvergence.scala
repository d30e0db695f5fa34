package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Round-7 diagnosis probe: does min-label CC converge within the
  * default maxIter=30 on the 320k coined-corpus one-shot edge set?
  * (The AbsorbStress 320k equality check compares absorbed labels —
  * produced by per-batch incremental CC over SMALL contracted graphs —
  * against a one-shot run(maxIter=30); if the one-shot hits the bound
  * un-converged its labels are under-merged and the comparison damns
  * the wrong side.) Reports label-set agreement between maxIter=30,
  * maxIter=200, and the star algorithm.
  *
  * Usage: runMain graft.tools.CcConvergence [nEntities]
  */
object CcConvergence {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toLong).getOrElse(80000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val norm = Pipeline.normalize(
      Pipeline.extractMentions(
          PagesGen.generate(spark, nEnt, 4, partitions = 64, coined = true))
        .select(col("mention_id").as("id"), col("name")))
      .select("id", "pre_proc", "nosuffix").persist()
    println(s"CCCONV corpus ${norm.count()}")
    val edges = Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(norm))
      .select("id_a", "id_b").localCheckpoint(true)
    println(s"CCCONV edges ${edges.count()}")
    def labelsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.as[(Long, Long)].collect().toSet
    val t1 = System.nanoTime()
    val l30 = labelsOf(ConnectedComponents.run(edges, maxIter = 30))
    println(f"CCCONV run30 done ${(System.nanoTime() - t1) / 1e9}%.1fs")
    val t2 = System.nanoTime()
    val l200 = labelsOf(ConnectedComponents.run(edges, maxIter = 200))
    println(f"CCCONV run200 done ${(System.nanoTime() - t2) / 1e9}%.1fs")
    val t3 = System.nanoTime()
    val lStar = labelsOf(ConnectedComponents.runStar(edges))
    println(f"CCCONV star done ${(System.nanoTime() - t3) / 1e9}%.1fs")
    println(s"CCCONV run30==run200: ${l30 == l200}  " +
      s"run200==star: ${l200 == lStar}  " +
      s"diff30v200: ${(l200 diff l30).size + (l30 diff l200).size}")
    spark.stop()
  }
}
