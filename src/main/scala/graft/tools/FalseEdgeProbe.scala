package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Dev probe: sample cross-entity accepted edges with their cascade
  * codes. Usage: runMain graft.tools.FalseEdgeProbe <nEntities> */
object FalseEdgeProbe {
  def main(args: Array[String]): Unit = {
    val nEnt = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pages = PagesGen.generate(spark, nEnt, 4, partitions = 64, coined = true)
    val mentions = Pipeline.extractMentions(pages).persist()
    val norm = Pipeline.normalize(
      mentions.select(col("mention_id").as("id"), col("name"))).persist()
    val edges = Pipeline.scoreCandidates(Pipeline.candidatesSelf(norm))
    val urls = mentions.select(col("mention_id"), col("url"))
    val e2 = edges
      .join(urls.select(col("mention_id").as("id_a"), col("url").as("url_a")), Seq("id_a"))
      .join(urls.select(col("mention_id").as("id_b"), col("url").as("url_b")), Seq("id_b"))
      .select("url_a", "url_b", "code", "pre_a", "pre_b")
      .as[(String, String, Int, String, String)].collect()
    val cross = e2.filter { case (a, b, _, _, _) => PagesGen.entityOf(a) != PagesGen.entityOf(b) }
    println(s"FALSEEDGE total=${e2.length} cross=${cross.length}")
    cross.groupBy(_._3).toSeq.sortBy(-_._2.length).foreach { case (code, xs) =>
      println(s"FALSEEDGE code=$code n=${xs.length}")
      xs.take(3).foreach { case (_, _, _, pa, pb) =>
        println(s"FALSEEDGE   '$pa' vs '$pb'")
      }
    }
    // sample for reference decision-parity check (scratch/check_scale_parity.py)
    val sample = (cross.take(2000) ++
      e2.filter { case (a, b, _, _, _) => PagesGen.entityOf(a) == PagesGen.entityOf(b) }.take(2000))
    val w = new java.io.PrintWriter("/tmp/graft_scale_pairs.csv")
    try sample.foreach { case (_, _, code, pa, pb) =>
      w.println(s"${pa.replace(",", " ")},${pb.replace(",", " ")},$code")
    } finally w.close()
    println(s"FALSEEDGE wrote ${sample.length} sample pairs to /tmp/graft_scale_pairs.csv")
    spark.stop()
  }
}
