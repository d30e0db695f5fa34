package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.Pipeline

object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = Pipeline.extractMentions(PagesGen.generate(spark, 50, 4))
      .select(col("mention_id").as("id"), col("name"))
    val norm = Pipeline.normalize(m)
    println("==== NORM INITIAL ====")
    println(norm.queryExecution.executedPlan.toString())
    norm.count()
    println("==== NORM FINAL ====")
    println(norm.queryExecution.executedPlan.toString())
    println("==== CAND INITIAL ====")
    val cand = Pipeline.candidatesSelf(Pipeline.normalize(m))
    println(cand.queryExecution.executedPlan.toString())
    println("==== EDGES FINAL (post-exec) ====")
    val edges = Pipeline.scoreCandidates(cand)
    edges.count()
    println(edges.queryExecution.executedPlan.toString())

    import graft.expr.{functions => gf}
    def filt(df: org.apache.spark.sql.DataFrame) = df
      .where(gf.prefilter_pass(col("nos_a"), col("nos_b"), 50))
      .withColumn("code", gf.match_score(col("pre_a"), col("pre_b")))
      .where(col("code") > 0)
    val a = filt(cand); a.count()
    println("==== A: plain filter ====")
    println(a.queryExecution.executedPlan.toString().linesIterator
      .filter(_.contains("prefilter_pass")).mkString("\n"))
    val b = filt(cand.withColumn("__b", rand(7)).drop("__b")); b.count()
    println("==== B: rand barrier ====")
    println(b.queryExecution.executedPlan.toString().linesIterator
      .filter(_.contains("prefilter_pass")).mkString("\n"))
    val c = filt(cand.observe("dump_c", count(lit(1)))); c.count()
    println("==== C: observe ====")
    println(c.queryExecution.executedPlan.toString().linesIterator
      .filter(_.contains("prefilter_pass")).mkString("\n"))
    spark.stop()
  }
}
