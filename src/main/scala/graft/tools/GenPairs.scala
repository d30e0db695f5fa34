package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Dev helper: materialize a deterministic heavy pair-scoring workload
  * (same-entity variant pairs — Bench.scoringWorkload's shape) for the
  * two-cluster-size scaling measurement.
  * Usage: runMain graft.tools.GenPairs <nEntities> <variants> <files> <path> */
object GenPairs {
  def main(args: Array[String]): Unit = {
    val Array(nEnt, variants, files, path) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = PagesGen.generate(spark, nEnt.toLong, variants.toInt)
    val m = Pipeline.extractMentions(pages)
    val n = Pipeline.normalize(m.select(col("mention_id").as("id"), col("name")))
      .join(m.select(col("mention_id").as("id"), col("url")), Seq("id"))
      .withColumn("b", regexp_extract(col("url"), "host(\\d+)-", 1).cast("long"))
    val a = n.select(col("b"), col("id").as("id_a"),
      col("pre_proc").as("pre_a"), col("nosuffix").as("nos_a"))
    val bb = n.select(col("b"), col("id").as("id_b"),
      col("pre_proc").as("pre_b"), col("nosuffix").as("nos_b"))
    val pairs = a.join(bb, Seq("b")).where(col("id_a") < col("id_b"))
      .select("pre_a", "pre_b", "nos_a", "nos_b")
    pairs.repartition(files.toInt).write.mode("overwrite").parquet(path)
    println(s"GENPAIRS ${spark.read.parquet(path).count()} pairs at $path")
    spark.stop()
  }
}
