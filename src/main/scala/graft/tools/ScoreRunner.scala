package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Child process for the two-cluster-size scaling measurement: runs
  * the pair-scoring stage (prefilter + cascade) over a parquet pair
  * table at local[cpus] and prints one line
  * `SCORE_RESULT <pairs> <seconds> <pairsPerSec>`. Launched by Bench
  * under `taskset -c 0..N-1` so "N cores" means N physical cores'
  * worth of cache and bandwidth — the faithful single-box emulation of
  * an N-core executor allocation. */
object ScoreRunner {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val candPath = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-score-$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val cand = spark.read.parquet(candPath)
      // warm codegen + C2 JIT on a parallel ~5% sample (a tiny limit()
      // leaves the cascade interpreter-tier in the timed run)
      cand.where(pmod(xxhash64(col("pre_a"), col("pre_b")), lit(20)) === 0)
        .where(graft.expr.functions.prefilter_pass(col("nos_a"), col("nos_b"), 50))
        .withColumn("code", graft.expr.functions.match_score(col("pre_a"), col("pre_b")))
        .where(col("code") > 0)
        .agg(count(lit(1))).collect()
      val total = cand.count()
      val t0 = System.nanoTime()
      cand
        .where(graft.expr.functions.prefilter_pass(col("nos_a"), col("nos_b"), 50))
        .withColumn("code", graft.expr.functions.match_score(col("pre_a"), col("pre_b")))
        .where(col("code") > 0)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SCORE_RESULT $total $secs%.3f ${total / secs}%.1f")
    } finally spark.stop()
  }
}
