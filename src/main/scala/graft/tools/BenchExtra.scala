package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 optimization harness (guide §1: measure first; §1.4 noop
  * sink). NOT part of the frozen Bench contract — extra measurements
  * only, cited from OPTIMIZATION_r07.md.
  *
  * Usage:
  *   runMain graft.tools.BenchExtra <sfDir> <query>[,<query>...] \
  *     [--noop] [--explain <outDir>] [--repeat N]
  *
  * Per query: wall seconds of the SAME action Bench times (`.count()`),
  * or a noop-sink write with `--noop` (computes every column — §1.4),
  * with the job labeled (§1.5). `--explain` dumps
  * `.explain("formatted")` to <outDir>/<query>.txt for the plan-shape
  * record the judge checks.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').filter(_.nonEmpty)
    val noop = args.contains("--noop")
    val explainDir = args.sliding(2).collectFirst {
      case Array("--explain", d) => d }
    val repeat = args.sliding(2).collectFirst {
      case Array("--repeat", n) => n.toInt }.getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    explainDir.foreach(d =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    names.foreach { n =>
      for (r <- 1 to repeat) {
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(s"bench-extra: $n run $r")
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val rows =
          if (noop) {
            df.write.format("noop").mode("overwrite").save(); -1L
          } else df.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"BENCHEXTRA $n run$r $secs%.2fs rows=$rows")
        if (r == 1) explainDir.foreach { d =>
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(d, s"$n.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }
    spark.stop()
  }
}
