package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.block.BucketedKeyTable
import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Steady-state cost-model probe: a FIXED crawl increment scored
  * against a standing corpus, three ways, each the best a deployment
  * of that design can do per batch:
  *
  *   - `inc`   — [[Pipeline.incrementalEdges]] over the pre-built
  *     BUCKETED blocking-key table (the er_incremental path): corpus
  *     scans in place, zero corpus exchange, census satisfied by the
  *     bucket layout;
  *   - `plain` — the SAME keyed corpus persisted as plain (unbucketed)
  *     parquet, joined via [[Pipeline.edgeCandidatesTwoSidedKeyed]]:
  *     the key explode is amortized, but every batch re-exchanges the
  *     corpus (census + join) — what a disk-resident corpus without
  *     bucket metadata costs;
  *   - `rekey` — the corpus re-keyed from the normalized table each
  *     batch (keyed persisted for the batch, unpersisted after): the
  *     naive per-batch path, paying explode + exchange every time.
  *
  * Run at two corpus sizes with the same increment and the cost model
  * is directly visible. local[32] walls understate the difference —
  * an in-process "exchange" is a memory copy, and the per-batch wall
  * is dominated by costs common to all variants (hydration broadcast
  * + cascade scoring) — so the probe also reports per-variant SHUFFLE
  * BYTES (task-metric totals for the timed block): on a real cluster
  * shuffle is network, and shuffle-per-batch is exactly the term the
  * bucketed table turns from O(corpus) into O(increment). This is the
  * reference's steady-state flow (match_pair.py:47-58 streams chunks
  * against matcher.py:428-430's fixed base) measured as a scaling
  * curve rather than one point.
  *
  * Usage: runMain graft.tools.SteadyStateProbe [standingEnts] [incEnts]
  * Each variant is timed twice (round-robin); the second sample is the
  * steady-state number (the first absorbs page-cache/JIT warmup).
  */
object SteadyStateProbe {
  def main(args: Array[String]): Unit = {
    val nStand = args.headOption.map(_.toLong).getOrElse(80000L)
    val nInc = args.lift(1).map(_.toLong).getOrElse(2000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // task-metric shuffle/input counters, snapshotted around each
    // timed block (listener events are async — snapshots wait for the
    // listener bus to drain)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val inputRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            inputRead.addAndGet(m.inputMetrics.bytesRead)
          }
        }
      })
    // listener events are async: poll the counters until QUIESCENT
    // (three consecutive 200 ms windows with no movement), capped at
    // 8 s — a fixed sleep on a slow VM era could attribute one timed
    // block's task-end events to the next block's byte totals
    def drainBus(): Unit = {
      val t0 = System.nanoTime()
      var prev = (shufWrite.get, shufRead.get, inputRead.get)
      var stable = 0
      while (stable < 3 && (System.nanoTime() - t0) < 8000000000L) {
        Thread.sleep(200)
        val cur = (shufWrite.get, shufRead.get, inputRead.get)
        if (cur == prev) stable += 1 else stable = 0
        prev = cur
      }
    }

    println(s"STEADY config standing=$nStand ents, increment=$nInc ents")
    val t0 = System.nanoTime()
    def mark(label: String, t: Long): Unit =
      println(f"STEADY $label ${(System.nanoTime() - t) / 1e9}%.1fs")

    // standing universe (normalized, persisted — shared hydration input)
    val tBase = System.nanoTime()
    val baseNorm = Pipeline.normalize(
      PagesGen.baseUniverse(spark, nStand, coined = true)).persist()
    println(s"STEADY standing_norm ${baseNorm.count()}")
    mark("normalize_standing", tBase)

    // the crawl increment: mentions of the first nInc entities (ids
    // overlap the standing range, so real edges exist)
    val tIncN = System.nanoTime()
    val incNorm = Pipeline.normalize(
      Pipeline.extractMentions(
          PagesGen.generate(spark, nInc, 4, partitions = 32, coined = true))
        .select(col("mention_id").as("id"), col("name"))).persist()
    println(s"STEADY increment_norm ${incNorm.count()}")
    mark("normalize_increment", tIncN)

    // one-time corpus persists (untimed slots — reported for honesty):
    // the bucketed standing table and the plain-parquet control
    val table = s"graft_steady_$nStand"
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_steady_$nStand").toString
    val tBuild = System.nanoTime()
    BucketedKeyTable.ensure(spark, table, buckets = 32, s"$root/bucketed") {
      Pipeline.withBlockingKeys(baseNorm).select("id", "key", "nosuffix")
    }
    mark("build_standing_table(one-time)", tBuild)
    val tPlain = System.nanoTime()
    val plainPath = s"$root/plain"
    spark.table(table)
      .select(col("key"), col("id").as("id_b"), col("nosuffix").as("nos_b"))
      .write.mode("overwrite").parquet(plainPath)
    mark("build_plain_keyed(one-time)", tPlain)

    val counts = scala.collection.mutable.Map[String, Long]()
    def timed(label: String)(edges: => Long): Unit = {
      drainBus()
      val (w0, r0, i0) = (shufWrite.get, shufRead.get, inputRead.get)
      val t = System.nanoTime()
      val n = edges
      counts(label.takeWhile(_ != '_')) = n
      drainBus()
      val mb = 1024.0 * 1024.0
      mark(f"$label edges=$n " +
        f"shufW=${(shufWrite.get - w0) / mb}%.1fMB " +
        f"shufR=${(shufRead.get - r0) / mb}%.1fMB " +
        f"input=${(inputRead.get - i0) / mb}%.1fMB", t)
    }
    for (sample <- 1 to 2) {
      timed(s"inc_sample$sample") {
        Pipeline.incrementalEdges(spark, table, incNorm, baseNorm).count()
      }
      timed(s"plain_sample$sample") {
        Pipeline.scoreCandidates(Pipeline.edgeCandidatesTwoSidedKeyed(
          incNorm, baseNorm, spark.read.parquet(plainPath))).count()
      }
      timed(s"rekey_sample$sample") {
        val kb = Pipeline.baseKeyed(baseNorm).persist()
        try Pipeline.scoreCandidates(Pipeline.edgeCandidatesTwoSidedKeyed(
          incNorm, baseNorm, kb)).count()
        finally kb.unpersist(blocking = true)
      }
    }
    require(counts.values.toSet.size == 1,
      s"edge-count divergence across variants: $counts")
    println(s"STEADY edges_identical ${counts.values.head}")
    mark("total", t0)
    spark.stop()
  }
}
