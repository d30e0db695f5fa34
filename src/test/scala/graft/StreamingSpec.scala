package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.pages.PagesGen
import graft.streaming.StreamingPipeline

/** Streaming extract/normalize/dedup driven synchronously through the
  * memory sink (batch parquet as a bounded stream). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming mentions + windowed counts over a pages directory") {
    val dir = Files.createTempDirectory("graft_stream").toString
    PagesGen.generate(spark, 50, 4).write.mode("overwrite").parquet(dir)

    val mentions = StreamingPipeline.streamingMentions(spark, dir)
    assert(mentions.isStreaming)
    val q = StreamingPipeline.windowedMentionCounts(mentions)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM win_counts").collect()
    assert(rows.nonEmpty)
    val total = spark.sql("SELECT sum(n) FROM win_counts").as[Long].head()
    assert(total == 200) // 50 entities × 4 mentions
  }

  test("incremental ER: foreachBatch edges ≡ batch two-sided match; restart resumes") {
    import graft.pipeline.Pipeline
    val pagesDir = Files.createTempDirectory("graft_inc_pages").toString
    val edgesDir = Files.createTempDirectory("graft_inc_edges").toString + "/e"
    val ckptDir = Files.createTempDirectory("graft_inc_ckpt").toString
    val nEnt = 40L
    PagesGen.generate(spark, nEnt, 4).write.mode("overwrite").parquet(pagesDir)
    val base = Pipeline.normalize(PagesGen.baseUniverse(spark, nEnt))

    val q = StreamingPipeline.incrementalEdges(spark, pagesDir, base, edgesDir, ckptDir)
    q.awaitTermination(180000)
    val streamed = spark.read.parquet(edgesDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // batch equivalent over the same pages
    val mentions = Pipeline.extractMentions(spark.read.parquet(pagesDir))
    val main = Pipeline.normalize(mentions.select($"mention_id".as("id"), $"name"))
    val batch = Pipeline.scoreCandidates(Pipeline.candidatesTwoSided(main, base))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")

    // restart with the same checkpoint: no new input → no duplicate edges
    val q2 = StreamingPipeline.incrementalEdges(spark, pagesDir, base, edgesDir, ckptDir)
    q2.awaitTermination(120000)
    val after = spark.read.parquet(edgesDir).count()
    assert(after == streamed.size, "restart must not reprocess committed batches")
  }

  test("incremental ER over the bucketed standing table ≡ batch; restart re-registers, no reprocess") {
    import graft.block.BucketedKeyTable
    import graft.pipeline.Pipeline
    val pagesDir = Files.createTempDirectory("graft_binc_pages").toString
    val edgesDir = Files.createTempDirectory("graft_binc_edges").toString + "/e"
    val ckptDir = Files.createTempDirectory("graft_binc_ckpt").toString
    val keyedDir = Files.createTempDirectory("graft_binc_keyed").toString
    val nEnt = 40L
    PagesGen.generate(spark, nEnt, 4).write.mode("overwrite").parquet(pagesDir)
    val base = Pipeline.normalize(PagesGen.baseUniverse(spark, nEnt))
    try {
      BucketedKeyTable.ensure(spark, "graft_stream_standing", 8, keyedDir) {
        Pipeline.withBlockingKeys(base).select("id", "key", "nosuffix")
      }
      val q = StreamingPipeline.incrementalEdgesBucketed(
        spark, pagesDir, "graft_stream_standing", base, edgesDir, ckptDir)
      q.awaitTermination(180000)
      val streamed = spark.read.parquet(edgesDir)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

      val mentions = Pipeline.extractMentions(spark.read.parquet(pagesDir))
      val main = Pipeline.normalize(mentions.select($"mention_id".as("id"), $"name"))
      val batch = Pipeline.scoreCandidates(Pipeline.candidatesTwoSided(main, base))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")

      // restart as a fresh session would: the catalog entry is gone but
      // the committed bucketed files are not — ensure() re-registers
      // (never rebuilds), and the checkpoint skips committed batches
      spark.sql("DROP TABLE graft_stream_standing")
      BucketedKeyTable.ensure(spark, "graft_stream_standing", 8, keyedDir) {
        fail("restart must re-register the committed standing table, not rebuild")
      }
      val q2 = StreamingPipeline.incrementalEdgesBucketed(
        spark, pagesDir, "graft_stream_standing", base, edgesDir, ckptDir)
      q2.awaitTermination(120000)
      assert(spark.read.parquet(edgesDir).count() == streamed.size,
        "restart must not reprocess committed batches")
    } finally spark.sql("DROP TABLE IF EXISTS graft_stream_standing")
  }

  test("absorbing stream: batches fold into the standing state; labels ≡ one-shot; monitor per batch") {
    import org.apache.spark.sql.functions.col
    import graft.cluster.ConnectedComponents
    import graft.pipeline.{Absorb, Pipeline}
    val pagesDir = Files.createTempDirectory("graft_abs_pages").toString
    val edgesDir = Files.createTempDirectory("graft_abs_edges").toString + "/e"
    val ckptDir = Files.createTempDirectory("graft_abs_ckpt").toString
    val keyedDir = Files.createTempDirectory("graft_abs_keyed").toString
    val nEnt = 40L
    // seed corpus = mentions of the first half of the entities;
    // the stream delivers the second half's pages
    val allNorm = Pipeline.normalize(
      Pipeline.extractMentions(PagesGen.generate(spark, nEnt, 4))
        .select($"mention_id".as("id"), $"name"))
      .select("id", "pre_proc", "nosuffix").persist()
    val seedNorm = Pipeline.normalize(
      Pipeline.extractMentions(
          PagesGen.generate(spark, nEnt / 2, 4))
        .select($"mention_id".as("id"), $"name"))
      .select("id", "pre_proc", "nosuffix").persist()
    // stream input: the pages of entities nEnt/2 .. nEnt
    PagesGen.generate(spark, nEnt, 4)
      .where(col("url").rlike("^https://host(2\\d|3\\d)-"))
      .write.mode("overwrite").parquet(pagesDir)
    val table = s"graft_abs_stream_${System.nanoTime()}"
    try {
      val st0 = Absorb.init(spark, table, 8, keyedDir, seedNorm)
      val (q, stRef) = StreamingPipeline.absorbingEdges(
        spark, pagesDir, st0, edgesDir, ckptDir)
      q.awaitTermination(240000)
      val st = stRef.get
      // labels over seed ∪ streamed ≡ one-shot batch clustering
      val want = ConnectedComponents.assignAll(
        Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(allNorm))
          .select("id_a", "id_b"), allNorm.select("id"))
        .as[(Long, Long)].collect().toSet
      val got = st.labels.as[(Long, Long)].collect().toSet
      assert(got.nonEmpty && got == want,
        s"absorbing-stream labels diverge from one-shot: got=${got.size} want=${want.size}")
      // the per-batch over-merge monitor is live: the component-size
      // histogram of the final state is non-trivial
      val stats = ConnectedComponents.componentStats(st.labels)
        .as[(Long, Long)].collect()
      assert(stats.nonEmpty && stats.map(_._2).sum > 0)
      // replay protection: a second run over the same checkpoint must
      // not double-absorb (standing row count unchanged)
      val rowsBefore = spark.table(table).count()
      val (q2, _) = StreamingPipeline.absorbingEdges(
        spark, pagesDir, st, edgesDir, ckptDir)
      q2.awaitTermination(120000)
      assert(spark.table(table).count() == rowsBefore,
        "restart must not re-append absorbed batches")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("stateful dedup emits one first_url per distinct normalized name") {
    val dir = Files.createTempDirectory("graft_stream2").toString
    PagesGen.generate(spark, 30, 4).write.mode("overwrite").parquet(dir)
    val mentions = StreamingPipeline.streamingMentions(spark, dir)
    // NOT AvailableNow, and NOT awaitTermination/processAllAvailable:
    // with ProcessingTimeTimeout timers registered the engine keeps
    // scheduling micro-batches to evaluate them, so the query never
    // reaches the settled state either call waits for — and under
    // AvailableNow's zero-interval trigger that became a busy loop
    // (jstack: 248 CPU-seconds of empty batch commits). A real
    // deployment runs exactly this shape: a paced trigger on an
    // endless query. Poll the sink for the data, then stop.
    val q = StreamingPipeline.dedupedMentions(spark, mentions)
      .writeStream.outputMode("update")
      .format("memory").queryName("dedup")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    def seen() = spark.sql(
      "SELECT pre_proc, first_url FROM dedup WHERE first_url IS NOT NULL")
      .as[(String, String)].collect()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    var rows = seen()
    while (rows.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(500); rows = seen()
    }
    q.stop()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one state row per name")
  }
}
