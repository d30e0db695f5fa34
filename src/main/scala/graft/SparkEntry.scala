package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.expr.{functions => gf}
import graft.ops.{AnnOps, DedupOps, MediaOps, TextOps}
import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with a DuckDB oracle wherever the semantics are
  * ANSI-SQL-expressible. Column names/aliases match the oracle SQL
  * exactly (the driver hash-compares by sorted column name).
  *
  * Two input families:
  *  - `er_*`: the record-linkage engine over the BASELINE input_hint
  *    `pages` table, synthesized deterministically at an sf-scaled
  *    size (no oracle — custom semantics; driver does rows-only);
  *  - `q_*`: relational / dedup / text / ANN operators over the
  *    driver's parquet tables, oracle-checked.
  */
object SparkEntry {

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  private def sfOf(dir: String): Double = {
    val i = dir.lastIndexOf("sf")
    if (i < 0) 0.001 else dir.substring(i + 2).takeWhile(c => c.isDigit || c == '.').toDouble
  }

  /** Deterministic pages corpus scaled to the sf directory. */
  def pagesFor(spark: SparkSession, dir: String): DataFrame = {
    val n = math.max(200L, math.min(8000L, (sfOf(dir) * 80000).toLong))
    PagesGen.generate(spark, n, mentionsPerEntity = 4)
  }

  private def mentionsNorm(s: SparkSession, dir: String): DataFrame = {
    val m = Pipeline.extractMentions(pagesFor(s, dir))
    Pipeline.normalize(m.select(col("mention_id").as("id"), col("name")))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * extract → normalize → block → score → cluster dataflow. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.endToEnd(pagesFor(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- record-linkage engine over the input_hint pages table ----
    "er_extract" -> ((s, dir) => Pipeline.extractMentions(pagesFor(s, dir))),
    "er_normalize" -> ((s, dir) => mentionsNorm(s, dir)),
    "er_blocking" -> ((s, dir) =>
      Pipeline.withBlockingKeys(mentionsNorm(s, dir))
        .groupBy("key").agg(count(lit(1)).as("block_size"))),
    "er_candidates" -> ((s, dir) =>
      Pipeline.candidatesSelf(mentionsNorm(s, dir)).select("id_a", "id_b")),
    "er_edges" -> ((s, dir) =>
      Pipeline.scoreCandidates(Pipeline.candidatesSelf(mentionsNorm(s, dir)))
        .select("id_a", "id_b", "code", "score")),
    "er_clusters" -> ((s, dir) => Pipeline.endToEnd(pagesFor(s, dir))
      .select("mention_id", "url", "component")),
    "er_person_filter" -> ((s, dir) =>
      Pipeline.extractMentions(pagesFor(s, dir))
        .where(!gf.is_person(col("name")))
        .select("mention_id", "name")),
    "er_pair_mode" -> ((s, dir) => {
      // match_pair.py contract: pre-blocked (a,b) pairs → accepted edges
      val n = mentionsNorm(s, dir)
      val pairs = n.as("a").join(n.as("b"),
        col("a.id") % 97 === col("b.id") % 97 && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.pre_proc").as("pre_a"), col("b.pre_proc").as("pre_b"),
          col("a.nosuffix").as("nos_a"), col("b.nosuffix").as("nos_b"))
      Pipeline.scoreCandidates(pairs).select("id_a", "id_b")
    }),

    // ---- relational skeleton over driver tables (oracled) ----
    "q1_pricing" -> ((s, dir) =>
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"))),
    "q2_order_counts" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("c_custkey")).as("n_customers"))
    }),
    "q3_window_latest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = s.read.parquet(t(dir, "orders"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("latest_order"),
          col("o_orderdate").as("latest_date"))
    }),
    "q4_events_hourly" -> ((s, dir) =>
      s.read.parquet(t(dir, "events"))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))),
    "q5_semi_anti" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      val without = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      withOrders.select(col("c_custkey"), lit("has_orders").as("status"))
        .union(without.select(col("c_custkey"), lit("no_orders").as("status")))
    }),

    // ---- dedup suite ----
    "q6_dedup_exact" -> ((s, dir) =>
      DedupOps.exact(s.read.parquet(t(dir, "documents")), "doc_id", "text")),
    "q7_doc_fingerprint" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), md5(col("text")).as("content_md5"))),
    "q8_char_jaccard" -> ((s, dir) =>
      DedupOps.bandedCharJaccard(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", "source", window = 40, threshold = 0.9)),
    "q9_dedup_minhash" -> ((s, dir) =>
      DedupOps.minhashPairs(
        Pipeline.extractMentions(pagesFor(s, dir))
          .select(col("mention_id").as("id"), col("name").as("text")),
        "id", "text", threshold = 0.6)
        .select("id_a", "id_b")),
    "q10_dedup_simhash" -> ((s, dir) =>
      DedupOps.simhashPairs(
        Pipeline.extractMentions(pagesFor(s, dir))
          .select(col("mention_id").as("id"), col("name").as("text")),
        "id", "text", maxHamming = 6)
        .select("id_a", "id_b", "hamming")),
    "q11_cosine_dedup" -> ((s, dir) =>
      DedupOps.cosinePairs(s.read.parquet(t(dir, "embeddings")),
        "vec_id", "embedding", threshold = 0.35)),

    // ---- text analysis ----
    "q12_doc_stats" -> ((s, dir) => {
      val d = s.read.parquet(t(dir, "documents"))
      val cols = TextOps.qualityColumns(col("text"))
      d.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
    }),
    "q13_token_df" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("df"))),
    "q14_lang_quality" -> ((s, dir) =>
      s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"),
          TextOps.lang_id(col("text")).as("lang_pred"),
          TextOps.token_estimate(col("text")).as("n_tokens_est"),
          TextOps.fingerprint64(col("text")).as("fp64"),
          TextOps.simhash64(col("text")).as("simhash"))),

    // ---- ANN over embeddings ----
    "q15_ann_range" -> ((s, dir) =>
      AnnOps.rangeSearch(s.read.parquet(t(dir, "embeddings")),
        "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), threshold = 0.25)),
    "q16_ann_topk" -> ((s, dir) =>
      AnnOps.bruteKnn(s.read.parquet(t(dir, "embeddings")),
        "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)),
    "q17_ann_lsh" -> ((s, dir) =>
      AnnOps.lshKnn(s.read.parquet(t(dir, "embeddings")),
        "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, bits = 8)),

    // ---- clustering (oracled via recursive CTE) ----
    "q18_cc_copurchase" -> ((s, dir) => {
      val o = s.read.parquet(t(dir, "orders")).where(col("o_custkey") % 10 === 3)
      val l = s.read.parquet(t(dir, "lineitem"))
      val edges = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 1000000L).as("dst")).distinct()
      ConnectedComponents.run(edges)
        .select(col("id").cast("long").as("id"), col("component").cast("long").as("component"))
    }),

    // ---- legacy-matcher operators (coname.py re-expressed) ----
    "q21_name_variants" -> ((s, dir) =>
      mentionsNorm(s, dir)
        .select(col("id"), col("pre_proc"),
          graft.text.LegacyVariants.first_two_merged(col("pre_proc")).as("merged2"),
          graft.text.LegacyVariants.first_three_merged(col("pre_proc")).as("merged3"))),
    "q22_rare_tokens" -> ((s, dir) => {
      val n = mentionsNorm(s, dir)
      graft.text.LegacyVariants.rareTokens(n, "pre_proc")
        .select(col("word").as("token"), col("df"))
        .union(graft.text.LegacyVariants.rareAdjacentPairs(n, "pre_proc")
          .select(col("pair").as("token"), col("df")))
    }),

    // ---- multimodal plumbing ----
    "q19_media_meta" -> ((s, dir) =>
      MediaOps.mediaTable(s.read.parquet(t(dir, "documents")), "doc_id", "text")
        .select("media_id", "format", "byte_len")),
    "q20_media_features" -> ((s, dir) =>
      MediaOps.extractFeatures(
        MediaOps.mediaTable(s.read.parquet(t(dir, "documents")), "doc_id", "text"))
        .select(col("media_id"), col("byte_len"), col("format"),
          col("width"), col("height")))
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_order_counts" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |COUNT(DISTINCT c_custkey) AS n_customers
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q3_window_latest" ->
      """SELECT o_custkey, o_orderkey AS latest_order, o_orderdate AS latest_date
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,
    "q4_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q5_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q6_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS copies
        |FROM documents GROUP BY text""".stripMargin,
    "q7_doc_fingerprint" ->
      "SELECT doc_id, md5(text) AS content_md5 FROM documents",
    "q8_char_jaccard" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |ROUND(jaccard(a.text, b.text), 6) AS char_jaccard
        |FROM documents a JOIN documents b
        |  ON a.source = b.source
        | AND b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 40
        |WHERE jaccard(a.text, b.text) >= 0.9""".stripMargin,
    "q12_doc_stats" ->
      """SELECT doc_id,
        |CAST(LENGTH(text) AS BIGINT) AS n_chars,
        |CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_spaces,
        |CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
        |CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_words
        |FROM documents""".stripMargin,
    "q13_token_df" ->
      """SELECT word, COUNT(*) AS df FROM
        |(SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin,
    "q15_ann_range" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |           WHERE vec_id IN (0,1,2,3,4))
        |SELECT q.query_id, e.vec_id AS neighbor_id,
        |ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      CAST(q.embedding AS DOUBLE[])), 4) AS cosine
        |FROM embeddings e, q
        |WHERE e.vec_id <> q.query_id
        |AND list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |    CAST(q.embedding AS DOUBLE[])) >= 0.25""".stripMargin,
    "q18_cc_copurchase" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey % 10 = 3
        |), sym AS (
        |  SELECT a, b FROM e UNION SELECT b, a FROM e
        |), reach AS (
        |  SELECT a AS id, b AS r FROM sym
        |  UNION
        |  SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a
        |)
        |SELECT CAST(id AS BIGINT) AS id,
        |CAST(LEAST(id, MIN(r)) AS BIGINT) AS component
        |FROM reach GROUP BY id""".stripMargin,
    "q19_media_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
        |CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |ELSE 'wav' END AS format,
        |CAST(octet_length(encode(text)) AS INTEGER) AS byte_len
        |FROM documents""".stripMargin
  )
}
