package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.pipeline.Pipeline

/** Driver-run correctness dump: each SparkEntry.queries result →
  * parquet, plus oracle_sql.json for the driver's DuckDB compare.
  *
  * The ER stages run over an in-engine deterministic `pages` corpus
  * DuckDB cannot regenerate, and several dedup/ANN stages hinge on
  * custom signatures (minhash bands, simhash, SRP codes). So Verify
  * COMMITS those deterministic intermediates as parquet `_input_*`
  * tables in outDir; the oracle SQL reads them via read_parquet and
  * verifies every relational skeleton downstream of them (VERDICT.md
  * round-1 item 1). `__OUTDIR__` placeholders in SparkEntry.oracleSql
  * are substituted with the real outDir here.
  */
object Verify {

  /** The committed fixture dump names. Each has an identity
    * self-oracle in SparkEntry.oracleSql (so the driver's correctness
    * artifact carries no `no_oracle` noise rows) — EntrySmokeSpec
    * keeps the two sets in sync, and [[main]]'s dump() rejects names
    * missing here. */
  val fixtureNames: Set[String] = Set(
    "_input_pages", "_input_mentions", "_input_norm_memo",
    "_input_keyed", "_input_keyed_main", "_input_keyed_base",
    "_input_base", "_input_cand_codes", "_input_pair_codes",
    "_input_match_codes", "_input_perm_codes", "_input_variants",
    "_input_persondict", "_input_mh_bands", "_input_simhash",
    "_input_srp", "_input_textfeat", "_input_media_feat")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir0) = args
    val outDir = new java.io.File(outDir0).getAbsolutePath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def dump(name: String)(df: => DataFrame): Unit = {
      require(fixtureNames(name), s"fixture $name missing from Verify.fixtureNames")
      try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] dump $name failed: ${e.getMessage}")
      }
    }

    // ---- committed oracle-input tables (deterministic engine state) ----
    val pages = SparkEntry.pagesFor(spark, sfDir)
    val mentions = Pipeline.extractMentions(pages).persist()
    val mentionIds = mentions.select(col("mention_id").as("id"), col("name"))
    val memo = Pipeline.normalizeMemo(mentionIds).persist()
    val norm = mentionIds.join(memo, Seq("name")).persist()

    dump("_input_pages")(pages.select("url", "warc_ts", "text"))
    dump("_input_mentions")(mentions)
    dump("_input_norm_memo")(memo)
    dump("_input_keyed")(Pipeline.withBlockingKeys(norm).select("id", "key"))
    dump("_input_keyed_main")(Pipeline.withBlockingKeys(norm).select("id", "key"))
    val baseRaw = graft.pages.PagesGen.baseUniverse(
      spark, SparkEntry.entityCountFor(sfDir))
    val baseNorm = Pipeline.normalize(baseRaw).persist()
    dump("_input_base")(baseRaw)
    dump("_input_keyed_base")(
      Pipeline.withBlockingKeys(baseNorm).select("id", "key"))
    // scored-code tables: cascade output per candidate pair, NO accept
    // filter — DuckDB verifies the code>0 filter + downstream joins of
    // er_edges / er_clusters / er_pair_mode / er_match / er_permutation
    // as relational skeletons over these
    dump("_input_cand_codes")(
      Pipeline.scoredCodes(Pipeline.edgeCandidatesSelf(norm)))
    dump("_input_pair_codes")(
      Pipeline.scoredCodes(Pipeline.attachNames(SparkEntry.modPairs(norm), norm)))
    dump("_input_match_codes")(
      Pipeline.scoredCodes(Pipeline.edgeCandidatesTwoSided(norm, baseNorm)))
    dump("_input_perm_codes")(
      Pipeline.attachNames(SparkEntry.modPairs(norm), norm)
        .withColumn("pcode",
          graft.text.LegacyVariants.permutation_score(col("pre_a"), col("pre_b")))
        .select("id_a", "id_b", "pcode"))
    // legacy merge variants per DISTINCT pre_proc (the scalar core is
    // golden-tested; committing the memo lets DuckDB verify q21's
    // distinct-memo join-back skeleton relationally)
    dump("_input_variants")(
      memo.select(col("pre_proc")).distinct()
        .withColumn("merged2",
          graft.text.LegacyVariants.first_two_merged(col("pre_proc")))
        .withColumn("merged3",
          graft.text.LegacyVariants.first_three_merged(col("pre_proc"))))
    dump("_input_persondict") {
      import spark.implicits._
      (graft.text.Dictionaries.firstNames ++ graft.text.Dictionaries.surNames)
        .toSeq.toDF("w")
    }
    val mentionText = mentions.select(col("mention_id").as("id"), col("name").as("text"))
    dump("_input_mh_bands")(DedupOps.minhashBandTable(mentionText, "id", "text"))
    dump("_input_simhash")(DedupOps.simhashTable(mentionText, "id", "text"))
    dump("_input_srp")(DedupOps.srpCodeTable(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding",
      bits = 8, tables = 2))
    // per-DISTINCT-text feature memo (the scalar expressions are
    // spec/golden-tested; committing the memo lets DuckDB verify q14's
    // per-document projection as a distinct-memo join-back skeleton —
    // the same method as q21's `_input_variants`)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    dump("_input_textfeat")(
      docs.select(col("text")).distinct()
        .withColumn("lang_pred", graft.ops.TextOps.lang_id(col("text")))
        .withColumn("n_tokens_est", graft.ops.TextOps.token_estimate(col("text")))
        .withColumn("fp64", graft.ops.TextOps.fingerprint64(col("text")))
        .withColumn("simhash", graft.ops.TextOps.simhash64(col("text"))))
    // fake-decoder feature memo keyed on media_id: the oracle
    // re-derives byte_len/format relationally from `documents` and
    // joins width/height from this memo — verifying q20's in-plan
    // mapPartitions plumbing (row multiplicity + metadata consistency);
    // the decode itself stays the clearly-labeled deterministic stub
    dump("_input_media_feat")(
      graft.ops.MediaOps.extractFeatures(
        graft.ops.MediaOps.mediaTable(docs, "doc_id", "text"))
        .select("media_id", "width", "height"))

    // ---- query results ----
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name done in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__OUTDIR__", outDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // tag the fixture rows (ADVICE r5): the `_input_*` identity
    // self-oracles pass by construction — they prove the committed
    // dumps round-trip, not engine behavior (that is what the
    // downstream query oracles reading them prove). This sidecar lets
    // artifact consumers separate fixture rows from verified-query
    // rows instead of counting both toward the same total.
    val fixturesJson = fixtureNames.toSeq.sorted.map(q).mkString(
      """{"note":"identity self-oracles over committed oracle-input dumps; """ +
        """not engine-verified queries","fixtures":[""", ",", "]}")
    Files.writeString(Paths.get(s"$outDir/fixtures.json"), fixturesJson)
    spark.stop()
  }
}
