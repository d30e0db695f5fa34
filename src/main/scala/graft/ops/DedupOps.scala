package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}

/** Deduplication operators for training-data pipelines, each shaped
  * for scale: candidate generation is always an equi-join on a compact
  * signature (hash / band / bucket), never an all-pairs comparison,
  * and — critically at 100 TB — only the (id, signature) columns ever
  * enter a shuffle. Document payloads (text, vectors) are joined back
  * AFTER the candidate id-pairs are deduplicated, so the dominant
  * shuffle moves 16-byte pairs, not documents.
  */
object DedupOps {

  /** Exact dedup: survivor (min id) per identical content.
    * Input: (id, text). Output: (keep_id, copies). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .select(col("keep_id"), col("copies"))

  /** MinHash band table: (id, band) — the only columns that shuffle.
    * Default 8 bands × 3 hashes: band-collision probability at
    * jaccard s is 1−(1−s³)⁸ ≈ 0.86 at s=0.6 and ≈ 0.20 at s=0.3 —
    * the round-1 12×2 scheme collided at ≈ 0.66 even for s=0.3,
    * flooding the verify stage with junk candidates. */
  def minhashBandTable(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 24, bands: Int = 8): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(gf.minhash_bands(lower(col(textCol)), numHashes, bands)).as("band"))

  /** Candidate id pairs from the band table: hot-band cap, id-ordered,
    * deduped BEFORE any payload is attached. */
  def minhashCandidateIds(bandTable: DataFrame, maxBucket: Int): DataFrame = {
    val hot = bandTable.groupBy("band").agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket).select("band")
    val capped = bandTable.join(broadcast(hot), Seq("band"), "left_anti")
    val a = capped.select(col("band"), col("id").as("id_a"))
    val b = capped.select(col("band"), col("id").as("id_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** MinHash-LSH near-dup pairs: band-bucket join on (id, band) only,
    * id-pair dedup, then a late join back to text for the word-3-gram
    * Jaccard ≥ `threshold` verification. Input: (id, text).
    *
    * The (id, text) projection and the band table are persisted: each
    * is consumed by several plan branches (band table: hot-band census
    * + both join sides; text: both verify join-backs), and without the
    * persist every branch re-evaluates the upstream docs subtree AND
    * the 24-hash MinHash per row — measured at sf0.1 as ~5 full
    * re-evaluations of the pages→extract→minhash chain, 30.7 s of the
    * q9 wall (guide §1.2: remove repeated passes first). Both tables
    * are (id, small-string)-narrow. Repeated identical calls share one
    * CacheManager entry per plan (the mentionsNormCached idiom). */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val d = docs.select(col(idCol).as("id"), col(textCol).as("text")).persist()
    val ids = minhashCandidateIds(
      minhashBandTable(d, "id", "text").persist(), maxBucket)
    val ta = d.select(col("id").as("id_a"), col("text").as("text_a"))
    val tb = d.select(col("id").as("id_b"), col("text").as("text_b"))
    ids.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .withColumn("jaccard", TextOps.word_ngram_jaccard(col("text_a"), col("text_b"), 3))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash signatures: (id, sig). */
  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.simhash64(col(textCol)).as("sig"))

  /** SimHash near-dup pairs. The 64-bit signature is split into 8
    * 8-bit slices; by pigeonhole, any pair at hamming distance ≤ 7
    * shares at least one identical slice, so the band join is a recall
    * GUARANTEE for every maxHamming ≤ 7 — enforced here (the round-1
    * version silently lost hamming-4..6 pairs with 4 bands). Only
    * (id, band_idx, band_val, sig) shuffles — never the text. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 7, s"8-band scheme guarantees hamming ≤ 7, got $maxHamming")
    val nb = 8
    val w = 8
    val mask = (1L << w) - 1
    val sig = simhashTable(docs, idCol, textCol)
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array((0 until nb).map(b =>
        shiftrightunsigned(col("sig"), b * w).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_val")
    val a = banded.select(col("band_idx"), col("band_val"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b").distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Banded n-gram Jaccard dedup with a SQL-expressible skeleton
    * (oracle-checkable): same-`group` pairs within an id window,
    * scored by DuckDB-compatible char-set jaccard. */
  def bandedCharJaccard(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, window: Int, threshold: Double): DataFrame = {
    val d = docs.select(col(idCol).as("id"), col(textCol).as("text"), col(groupCol).as("grp"))
    val a = d.select(col("grp"), col("id").as("id_a"), col("text").as("text_a"))
    val b = d.select(col("grp"), col("id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("grp"))
      .where(col("id_b") > col("id_a") && col("id_b") <= col("id_a") + window)
      .withColumn("cj", TextOps.char_jaccard(col("text_a"), col("text_b")))
      .where(col("cj") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cj"), 6).as("char_jaccard"))
  }

  /** SRP code table for `tables` independent hash tables: (id, tbl,
    * code). Table t uses hyperplane rows [t·bits, (t+1)·bits) of the
    * shared deterministic family, so table 0 equals a plain
    * `srp_code(vec, bits)`. */
  def srpCodeTable(emb: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .select(col("id"),
        posexplode(array((0 until tables).map(t =>
          AnnOps.srp_code_offset(col("vec"), bits, t * bits)): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "code")

  /** Embedding-cosine near-dup pairs via multi-table random-hyperplane
    * (SRP) bucketing: `tables` independent `bits`-bit sign codes (union
    * of tables recovers recall a single table loses at bucket
    * boundaries), per-bucket cap against hot-bucket O(n²) blowup,
    * id-pair dedup BEFORE vectors are joined back for the exact cosine
    * verify. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8, tables: Int = 2,
      maxBucket: Int = 2000): DataFrame = {
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val coded = srpCodeTable(e, "id", "vec", bits, tables)
    val hot = coded.groupBy("tbl", "code").agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket).select("tbl", "code")
    val capped = coded.join(broadcast(hot), Seq("tbl", "code"), "left_anti")
    val a = capped.select(col("tbl"), col("code"), col("id").as("id_a"))
    val b = capped.select(col("tbl"), col("code"), col("id").as("id_b"))
    val ids = a.join(b.hint("SHUFFLE_HASH"), Seq("tbl", "code"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = e.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val vb = e.select(col("id").as("id_b"), col("vec").as("vec_b"))
    ids.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cos", AnnOps.cosine(col("vec_a"), col("vec_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
  }
}
