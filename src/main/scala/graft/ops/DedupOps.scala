package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}

/** Deduplication operators for training-data pipelines, each shaped
  * for scale: candidate generation is always an equi-join on a compact
  * signature (hash / band / bucket), never an all-pairs comparison.
  */
object DedupOps {

  /** Exact dedup: survivor (min id) per identical content.
    * Input: (id, text). Output: (id, keep_id). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
      .select(col("keep_id"), col("copies"))

  /** MinHash-LSH near-dup pairs: band-bucket join, verified with word
    * 3-gram Jaccard ≥ `threshold`. Input: (id, text). */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("band", explode(gf.minhash_bands(lower(col("text")), 24, 12)))
    val hot = keyed.groupBy("band").agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucket).select("band")
    val capped = keyed.join(broadcast(hot), Seq("band"), "left_anti")
    val a = capped.select(col("band"), col("id").as("id_a"), col("text").as("text_a"))
    val b = capped.select(col("band"), col("id").as("id_b"), col("text").as("text_b"))
    a.join(b, Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").distinct()
      .withColumn("jaccard", TextOps.word_ngram_jaccard(col("text_a"), col("text_b"), 3))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 64-bit signature split into 4 16-bit
    * bands (hamming ≤ 3 pairs are guaranteed to share a band). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"),
      TextOps.simhash64(col(textCol)).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        concat_ws(":", lit(b),
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL)))): _*)).as("band"))
    val a = banded.select(col("band"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
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

  /** Embedding-cosine near-dup pairs via random-hyperplane (SRP)
    * bucketing: 16-bit sign code, exact cosine verify inside bucket. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 8): DataFrame = {
    val withCode = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("code", AnnOps.srp_code(col("vec"), bits))
    val a = withCode.select(col("code"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = withCode.select(col("code"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("code"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", AnnOps.cosine(col("vec_a"), col("vec_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
  }
}
