package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF cosine over token vectors — the north-star scorer the
  * reference only approximates with its df≤2 rare-token signal
  * (/root/reference/coname.py:221-244). Formulated RELATIONALLY
  * (df aggregation → idf → weighted norms → pair dot products) so it
  * runs as plain Catalyst joins/aggs with map-side partial
  * aggregation, and the DuckDB oracle can reproduce it to the digit.
  *
  * Scale notes:
  *  - df/idf is one groupBy over the token table (shuffle on word,
  *    partial-agg'd); the idf side of the weight join is vocabulary-
  *    sized and broadcast — vocabularies stay broadcastable (≪ corpus)
  *    even at web scale;
  *  - the pair dot product shuffles on (pair, word) which is bounded
  *    by tokens-per-name (small constant) × pairs — never corpus²;
  *  - norms are per-name aggregates computed once and joined back, the
  *    same distinct-memo shape the normalizer uses.
  */
object TfIdf {

  /** Term frequencies: (id, word, tf) from a space-tokenized name/text
    * column. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("id", "word").agg(count(lit(1)).as("tf"))

  /** Document frequencies + idf = ln(N / df). */
  def idf(tf: DataFrame): DataFrame = {
    val n = tf.select(countDistinct(col("id")).as("n_docs"))
    tf.groupBy("word").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .withColumn("idf", log(col("n_docs").cast("double") / col("df").cast("double")))
      .select("word", "df", "idf")
  }

  /** TF-IDF cosine for each (id_a, id_b) pair over the token vectors
    * of `docs(idCol, textCol)`. Pairs with no shared token score 0;
    * zero-norm vectors score 0 — including pairs referencing a doc
    * with no tokens at all (or an id absent from `docs`), which the
    * LEFT norm joins keep in the output with nrm 0 instead of
    * silently dropping. Output:
    * (id_a, id_b, tfidf_cosine ∈ [0,1] rounded to 6). */
  def pairCosine(pairs: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val w = tf.join(broadcast(idf(tf).select("word", "idf")), Seq("word"))
      .withColumn("w", col("tf").cast("double") * col("idf"))
      .select("id", "word", "w")
    val norms = w.groupBy("id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val wa = w.select(col("id").as("id_a"), col("word"), col("w").as("wa"))
    val wb = w.select(col("id").as("id_b"), col("word"), col("w").as("wb"))
    val dots = pairs.join(wa, Seq("id_a")).join(wb, Seq("id_b", "word"))
      .groupBy("id_a", "id_b").agg(sum(col("wa") * col("wb")).as("dot"))
    pairs
      .join(dots, Seq("id_a", "id_b"), "left")
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), Seq("id_a"), "left")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        round(when(coalesce(col("na"), lit(0.0)) * coalesce(col("nb"), lit(0.0)) === 0.0, 0.0)
          .otherwise(coalesce(col("dot"), lit(0.0)) / (col("na") * col("nb"))), 6)
          .as("tfidf_cosine"))
  }
}
