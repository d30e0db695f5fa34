package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  *  - brute-force cosine: broadcast the (small) query set, score every
  *    row in one codegen stage — the exact baseline;
  *  - SRP-LSH: 16-bit random-hyperplane sign codes (deterministic
  *    seeded hyperplanes) bucket the corpus; candidates only within
  *    matching buckets — the 100 TB path (bucket join instead of
  *    corpus × queries).
  *
  * Cosines are accumulated left-to-right in Double, matching DuckDB's
  * list_cosine_similarity on a DOUBLE-cast list, so oracle comparisons
  * agree after round(4).
  */
object AnnOps {

  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  case class CosineExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      cosineSim(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override def prettyName: String = "cosine_sim"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineExpr =
      copy(left = l, right = r)
  }

  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Deterministic random hyperplanes: component h[j][i] derived from
    * mix64(seed, j, i), mapped to ±1. Sign pattern → bits-bit code.
    * `rowOffset` selects a disjoint slice of the shared hyperplane
    * family (multi-table LSH); offset 0 is the canonical code. */
  def srpCodeOf(v: ArrayData, bits: Int, rowOffset: Int = 0): Int = {
    var code = 0
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      val n = v.numElements()
      while (i < n) {
        val h = TextOps.mix64(0x5eedc0deL + (j + rowOffset) * 1315423911L + i)
        val sign = if ((h & 1L) == 0L) 1.0 else -1.0
        dot += sign * v.getFloat(i)
        i += 1
      }
      if (dot >= 0) code |= (1 << j)
      j += 1
    }
    code
  }

  case class SrpCode(child: Expression, bits: Int, rowOffset: Int = 0)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      srpCodeOf(v.asInstanceOf[ArrayData], bits, rowOffset)
    override def prettyName: String = "srp_code"
    override protected def withNewChildInternal(c: Expression): SrpCode = copy(child = c)
  }

  def srp_code(c: Column, bits: Int): Column =
    GraftBridge.column(SrpCode(GraftBridge.expression(c), bits))

  def srp_code_offset(c: Column, bits: Int, rowOffset: Int): Column =
    GraftBridge.column(SrpCode(GraftBridge.expression(c), bits, rowOffset))

  /** Exact range search (oracle-friendly: no rank column, threshold on
    * rounded score): all (query, neighbor) with cosine ≥ threshold. */
  def rangeSearch(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], threshold: Double): DataFrame = {
    val q = emb.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
      .where(col("cos") >= threshold)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cosine"))
  }

  /** Brute-force top-k (exact baseline; rank included → not oracle
    * compared, rows-only). */
  def bruteKnn(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cosine"))
  }

  /** Brute-force top-k via a two-level k-BOUNDED aggregation — the
    * large-query-count shape. [[bruteKnn]]'s per-query window sorts
    * each query's entire scored corpus slice in ONE task (parallelism
    * capped at #queries — fine at 5, a straggler at 50k queries);
    * here every (query, shard) group keeps only its local top-k
    * structs, and the per-query merge sorts just shards × k rows.
    * No group ever holds more than max(corpus/shards, shards × k)
    * rows. Output contract identical to [[bruteKnn]]: rank by cosine
    * desc, ties to the smaller neighbor_id — encoded as ascending
    * (-cos, neighbor_id) struct sort, float negation being exact. */
  def bruteKnnAgg(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, shards: Int = 64): DataFrame = {
    val q = emb.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"),
        pmod(xxhash64(col("neighbor_id")), lit(shards)).as("shard"),
        struct((-cosine(col("qvec"), col("nvec"))).as("negcos"),
          col("neighbor_id").as("neighbor_id")).as("s"))
    val partial = scored.groupBy("query_id", "shard")
      .agg(slice(array_sort(collect_list(col("s"))), 1, k).as("top"))
    partial.select(col("query_id"), explode(col("top")).as("s"))
      .groupBy("query_id")
      .agg(slice(array_sort(collect_list(col("s"))), 1, k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as("neighbor_id"),
        round(-col("col.negcos"), 4).as("cosine"))
  }

  /** IVF-flat coarse-quantizer assignment: every vector → its nearest
    * centroid (max cosine, ties → smaller centroid id). Centroids are
    * a deterministic sample of corpus vectors (standard IVF sampled
    * init; k-means rounds would only rebalance the lists — same query
    * path). Returns (id, cid). Scale shape: centroids broadcast, one
    * scan of the corpus, per-id top-1 via a k-bounded aggregate — no
    * all-pairs, no per-query work. */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
      centroidIds: Seq[Long]): DataFrame = {
    val cent = emb.where(col(idCol).isInCollection(centroidIds))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(cent))
      .withColumn("cos", cosine(col("vec"), col("cvec")))
      // max cosine, ties to the SMALLER cid: max of (cos, -cid) struct
      .groupBy(col("id"))
      .agg(max(struct(col("cos"), (-col("cid")).as("ncid"))).as("best"))
      .select(col("id"), (-col("best.ncid")).as("cid"))
  }

  /** IVF-flat top-k: probe the `nprobe` centroids nearest each query,
    * scan only their inverted lists, exact cosine top-k. Same output
    * contract as bruteKnn. */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], centroidIds: Seq[Long], k: Int,
      nprobe: Int = 2): DataFrame = {
    val assign = ivfAssign(emb, idCol, vecCol, centroidIds)
    val cent = emb.where(col(idCol).isInCollection(centroidIds))
      .select(col(idCol).as("cid"), col(vecCol).as("cvec"))
    val probes = {
      val q = emb.where(col(idCol).isInCollection(queryIds))
        .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
        .crossJoin(broadcast(cent))
        .withColumn("ccos", cosine(col("qvec"), col("cvec")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("ccos").desc, col("cid"))
      q.withColumn("prn", row_number().over(w)).where(col("prn") <= nprobe)
        .select("query_id", "qvec", "cid")
    }
    val lists = assign
      .join(emb.select(col(idCol).as("id"), col(vecCol).as("nvec")), Seq("id"))
      .select(col("cid"), col("id").as("neighbor_id"), col("nvec"))
    val cand = probes.join(lists, Seq("cid"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qvec", "neighbor_id", "nvec").distinct()
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cosine"))
  }

  /** LSH-bucketed top-k: same contract as bruteKnn but candidates are
    * restricted to SRP buckets within hamming ≤ 2 of the query code
    * (multi-probe by code expansion). Scale path: the corpus is
    * scanned once to code buckets; queries join buckets, not rows. */
  def lshKnn(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, bits: Int = 16): DataFrame = {
    val coded = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      srp_code(col(vecCol), bits).as("code"))
    val probes = (0 until bits).map(b => lit(1 << b))
    val q = emb.where(col(idCol).isInCollection(queryIds))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        srp_code(col(vecCol), bits).as("qcode"))
      // multi-probe: exact code plus all 1-bit flips
      .withColumn("code", explode(array(col("qcode") +: probes.map(p => col("qcode").bitwiseXOR(p)): _*)))
    val cand = coded.join(broadcast(q), Seq("code"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qvec", "neighbor_id", "nvec").distinct()
      .withColumn("cos", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cosine"))
  }
}
