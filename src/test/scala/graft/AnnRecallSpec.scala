package graft

import graft.ops.AnnOps

/** ANN recall GATES on STRUCTURED embeddings. Random embeddings give
  * uninformative buckets by construction (every SRP bucket/IVF list is
  * a uniform sample), so recall measured there is meaningless; here
  * the corpus is clustered — 20 deterministic unit centers, 50 members
  * each with small angular noise (dim 32) — the regime bucketing is
  * FOR, and recall@10 vs the exact brute-force top-k is asserted.
  *
  * Also proves bruteKnnAgg (two-level k-bounded aggregation) is
  * row-identical to the windowed bruteKnn — the large-query-count
  * shape must be an exact drop-in, not an approximation.
  */
class AnnRecallSpec extends SparkSuite {
  import spark.implicits._

  private val dim = 32
  private val nClusters = 20
  private val perCluster = 50

  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(nClusters)(
      unit(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      // 0.05 angular noise → intra-cluster cosine ≈ 0.93, inter ≈ 0 —
      // near-duplicate territory, the regime dedup/ANN bucketing serves
      val v = centers(c).zip(Array.fill(dim)(rnd.nextGaussian().toFloat))
        .map { case (ci, ni) => ci + 0.05f * ni }
      ((c * perCluster + m).toLong, unit(v))
    }
    rows.toDF("vec_id", "embedding").repartition(8).cache()
  }

  private val queryIds = Seq(0L, 50L, 100L, 150L, 200L)
  private val k = 10

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  private lazy val exact =
    topSets(AnnOps.bruteKnn(corpus, "vec_id", "embedding", queryIds, k))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    val hits = queryIds.map(q => (approx.getOrElse(q, Set.empty) & exact(q)).size).sum
    hits.toDouble / (queryIds.size * k)
  }

  test("bruteKnnAgg is row-identical to the windowed bruteKnn") {
    val win = AnnOps.bruteKnn(corpus, "vec_id", "embedding", queryIds, k)
      .as[(Long, Long, Long, Double)].collect().toSet
    val agg = AnnOps.bruteKnnAgg(corpus, "vec_id", "embedding", queryIds, k)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(agg == win)
  }

  test("LSH top-k recall@10 on clustered embeddings") {
    // 8-bit codes — the width the driver query (q17) uses; 16 bits
    // over-partitions a 1000-vector corpus (expected bucket size ≪ 1)
    val got = topSets(AnnOps.lshKnn(corpus, "vec_id", "embedding", queryIds, k,
      bits = 8))
    val r = recallOf(got)
    info(f"lshKnn recall@10 = $r%.3f (8-bit SRP + 1-bit multiprobe)")
    assert(r >= 0.60, f"LSH recall $r%.3f below gate 0.60")
  }

  test("IVF top-k recall@10 on clustered embeddings") {
    // centroids = one representative member per true cluster — the
    // sampled-quantizer assumption IVF rests on
    val centroidIds = (0 until nClusters).map(c => (c * perCluster).toLong)
    val got = topSets(AnnOps.ivfKnn(corpus, "vec_id", "embedding",
      queryIds, centroidIds, k, nprobe = 2))
    val r = recallOf(got)
    info(f"ivfKnn recall@10 = $r%.3f (20 lists, nprobe=2)")
    assert(r >= 0.85, f"IVF recall $r%.3f below gate 0.85")
  }
}
