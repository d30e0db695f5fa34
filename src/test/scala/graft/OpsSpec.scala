package graft

import org.apache.spark.sql.functions._

import graft.ops.{AnnOps, DedupOps, MediaOps, TextOps}
import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** Training-data ops: dedup family, ANN, text analysis, media stub. */
class OpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exact dedup survivors") {
    val docs = Seq((1L, "aaa"), (2L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
    val got = DedupOps.exact(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds the known near-dup mentions, none across entities") {
    val m = Pipeline.extractMentions(PagesGen.generate(spark, 60, 4))
      .select(col("mention_id").as("id"), col("name").as("text"), col("url"))
    val pairs = DedupOps.minhashPairs(m, "id", "text", threshold = 0.5)
    val withUrls = pairs
      .join(m.select(col("id").as("id_a"), col("url").as("url_a")), Seq("id_a"))
      .join(m.select(col("id").as("id_b"), col("url").as("url_b")), Seq("id_b"))
      .select("url_a", "url_b").as[(String, String)].collect()
    assert(withUrls.nonEmpty)
    val cross = withUrls.count { case (a, b) => PagesGen.entityOf(a) != PagesGen.entityOf(b) }
    assert(cross.toDouble / withUrls.length < 0.05, s"$cross/${withUrls.length} cross-entity")
  }

  test("simhash banding guarantee: pairs ≡ brute-force hamming ≤ 6 join") {
    // 8 bands of 8 bits ⇒ any pair at hamming ≤ 7 shares a band, so the
    // banded join must return EXACTLY the brute-force hamming ≤ 6 set
    // (the round-1 4-band scheme silently lost hamming 4-6 pairs).
    val m = Pipeline.extractMentions(PagesGen.generate(spark, 200, 4))
      .select(col("mention_id").as("id"), col("name").as("text"))
    val got = DedupOps.simhashPairs(m, "id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sigs = m.as[(Long, String)].collect()
      .map { case (id, t) => id -> TextOps.simHash64(t) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ia, ib)).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size} " +
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("simhash hamming ≤3 within bands is found; identical text → hamming 0") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here")).toDF("id", "text")
    val got = DedupOps.simhashPairs(docs, "id", "text").as[(Long, Long, Long)].collect()
    assert(got.exists(r => r._1 == 1L && r._2 == 2L && r._3 == 0L))
    assert(!got.exists(r => r._2 == 3L || r._1 == 3L))
  }

  test("ANN: LSH top-k recall vs brute force at same k") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = AnnOps.bruteKnn(emb, "vec_id", "embedding", qs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = AnnOps.lshKnn(emb, "vec_id", "embedding", qs, 10, bits = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"lsh recall@10 = $recall%.2f (random embeddings: SRP buckets are weakly informative by construction)")
    assert(lsh.nonEmpty)
    // contract: every LSH hit is a genuine corpus pair with a correct score
    val all = emb.select("vec_id").as[Long].collect().toSet
    assert(lsh.forall { case (q, n) => qs.contains(q) && all.contains(n) && q != n })
  }

  test("ANN: IVF assignment is the exact argmax centroid; knn hits are genuine") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = (100L until 116L).toSeq
    val assign = AnnOps.ivfAssign(emb, "vec_id", "embedding", cents)
      .as[(Long, Long)].collect().toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(assign.size == vecs.size) // every vector gets exactly one list
    // spot-check 50 ids: assigned centroid = argmax cosine, ties → min cid
    vecs.keys.toSeq.sorted.take(50).foreach { id =>
      val best = cents.map(c => (cos(vecs(id), vecs(c)), c))
        .maxBy { case (s, c) => (s, -c) }._2
      assert(assign(id) == best, s"id $id: got ${assign(id)} want $best")
    }
    val qs = Seq(0L, 1L, 2L, 3L, 4L)
    val ivf = AnnOps.ivfKnn(emb, "vec_id", "embedding", qs, cents, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (q, n) => qs.contains(q) && vecs.contains(n) && q != n })
    val brute = AnnOps.bruteKnn(emb, "vec_id", "embedding", qs, 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    info(f"ivf recall@10 = ${(brute & ivf.toSet).size.toDouble / brute.size}%.2f " +
      "(random embeddings: coarse lists are weakly informative by construction)")
  }

  test("media frame sampling: n rows per payload, stable offsets, bounded frames") {
    val docs = Seq((1L, "x" * 1000), (2L, "short")).toDF("doc_id", "text")
    val frames = MediaOps.sampleFrames(MediaOps.mediaTable(docs, "doc_id", "text"), n = 5)
      .select(col("media_id"), col("frame_idx"), col("frame_off"), length(col("frame")).as("len"))
      .as[(Long, Int, Int, Int)].collect()
    assert(frames.length == 10) // 2 payloads × 5 frames
    val big = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(big.map(_._3).toSeq == Seq(0, 186, 372, 558, 744)) // (1000-256)*k/4
    assert(big.forall(_._4 == 256))
    val small = frames.filter(_._1 == 2L)
    assert(small.forall(f => f._3 == 0 && f._4 == 5)) // whole payload per frame
    // resize: deterministic, dimension-sensitive
    val t1 = MediaOps.resizeStub("abc".getBytes, 64, 64)
    assert(java.util.Arrays.equals(t1, MediaOps.resizeStub("abc".getBytes, 64, 64)))
    assert(!java.util.Arrays.equals(t1, MediaOps.resizeStub("abc".getBytes, 128, 64)))
    assert(MediaOps.resizeAll(MediaOps.mediaTable(docs, "doc_id", "text"), 64, 64)
      .select("thumb_len").as[Int].collect().forall(_ == 64))
  }

  test("lang_id separates the generator's language mix") {
    val pages = PagesGen.generate(spark, 100, 4)
    val pred = pages.select(col("lang"), TextOps.lang_id(col("text")).as("pred"))
      .groupBy("lang", "pred").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val en = pred.collect { case (("en", p), n) => (p, n) }.toMap
    val ja = pred.collect { case (("ja", p), n) => (p, n) }.toMap
    assert(en.getOrElse("en", 0L) > en.values.sum * 0.9)
    assert(ja.getOrElse("ja", 0L) > ja.values.sum * 0.9)
  }

  test("media stub pipeline: metadata + batched features, deterministic") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val media = MediaOps.mediaTable(docs, "doc_id", "text")
    val f1 = MediaOps.extractFeatures(media).collect().sortBy(_.getLong(0))
    val f2 = MediaOps.extractFeatures(media.repartition(7)).collect().sortBy(_.getLong(0))
    assert(f1.length == 50)
    assert(f1.map(_.toString) sameElements f2.map(_.toString))
    assert(f1.forall(_.getAs[Seq[Float]]("feature").length == 8))
  }

  test("token estimate and fingerprint are stable and sane") {
    assert(TextOps.tokenEstimate("hello world") == 4) // ceil(5/4)·2 word pieces
    assert(TextOps.tokenEstimate("internationalization!") == (20 + 3) / 4 + 1)
    assert(TextOps.tokenEstimate("") == 0)
    assert(TextOps.rollingFingerprint("abc") != TextOps.rollingFingerprint("abd"))
    assert(TextOps.charJaccard("abc", "abd") == 0.5)
    assert(TextOps.charJaccard("aab", "ab") == 1.0)
  }
}
