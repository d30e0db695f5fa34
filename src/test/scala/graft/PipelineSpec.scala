package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.pages.{Extract, PagesGen}
import graft.pipeline.{Lineage, Pipeline}

/** End-to-end pipeline: extraction invariant, blocking recall,
  * clustering, resumability. */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val pages = PagesGen.generate(spark, nEntities = 120,
    mentionsPerEntity = 4, partitions = 8).cache()

  test("pages table has the mandated input_hint schema") {
    val s = pages.schema.map(f => (f.name, f.dataType.simpleString))
    assert(s == Seq("url" -> "string", "warc_ts" -> "timestamp",
      "html" -> "binary", "text" -> "string", "lang" -> "string"))
  }

  test("extracted text is byte-identical per url (determinism invariant)") {
    // regenerate independently and compare per-url sha256 of text
    val again = PagesGen.generate(spark, 120, 4, partitions = 3)
    val h1 = pages.select($"url", sha2($"text", 256).as("h")).as[(String, String)].collect().toMap
    val h2 = again.select($"url", sha2($"text", 256).as("h")).as[(String, String)].collect().toMap
    assert(h1 == h2)
    // and extract_text(html) reproduces the stored text column exactly
    val mismatch = pages.where(Extract.extract_text($"html") =!= $"text").count()
    assert(mismatch == 0)
  }

  test("golden checksum of extracted text is stable") {
    val all = pages.select(sha2(concat_ws("\u0000", $"url", $"text"), 256).as("h"))
      .agg(sha2(concat_ws(",", sort_array(collect_list($"h"))), 256)).as[String].head()
    val goldenPath = java.nio.file.Paths.get("src/test/resources/golden/text_golden.sha256")
    if (!Files.exists(goldenPath)) {
      Files.write(goldenPath, all.getBytes("UTF-8"))
      info(s"wrote new golden checksum $all")
    } else {
      val want = new String(Files.readAllBytes(goldenPath), "UTF-8").trim
      assert(all == want, "extracted-text corpus checksum drifted")
    }
  }

  test("mention extraction finds exactly one company per page") {
    val m = Pipeline.extractMentions(pages)
    assert(m.count() == pages.count())
    assert(m.where($"name".isNull || $"name" === "").count() == 0)
  }

  test("blocking recall: every reference-accepted golden pair shares a key") {
    import graft.block.BlockingKeys
    val accepted = Csv.records("golden/cascade_golden.csv")
      .filter(r => r("accept") == "1")
      .map(r => (r("a_norm"), r("b_norm")))
    var miss = 0
    accepted.foreach { case (a, b) =>
      val ka = BlockingKeys.keys(a).toSet
      val kb = BlockingKeys.keys(b).toSet
      if ((ka & kb).isEmpty) { miss += 1; info(s"NO SHARED KEY: <$a> <$b>") }
    }
    assert(miss == 0, s"$miss accepted pairs would be lost by blocking")
  }

  test("connected components: transitive chain merges, separate stays apart") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)).toDF("src", "dst")
    val got = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(!got.contains(20L)) // self-loop dropped
    val all = ConnectedComponents.assignAll(edges,
      Seq(1L, 2L, 3L, 10L, 11L, 20L, 99L).toDF("id")).as[(Long, Long)].collect().toMap
    assert(all(20L) == 20L && all(99L) == 99L)
  }

  test("end-to-end: pipeline clusters variants of the same entity together") {
    val clustered = Pipeline.endToEnd(pages).cache()
    val withTruth = clustered.withColumn("entity",
      udf((u: String) => PagesGen.entityOf(u)).apply($"url"))
    val n = withTruth.count()
    assert(n > 0)
    // pairwise precision/recall vs ground-truth entity ids
    val joined = withTruth.as("l").join(withTruth.as("r"),
      col("l.mention_id") < col("r.mention_id"))
    val sameCluster = joined.where(col("l.component") === col("r.component"))
    val tp = sameCluster.where(col("l.entity") === col("r.entity")).count()
    val fp = sameCluster.count() - tp
    val truePairs = joined.where(col("l.entity") === col("r.entity")).count()
    val fn = truePairs - tp
    val prec = tp.toDouble / math.max(1, tp + fp)
    val rec = tp.toDouble / math.max(1, tp + fn)
    info(f"e2e pairwise vs ground truth: tp=$tp fp=$fp fn=$fn P=$prec%.3f R=$rec%.3f")
    assert(prec > 0.9, s"precision $prec")
    assert(rec > 0.5, s"recall $rec") // typo'd variants are intentionally hard
  }

  test("name-level memo scoring ≡ mention-level scoring (duplicated corpus, self-rejecting names)") {
    // duplicate the corpus (same names under fresh urls → fresh mention
    // ids) and inject mentions of names the cascade REJECTS against
    // themselves (match(a,a) < 0: all-suffix "holdings" → −1,
    // too-general "trust inc" → −21) — the branch where blind
    // name-node contraction would diverge from mention-level scoring
    val ts0 = new java.sql.Timestamp(0L)
    val extra = (1 to 3).flatMap(i => Seq(
      (s"https://dup.test/h$i", ts0, Array[Byte](), "Company: HOLDINGS", "en"),
      (s"https://dup.test/t$i", ts0, Array[Byte](), "Company: TRUST CO", "en")))
      .toDF("url", "warc_ts", "html", "text", "lang")
    val dup = pages.unionByName(pages.withColumn("url", concat($"url", lit("#d1"))))
      .unionByName(extra)
    val got = Pipeline.endToEnd(dup)
      .select($"mention_id", $"url", $"component")
    // the expanded comparator: score one pair per MENTION pair
    val mentions = Pipeline.extractMentions(dup)
    val norm = Pipeline.normalize(
      mentions.select($"mention_id".as("id"), $"name")).persist()
    val edges = Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(norm))
    val clusters = Pipeline.cluster(edges, norm.select("id"))
    val want = mentions.join(clusters, mentions("mention_id") === clusters("id"))
      .where(!graft.expr.functions.is_person($"name"))
      .select(mentions("mention_id"), $"url", $"component")
    val g = got.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val w = want.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(g == w, s"name-level and mention-level cluster outputs differ: " +
      s"only-name-level=${(g -- w).take(5)} only-mention-level=${(w -- g).take(5)}")
    // and the self-rejecting duplicated names really stay singletons
    val hcomp = g.filter(_._2.startsWith("https://dup.test/h")).map(_._3)
    assert(hcomp.size == 3, s"holdings mentions merged: $hcomp")
    // AT THE RUNAWAY BOUNDARY: with every name duplicated (w = 2), a
    // key can hold > runaway MENTIONS but ≤ runaway NAMES. The
    // mention-weighted census (nameNodes.w → blockSizes sum) must make
    // the name-level path drop exactly what mention-level drops —
    // without the weighting this diverges precisely here.
    val tiny = Pipeline.Config(maxBlockSize = 5, runawayBlockSize = 12)
    val gotT = Pipeline.endToEnd(dup, tiny)
      .select($"mention_id", $"url", $"component")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val edgesT = Pipeline.scoreCandidates(Pipeline.edgeCandidatesSelf(norm, tiny), tiny)
    val clustersT = Pipeline.cluster(edgesT, norm.select("id"), tiny)
    val wantT = mentions.join(clustersT, mentions("mention_id") === clustersT("id"))
      .where(!graft.expr.functions.is_person($"name"))
      .select(mentions("mention_id"), $"url", $"component")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(gotT == wantT, s"boundary divergence: " +
      s"only-name-level=${(gotT -- wantT).take(5)} only-mention-level=${(wantT -- gotT).take(5)}")
    // ADVICE r3: a SELF-ACCEPTING name with ≥2 mentions whose EVERY
    // blocking key is runaway-dropped gets no mention pairs under
    // mention-level scoring — name-level contraction must leave its
    // mentions singletons too. maxBlockSize=1/runawayBlockSize=1 drops
    // every block of (weighted) size ≥2, i.e. every duplicated name's
    // blocks: no edges, everything a singleton on both paths. Without
    // the keptBlockIds gate, every self-accepting duplicated name
    // wrongly contracts here.
    val allDrop = Pipeline.Config(maxBlockSize = 1, runawayBlockSize = 1)
    val gotA = Pipeline.endToEnd(dup, allDrop)
      .select($"mention_id", $"component")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotA.nonEmpty)
    val merged = gotA.filter { case (m, c) => m != c }
    assert(merged.isEmpty,
      s"all-keys-runaway names must stay singletons, merged: ${merged.take(5).toSeq}")
    norm.unpersist()
  }

  test("maxHubDegree: pruning lifts precision on a hub-chained graph; Config wires it") {
    import spark.implicits._
    // ground truth: two 5-cliques; a hub vertex (degree 10) chains them
    val cliqueA = for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)
    val cliqueB = for { a <- 11L to 15L; b <- (a + 1) to 15L } yield (a, b)
    val hub = (1L to 5L).map(v => (100L, v)) ++ (11L to 15L).map(v => (100L, v))
    val edges = (cliqueA ++ cliqueB ++ hub).toDF("src", "dst")
    def precision(labels: Map[Long, Long]): Double = {
      val ids = ((1L to 5L) ++ (11L to 15L)).toSeq
      val same = for { a <- ids; b <- ids if a < b && labels(a) == labels(b) }
        yield (a <= 5L) == (b <= 5L)
      same.count(identity).toDouble / same.size
    }
    val unpruned = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    val pruned = ConnectedComponents.run(ConnectedComponents.pruneHubs(edges, 5))
      .as[(Long, Long)].collect().toMap
    val pU = precision(unpruned)
    val pP = precision(pruned)
    info(f"precision unpruned=$pU%.3f pruned=$pP%.3f")
    assert(pU < 0.5, s"hub must chain the cliques unpruned ($pU)")
    assert(pP == 1.0, s"degree-5 pruning must separate the cliques ($pP)")
    // Config wiring: maxHubDegree=0 drops every name-level edge, so no
    // component may span two distinct NORMALIZED names (same-node
    // contraction — raw variants sharing one pre_proc — survives by
    // design: pruning is defined on the name graph)
    val out = Pipeline.endToEnd(pages, Pipeline.Config(maxHubDegree = Some(0)))
    val norm0 = Pipeline.normalize(out.select($"mention_id".as("id"), $"name"))
    val maxNames = out.join(norm0.select($"id".as("mention_id"), $"pre_proc"),
        Seq("mention_id"))
      .groupBy("component")
      .agg(countDistinct("pre_proc").as("k")).agg(max($"k")).head().getLong(0)
    assert(maxNames == 1L, s"maxHubDegree=0 left a cross-name merge ($maxNames)")
  }

  test("broadcastNames=false (shuffle hydration) is plan-only: output identical") {
    // ADVICE r3: at 10^12-document scale the distinct-name tables
    // outgrow the broadcast envelope; the shuffle-join strategy must
    // change the plan, never the result
    import spark.implicits._
    val a = Pipeline.endToEnd(pages)
      .select("mention_id", "component").as[(Long, Long)].collect().toSet
    val b = Pipeline.endToEnd(pages, Pipeline.Config(broadcastNames = false))
      .select("mention_id", "component").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("starCc=true (large/small-star clustering) is algorithm-only: output identical") {
    // the chain-heavy-corpus algorithm switch must change round
    // complexity, never labels — endToEnd-level twin of StarCcSpec's
    // graph-level equivalence
    import spark.implicits._
    val a = Pipeline.endToEnd(pages)
      .select("mention_id", "component").as[(Long, Long)].collect().toSet
    val b = Pipeline.endToEnd(pages, Pipeline.Config(starCc = true))
      .select("mention_id", "component").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("reliable checkpointing at stress scale: clusters identical to localCheckpoint") {
    // VERDICT r3 task 6: the cluster-default reliable-checkpoint path,
    // exercised beyond unit size — 2400 mentions through the full
    // endToEnd (multi-round CC, salting, contraction), asserting
    // bit-identical clusters against the localCheckpoint path.
    import spark.implicits._
    val big = PagesGen.generate(spark, nEntities = 600,
      mentionsPerEntity = 4, partitions = 8)
    val ckDir = Files.createTempDirectory("graft_reliable_stress").toString
    val local = Pipeline.endToEnd(big).select("mention_id", "component")
      .as[(Long, Long)].collect().toSet
    val reliable = Pipeline.endToEnd(big,
        Pipeline.Config(reliableCheckpointDir = Some(ckDir)))
      .select("mention_id", "component").as[(Long, Long)].collect().toSet
    assert(reliable == local)
    assert(new java.io.File(ckDir).listFiles().nonEmpty,
      "reliable mode must write to the checkpoint dir")
  }

  test("reliable checkpointing: CC + endToEnd identical under checkpoint()") {
    import spark.implicits._
    val ckDir = Files.createTempDirectory("graft_reliable_ck").toString
    // CC itself: same labels either way
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val local = ConnectedComponents.run(edges).as[(Long, Long)].collect().toSet
    spark.sparkContext.setCheckpointDir(ckDir)
    val reliable = ConnectedComponents.run(edges, reliable = true)
      .as[(Long, Long)].collect().toSet
    assert(reliable == local)
    assert(new java.io.File(ckDir).listFiles().nonEmpty,
      "reliable mode must write to the checkpoint dir")
    // the Config wiring: endToEnd output unchanged under the flag
    val a = Pipeline.endToEnd(pages).select("mention_id", "component")
      .as[(Long, Long)].collect().toSet
    val b = Pipeline.endToEnd(pages,
        Pipeline.Config(reliableCheckpointDir = Some(ckDir)))
      .select("mention_id", "component").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("TableIO seam: runResumable routes every read/write/fingerprint through it") {
    val reads = new java.util.concurrent.atomic.AtomicInteger
    val writes = new java.util.concurrent.atomic.AtomicInteger
    val fps = new java.util.concurrent.atomic.AtomicInteger
    val counting = new graft.pipeline.TableIO {
      def read(s: org.apache.spark.sql.SparkSession, p: String) = {
        reads.incrementAndGet(); graft.pipeline.ParquetTableIO.read(s, p)
      }
      def write(df: org.apache.spark.sql.DataFrame, p: String) = {
        writes.incrementAndGet(); graft.pipeline.ParquetTableIO.write(df, p)
      }
      def fingerprint(p: String) = {
        fps.incrementAndGet(); graft.pipeline.ParquetTableIO.fingerprint(p)
      }
    }
    val root = Files.createTempDirectory("graft_tableio").toString
    val fp = Lineage.sha("pages-tableio-v1")
    val first = Pipeline.runResumable(spark, pages, root, fp, io = counting)
      .collect().toSet
    assert(writes.get == 4, s"4 stage commits expected, saw ${writes.get}")
    assert(fps.get == 3, s"3 chained fingerprints expected, saw ${fps.get}")
    val w1 = writes.get
    // resume: all reads, no writes, same rows — through the same seam
    val second = Pipeline.runResumable(spark, pages, root, fp, io = counting)
      .collect().toSet
    assert(writes.get == w1, "resume must not rewrite committed stages")
    assert(second == first)
  }

  test("hot blocking keys are salted, not dropped: every hot-block pair is found") {
    import spark.implicits._
    val cfg = Pipeline.Config(maxBlockSize = 10, runawayBlockSize = 50)
    // three tiers: small (5 rows), hot (30 rows — salted into 3
    // sub-blocks), runaway (60 rows — dropped). Ids are disjoint, so a
    // pair is reachable ONLY via its own key.
    val keyed = (
      (1L to 5L).map(i => (i, "small")) ++
      (101L to 130L).map(i => (i, "hot")) ++
      (1001L to 1060L).map(i => (i, "runaway"))
    ).toDF("id", "key")
    val got = Pipeline.candidatePairsSelf(keyed, cfg)
      .as[(Long, Long)].collect().toSet
    def allPairs(r: Range) =
      (for (a <- r; b <- r if a < b) yield (a.toLong, b.toLong)).toSet
    val smallPairs = allPairs(1 to 5)
    val hotPairs = allPairs(101 to 130)
    assert((got & smallPairs) == smallPairs, "small-block pairs lost")
    assert((got & hotPairs) == hotPairs,
      s"salting lost hot-block pairs: ${(hotPairs -- got).take(5)}")
    assert(got.forall(p => p._1 < 1000L), "runaway block must be dropped")
    assert(got == smallPairs ++ hotPairs)
    // two-sided: hot BASE block (30 rows > cap 10) salted against 4
    // main rows; every main × hot-base pair must survive
    val keyedM = (1L to 4L).map(i => (i, "hot")).toDF("id_a", "key")
      .select($"key", $"id_a")
    val keyedB = (101L to 130L).map(i => (i, "hot")).toDF("id_b", "key")
      .select($"key", $"id_b")
    val got2 = Pipeline.candidatePairsTwoSided(keyedM, keyedB, cfg)
      .as[(Long, Long)].collect().toSet
    val want2 = (for (a <- 1L to 4L; b <- 101L to 130L) yield (a, b)).toSet
    assert(got2 == want2, s"two-sided salting lost ${(want2 -- got2).size} pairs")
    // two-sided grid: MAIN-hot (25 > cap) × small base, MAIN-hot ×
    // BASE-hot (both > cap), and a runaway base (60 > 50, dropped even
    // against a hot main). At web scale main is the huge side, so the
    // main-hot cases are the norm — the 2-D grid must bound every cell
    // without losing a pair.
    val keyedM2 = (
      (1L to 25L).map(i => (i, "mhot")) ++
      (31L to 55L).map(i => (i, "bothhot")) ++
      (61L to 85L).map(i => (i, "brun"))
    ).toDF("id_a", "key").select($"key", $"id_a")
    val keyedB2 = (
      (101L to 104L).map(i => (i, "mhot")) ++
      (111L to 140L).map(i => (i, "bothhot")) ++
      (201L to 260L).map(i => (i, "brun"))
    ).toDF("id_b", "key").select($"key", $"id_b")
    val got3 = Pipeline.candidatePairsTwoSided(keyedM2, keyedB2, cfg)
      .as[(Long, Long)].collect().toSet
    val want3 =
      (for (a <- 1L to 25L; b <- 101L to 104L) yield (a, b)).toSet ++
      (for (a <- 31L to 55L; b <- 111L to 140L) yield (a, b)).toSet
    assert(got3 == want3,
      s"grid salting wrong: lost=${(want3 -- got3).take(5)} extra=${(got3 -- want3).take(5)}")
  }

  test("hub pruning drops only hub-incident edges; chains survive") {
    import spark.implicits._
    // star: hub 0 — 1..5 (degree 5); chain: 10-11-12 (degrees ≤ 2)
    val edges = ((1L to 5L).map(i => (0L, i)) ++ Seq((10L, 11L), (11L, 12L)))
      .toDF("src", "dst")
    val pruned = graft.cluster.ConnectedComponents.pruneHubs(edges, maxDegree = 3)
      .as[(Long, Long)].collect().toSet
    assert(pruned == Set((10L, 11L), (11L, 12L)))
    // the hub and its spokes become singletons under assignAll
    val cc = graft.cluster.ConnectedComponents.assignAll(
      pruned.toSeq.toDF("src", "dst"), (0L to 12L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert((0L to 5L).forall(i => cc(i) == i))
    assert(cc(10L) == 10L && cc(11L) == 10L && cc(12L) == 10L)
  }

  test("resumability: second run reuses committed stages byte-for-byte") {
    val root = Files.createTempDirectory("graft_lineage").toString
    val fp = Lineage.sha("pages-test-v1")
    val first = Pipeline.runResumable(spark, pages, root, fp).collect().toSet
    // tamper-check: capture sidecar mtimes, rerun, expect no rewrite
    val edgesMeta = java.nio.file.Paths.get(s"$root/edges/_lineage.json")
    val t1 = Files.getLastModifiedTime(edgesMeta)
    val second = Pipeline.runResumable(spark, pages, root, fp).collect().toSet
    assert(first == second)
    assert(Files.getLastModifiedTime(edgesMeta) == t1, "edges stage was rebuilt on resume")
    // config change invalidates downstream stages
    val third = Pipeline.runResumable(spark, pages, root, fp,
      Pipeline.Config(maxBlockSize = 999)).collect().toSet
    assert(Files.getLastModifiedTime(edgesMeta) != t1, "config change must rebuild")
    assert(third == second)
    // the edges sidecar commits the scoring observe() counters
    val meta = new String(Files.readAllBytes(edgesMeta))
    assert(meta.contains(""""graft_candidates":{"pairs_in":"""), meta)
    assert(meta.contains(""""graft_edges":{"pairs_accepted":"""), meta)
  }
}
