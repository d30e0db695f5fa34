package graft

import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.pipeline.Pipeline

/** Randomized exactness properties (seeded, deterministic): the
  * tiered/grid-salted pair generation and connected components must
  * agree with brute-force references on arbitrary skewed inputs, not
  * just the hand-built cases in PipelineSpec. */
class SaltingPropertySpec extends SparkSuite {
  import spark.implicits._

  private val cfg = Pipeline.Config(maxBlockSize = 7, runawayBlockSize = 40)

  /** Random keyed table: a few keys with sizes spanning all tiers
    * (1..cap, cap+1..runaway, > runaway), ids globally unique so a
    * pair is reachable only via shared keys — except `overlapKeys`
    * rows, which carry 2 keys each to exercise the cross-key dedup. */
  private def randomKeyed(rnd: scala.util.Random): Seq[(Long, String)] = {
    var nextId = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val nKeys = 3 + rnd.nextInt(5)
    val keys = (0 until nKeys).map(i => s"k$i")
    for (k <- keys) {
      val size = rnd.nextInt(3) match {
        case 0 => 1 + rnd.nextInt(cfg.maxBlockSize)
        case 1 => cfg.maxBlockSize + 1 + rnd.nextInt(cfg.runawayBlockSize - cfg.maxBlockSize)
        case 2 => cfg.runawayBlockSize + 1 + rnd.nextInt(15)
      }
      for (_ <- 0 until size) { rows += ((nextId, k)); nextId += 1 }
    }
    // some ids appear under a second key: pairs reachable via TWO keys
    // must still come out exactly once
    val ids = rows.map(_._1).distinct
    for (_ <- 0 until math.min(10, ids.length / 3))
      rows += ((ids(rnd.nextInt(ids.length)), keys(rnd.nextInt(keys.length))))
    rows.distinct.toSeq
  }

  test("self pairs: tiered/grid generation ≡ brute force over 12 random skews") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val rows = randomKeyed(rnd)
      val sizes = rows.groupBy(_._2).map { case (k, rs) => k -> rs.size }
      val keep = sizes.filter(_._2 <= cfg.runawayBlockSize).keySet
      // .toSeq: a for-comprehension over a Map would build a Map and
      // silently collapse pairs sharing their first element
      val want = (for {
        (k, grp) <- rows.groupBy(_._2).toSeq if keep(k)
        ids = grp.map(_._1)
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSet
      val got = Pipeline.candidatePairsSelf(rows.toDF("id", "key"), cfg,
        cacheKeyed = false).as[(Long, Long)].collect().toSet
      if (got != want) {
        val ex = (got -- want).head
        info(s"DEBUG seed=$seed extra=$ex a-rows=${rows.filter(_._1 == ex._1)} " +
          s"b-rows=${rows.filter(_._1 == ex._2)} sizes=$sizes keep=$keep")
      }
      assert(got == want, s"seed=$seed sizes=$sizes " +
        s"lost=${(want -- got).take(3).toSeq} extra=${(got -- want).take(3).toSeq}")
    }
  }

  test("two-sided pairs: 2-D grid ≡ brute force over 12 random skews") {
    for (seed <- 101 to 112) {
      val rnd = new scala.util.Random(seed)
      val mRows = randomKeyed(rnd)
      val bRows = randomKeyed(rnd).map { case (id, k) => (id + 1000000L, k) }
      val bSizes = bRows.groupBy(_._2).map { case (k, rs) => k -> rs.size }
      val keep = bSizes.filter(_._2 <= cfg.runawayBlockSize).keySet
      val bByKey = bRows.groupBy(_._2)
      val want = (for {
        (k, mGrp) <- mRows.groupBy(_._2).toSeq if keep(k) && bByKey.contains(k)
        a <- mGrp.map(_._1); b <- bByKey(k).map(_._1)
      } yield (a, b)).toSet
      val got = Pipeline.candidatePairsTwoSided(
        mRows.toDF("id_a", "key").select($"key", $"id_a"),
        bRows.toDF("id_b", "key").select($"key", $"id_b"),
        cfg, cacheKeyed = false).as[(Long, Long)].collect().toSet
      assert(got == want, s"seed=$seed " +
        s"lost=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("connected components ≡ union-find over 8 random graphs") {
    for (seed <- 201 to 208) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(60)
      val edges = (0 until (n + rnd.nextInt(2 * n))).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      // union-find reference with min-label components
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong)
        .filter { case (i, _) => edges.exists(e => e._1 == i || e._2 == i) }.toMap
      val got = ConnectedComponents.run(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed diff=${(got.toSet -- want.toSet).take(5)}")
    }
  }
}
