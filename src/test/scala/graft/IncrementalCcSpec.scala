package graft

import org.apache.spark.sql.DataFrame

import graft.cluster.ConnectedComponents

/** Incremental label maintenance (ConnectedComponents.updateLabels):
  * seeding from the previous fixpoint and clustering only the
  * CONTRACTED new-edge graph must be bit-identical to a full CC
  * recompute over old ∪ new edges — on adversarial shapes (chains
  * fused end-to-end, increment ids below the standing minimum, one
  * batch merging many old components) and across multi-batch absorb
  * sequences. */
class IncrementalCcSpec extends SparkSuite {
  import spark.implicits._

  private def labelsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id", "component").as[(Long, Long)].collect().toSet

  private def full(edges: Seq[(Long, Long)], verts: Seq[Long]): Set[(Long, Long)] =
    labelsOf(ConnectedComponents.assignAll(
      edges.toDF("src", "dst"), verts.toDF("id")))

  private def incremental(oldEdges: Seq[(Long, Long)], oldVerts: Seq[Long],
      newEdges: Seq[(Long, Long)], newVerts: Seq[Long]): Set[(Long, Long)] = {
    val prev = ConnectedComponents.assignAll(
      oldEdges.toDF("src", "dst"), oldVerts.toDF("id"))
    labelsOf(ConnectedComponents.updateLabels(
      prev, newEdges.toDF("src", "dst"), newVerts.toDF("id")))
  }

  test("batch merging several old components ≡ full recompute") {
    // three old components {1,2,3} {10,11} {20,21,22}, plus isolated 30
    val oldE = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
    val oldV = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L, 30L)
    // one batch fuses all three through new vertices 40,41; 42 isolated
    val newE = Seq((3L, 40L), (40L, 11L), (41L, 22L), (41L, 1L))
    val newV = Seq(40L, 41L, 42L)
    assert(incremental(oldE, oldV, newE, newV) ==
      full(oldE ++ newE, oldV ++ newV))
  }

  test("increment ids BELOW the standing minimum relabel old components") {
    // old component {100,101} labeled 100; new vertex 5 joins it — the
    // merged label must drop to 5 everywhere
    val oldE = Seq((100L, 101L))
    val oldV = Seq(100L, 101L)
    val newE = Seq((5L, 101L))
    val newV = Seq(5L)
    val got = incremental(oldE, oldV, newE, newV)
    assert(got == full(oldE ++ newE, oldV ++ newV))
    assert(got == Set((100L, 5L), (101L, 5L), (5L, 5L)))
  }

  test("chains fused end-to-end across batches ≡ full recompute") {
    // standing: two disjoint 6-node chains
    val chainA = (0L until 5L).map(i => (i, i + 1))
    val chainB = (10L until 15L).map(i => (i, i + 1))
    val oldV = (0L to 5L) ++ (10L to 15L)
    // batch: a single edge fusing the chain TAILS (max distance from
    // both minima — the shape that costs min-label the most rounds)
    val newE = Seq((5L, 15L))
    assert(incremental(chainA ++ chainB, oldV, newE, Nil) ==
      full(chainA ++ chainB ++ newE, oldV))
  }

  test("empty new-edge batch: labels unchanged, new vertices singletons") {
    val oldE = Seq((1L, 2L))
    val oldV = Seq(1L, 2L, 3L)
    val got = incremental(oldE, oldV, Nil, Seq(50L, 51L))
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 3L), (50L, 50L), (51L, 51L)))
  }

  test("multi-batch absorb sequence ≡ one-shot on the union (random graphs)") {
    val rnd = new scala.util.Random(0xabc6)
    for (trial <- 1 to 2) {
      val nV = 80
      val verts = (0L until nV).toVector
      val edges = Vector.fill(90)(
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong)).filter(e => e._1 != e._2)
      // split vertices into 4 arrival batches; an edge arrives with its
      // later endpoint (so endpoints always exist on arrival)
      val batchOf = verts.map(v => v -> rnd.nextInt(4)).toMap
      var labels = ConnectedComponents.assignAll(
        edges.filter(e => batchOf(e._1) == 0 && batchOf(e._2) == 0).toDF("src", "dst"),
        verts.filter(batchOf(_) == 0).toDF("id"))
      for (b <- 1 to 3) {
        val newV = verts.filter(batchOf(_) == b)
        val newE = edges.filter(e =>
          math.max(batchOf(e._1), batchOf(e._2)) == b)
        labels = ConnectedComponents.updateLabels(
          labels, newE.toDF("src", "dst"), newV.toDF("id"))
      }
      assert(labelsOf(labels) == full(edges, verts), s"trial $trial")
    }
  }

  test("remap delta is O(batch): only touched components appear") {
    val oldE = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val oldV = Seq(1L, 2L, 10L, 11L, 20L, 21L)
    val prev = ConnectedComponents.assignAll(oldE.toDF("src", "dst"), oldV.toDF("id"))
    val (_, remap) = ConnectedComponents.updateLabelsWithDelta(
      prev, Seq((2L, 11L)).toDF("src", "dst"), Nil.map(identity[Long]).toDF("id"))
    // only component 10 relabels (to 1); components 1 and 20 untouched
    assert(remap.as[(Long, Long)].collect().toSet == Set((10L, 1L)))
  }

  test("broadcastRemap = false (scale seam) is label-identical") {
    val oldE = Seq((1L, 2L), (10L, 11L))
    val oldV = Seq(1L, 2L, 10L, 11L)
    val prev = ConnectedComponents.assignAll(oldE.toDF("src", "dst"), oldV.toDF("id"))
    val a = labelsOf(ConnectedComponents.updateLabels(
      prev, Seq((2L, 10L)).toDF("src", "dst"), Seq(40L).toDF("id")))
    val b = labelsOf(ConnectedComponents.updateLabels(
      prev, Seq((2L, 10L)).toDF("src", "dst"), Seq(40L).toDF("id"),
      broadcastRemap = false))
    assert(a == b)
    assert(a == Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L), (40L, 40L)))
  }
}
