package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.ConnectedComponents

/** Equivalence + round-complexity properties of the alternating
  * large-star/small-star connected components ([[ConnectedComponents
  * .runStar]]) against the min-label default ([[ConnectedComponents
  * .run]]). */
class StarCcSpec extends SparkSuite {
  import spark.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("randomized graphs: runStar ≡ run (labels identical)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 40) {
      val n = 2 + rnd.nextInt(50)
      val nEdges = 1 + rnd.nextInt(3 * n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val a = labelsOf(ConnectedComponents.run(df, maxIter = 200))
        val b = labelsOf(ConnectedComponents.runStar(df))
        assert(a == b, s"trial $trial (n=$n, e=$nEdges): star labels diverge")
      }
    }
  }

  test("special shapes: clique, star, two components, duplicates, self-loops") {
    val clique = (for { a <- 1L to 6L; b <- (a + 1) to 6L } yield (a, b)).toDF("src", "dst")
    assert(labelsOf(ConnectedComponents.runStar(clique)) ==
      (1L to 6L).map(_ -> 1L).toMap)
    val star = (2L to 9L).map(v => (v, 1L)).toDF("src", "dst")
    assert(labelsOf(ConnectedComponents.runStar(star)) ==
      (1L to 9L).map(_ -> 1L).toMap)
    val two = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    assert(labelsOf(ConnectedComponents.runStar(two)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L)).toDF("src", "dst")
    assert(labelsOf(ConnectedComponents.runStar(messy)) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(labelsOf(ConnectedComponents.runStar(
      Seq.empty[(Long, Long)].toDF("src", "dst"))).isEmpty)
  }

  test("reliable-checkpoint mode: labels identical to localCheckpoint") {
    // the cluster default (fault-tolerant checkpoint()) must be a
    // placement-only choice, like ConnectedComponents.run's
    val dir = java.nio.file.Files.createTempDirectory("starcc_ck").toString
    spark.sparkContext.setCheckpointDir(dir)
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val local = labelsOf(ConnectedComponents.runStar(edges))
    val rel = labelsOf(ConnectedComponents.runStar(edges, reliable = true))
    assert(local == rel)
  }

  test("512-node path: O(log d) rounds where min-label needs O(d)") {
    // the chain shape is exactly where min-label's round count equals
    // the eccentricity (~256 here, far beyond its default maxIter);
    // the star algorithm must solve it in logarithmically few rounds
    val path = (1L until 512L).map(i => (i, i + 1)).toDF("src", "dst")
    val (labels, rounds) = ConnectedComponents.runStarCounted(path)
    info(s"512-path solved in $rounds alternating rounds")
    assert(rounds <= 15, s"expected O(log d) rounds, took $rounds")
    val got = labelsOf(labels)
    assert(got == (1L to 512L).map(_ -> 1L).toMap)
  }
}
