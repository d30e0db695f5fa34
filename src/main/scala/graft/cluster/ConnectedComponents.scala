package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive clustering of the match-edge list: connected components
  * as an iterative Dataset self-join fixpoint (north-star requirement;
  * the reference emits only raw edges, match_pair.py:45-46, and leaves
  * clustering to the consumer).
  *
  * Algorithm: min-label propagation. Each round joins the symmetric
  * edge list against current labels and takes the per-vertex min —
  * one shuffle-hash join + one partial-aggregated groupBy per round.
  * Rounds needed = eccentricity of the component minimum, which for
  * entity-resolution graphs (dense near-cliques produced by blocking)
  * is small; maxIter bounds pathological chains. Each round
  * localCheckpoints to truncate lineage so plan size and recovery cost
  * stay O(1) in the iteration count — mandatory at 10^12-edge scale.
  * Convergence is detected by the monotone label-sum invariant
  * (labels only decrease), a cheap aggregate instead of a join.
  */
object ConnectedComponents {

  /** @param edges0 two numeric-id columns (src, dst)
    * @return (id, component) for every vertex in the edge list,
    *         component = min vertex id of the connected component
    */
  def run(edges0: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._

    val e = edges0.toDF("src", "dst").where($"src" =!= $"dst")
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select($"src".as("id")).distinct()
      .withColumn("component", $"id")
      .localCheckpoint(true)

    var prevSum = labels.agg(sum($"component".cast("decimal(38,0)")).cast("string")).as[String].head()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val msgs = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select($"dst".as("id"), $"component")
      val next = labels.union(msgs)
        .groupBy($"id")
        .agg(min($"component").as("component"))
        .localCheckpoint(true)
      val s = next.agg(sum($"component".cast("decimal(38,0)")).cast("string")).as[String].head()
      converged = s == prevSum
      prevSum = s
      labels.unpersist()
      labels = next
      iter += 1
    }
    labels
  }

  /** Cluster ids for every vertex in `vertices` (single id column);
    * vertices absent from the edge list map to themselves. */
  def assignAll(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val assigned = run(edges)
    vertices.toDF("id")
      .join(assigned, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }
}
