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
  * is small; maxIter bounds pathological chains (document or upgrade
  * to small-star/large-star for chain-heavy graphs).
  *
  * Per-round cost hygiene:
  *  - `sym` is hash-partitioned on the join key ONCE and checkpointed,
  *    so each round shuffles only the (small) label table, never the
  *    edge list again;
  *  - each round is ONE action: the eager localCheckpoint that
  *    truncates lineage also materializes an `observe` carrying the
  *    monotone label-sum, so convergence detection costs no extra job
  *    (labels only decrease — equal sums ⇒ fixpoint);
  *  - `reliable = false` (local default) uses executor-memory
  *    localCheckpoint: O(1) plan size and recovery cost per round;
  *    `reliable = true` (the cluster default — a lost executor must
  *    not kill a multi-hour job) swaps in fault-tolerant
  *    checkpoint() to the SparkContext checkpoint dir (HDFS/object
  *    storage); Pipeline.Config.reliableCheckpointDir wires both the
  *    dir and the flag.
  */
object ConnectedComponents {

  /** @param edges0 two numeric-id columns (src, dst)
    * @param reliable use fault-tolerant `checkpoint()` (requires
    *        `spark.sparkContext.setCheckpointDir` — HDFS/object
    *        storage on a cluster) instead of the executor-memory
    *        `localCheckpoint`. localCheckpoint is faster locally but a
    *        lost executor kills the job; `reliable = true` is the
    *        cluster default (Pipeline.Config.reliableCheckpointDir
    *        wires it).
    * @return (id, component) for every vertex in the edge list,
    *         component = min vertex id of the connected component
    */
  def run(edges0: DataFrame, maxIter: Int = 30,
      reliable: Boolean = false): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    def ck(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)

    val e = edges0.toDF("src", "dst").where($"src" =!= $"dst")
    // no distinct: duplicate edges cannot exist when the upstream pair
    // table is id-ordered + deduped, and min-label propagation absorbs
    // them anyway — the dedup exchange would cost more than it saves
    val sym = ck(e.union(e.select($"dst".as("src"), $"src".as("dst")))
      .repartition($"src")) // fixed partitioning reused by every round's join

    // seed labels at min(self, neighbors) — exactly what the first
    // propagation round would compute from identity labels, for the
    // same one-exchange cost the identity seed's distinct() paid; every
    // CC invocation converges one round earlier (each round is a full
    // join+agg+checkpoint job — ~1-1.5 s of fixed overhead locally).
    // Fixpoint unchanged: min-label propagation from any pointwise
    // lower bound ≥ the component minimum reaches the same labels.
    var labels = ck(sym.groupBy($"src").agg(min($"dst").as("md"))
      .select($"src".as("id"), least($"src", $"md").as("component")))

    // sum over ZERO rows is SQL-null: an empty edge list (every edge
    // pruned/dropped upstream) must converge in one round, not NPE
    def sumOf(df: DataFrame): java.math.BigDecimal = Option(df
      .agg(sum($"component".cast("decimal(38,0)")).as("s"))
      .as[java.math.BigDecimal].head()).getOrElse(java.math.BigDecimal.ZERO)

    var prevSum = sumOf(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val obsName = s"graft_cc_$iter"
      val msgs = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .select($"dst".as("id"), $"component")
      // (pointer jumping / path shortcutting was measured here and
      // REMOVED: ER merge-components are dense blobs with small
      // diameter, so the extra label-label join per round cost more
      // than the rounds it saved — at both 32k and 320k mentions)
      val observed = labels.union(msgs)
        .groupBy($"id")
        .agg(min($"component").as("component"))
        .observe(obsName, sum($"component".cast("decimal(38,0)")).as("s"))
      val next = ck(observed) // the round's single action
      val s = observed.queryExecution.observedMetrics.get(obsName)
        .flatMap(r => Option(r.getDecimal(0))).getOrElse(sumOf(next))
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      iter += 1
    }
    // labels from a non-fixpoint state under-merge silently — the one
    // failure mode a 10^12-edge run must never hide. (ER components
    // converge in a handful of rounds; hitting the bound means the
    // graph has a chain shape runStar handles in O(log d).)
    if (!converged)
      System.err.println(s"[graft-cc] WARNING: min-label CC hit maxIter=$maxIter " +
        "without converging; labels may be under-merged — raise maxIter or " +
        "use runStar (Config.starCc)")
    labels
  }

  /** Alternating large-star / small-star connected components
    * (the two-phase family of Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SOCC 2014): converges in O(log d)
    * rounds where min-label propagation needs O(d) — the upgrade path
    * [[run]]'s scaladoc documents for CHAIN-heavy graphs. ER merge
    * graphs are dense near-cliques with tiny diameter, so min-label
    * (one cheap join per round against a pre-partitioned edge table)
    * stays the default; at web scale a pathological chain component
    * (e.g. near-duplicate drift across a crawl) makes this the right
    * algorithm — a 512-node path converges in ~8 alternating rounds
    * vs 256 label-propagation rounds (spec-demonstrated).
    *
    * Per round: large-star links every larger neighbor of v to
    * min(Γ(v) ∪ {v}); small-star links v and its smaller neighbors to
    * that min. Both are groupBy+join over the edge list, checkpointed
    * per round; fixpoint detected via an (count, hash-sum) checksum —
    * the output equivalence is what the spec asserts, the checksum
    * only bounds rounds.
    *
    * @return (id, component) for every vertex in the edge list,
    *         component = min vertex id — identical to [[run]]. */
  def runStar(edges0: DataFrame, maxIter: Int = 50,
      reliable: Boolean = false): DataFrame =
    runStarCounted(edges0, maxIter, reliable)._1

  /** [[runStar]] plus the number of alternating rounds taken (for
    * specs/monitoring). */
  private[graft] def runStarCounted(edges0: DataFrame, maxIter: Int = 50,
      reliable: Boolean = false): (DataFrame, Int) = {
    val spark = edges0.sparkSession
    import spark.implicits._
    def ck(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)).as("n"),
        sum(xxhash64($"src", $"dst").cast("decimal(38,0)")).as("h")).head()
      (r.getLong(0), Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    // large-star(v): m = min(Γ(v) ∪ {v}); emit (u, m) ∀ u ∈ Γ(v), u > v
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
      val mins = sym.groupBy($"src").agg(min($"dst").as("md"))
        .select($"src", least($"src", $"md").as("m"))
      sym.join(mins, Seq("src"))
        .where($"dst" > $"src")
        .select($"dst".as("src"), $"m".as("dst"))
        .where($"src" =!= $"dst")
        .distinct()
    }
    // small-star(v): over edges directed large→small, m = min of v's
    // smaller neighbors; link v and each smaller neighbor to m
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest($"src", $"dst").as("src"),
        least($"src", $"dst").as("dst"))
      val mins = dir.groupBy($"src").agg(min($"dst").as("m"))
      val links = dir.join(mins, Seq("src"))
        .where($"dst" =!= $"m")
        .select($"dst".as("src"), $"m".as("dst"))
      links.union(mins.select($"src", $"m".as("dst")))
        .where($"src" =!= $"dst")
        .distinct()
    }
    var e = ck(edges0.toDF("src", "dst").where($"src" =!= $"dst").distinct())
    var prevCk = checksum(e)
    var iter = 0
    var converged = prevCk._1 == 0L
    while (iter < maxIter && !converged) {
      val next = ck(smallStar(largeStar(e)))
      val s = checksum(next)
      // the (count, hash-sum) checksum is probabilistic — a collision
      // would stop a round early and silently return under-merged
      // labels. When it first matches, CONFIRM with one exact check:
      // equal counts + empty one-sided anti-join ⇔ set equality (both
      // sides are distinct edge sets). The anti-join runs on two
      // already-checkpointed fixpoint-sized tables, once per run — a
      // collision keeps iterating instead of under-merging.
      converged = s == prevCk &&
        next.join(e, Seq("src", "dst"), "left_anti").isEmpty
      prevCk = s
      e.unpersist()
      e = next
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft-cc] WARNING: star CC hit maxIter=$maxIter " +
        "without converging; labels may be under-merged — raise maxIter")
    else
      System.err.println(s"[graft-cc] star CC converged in $iter alternating rounds")
    // fixpoint is a star forest: every edge is (node, componentMin).
    // groupBy-min instead of trusting the star property blindly.
    val labels = e.select($"src".as("id"), $"dst".as("component"))
      .union(e.select($"dst".as("id"), $"dst".as("component")))
      .groupBy($"id").agg(min($"component").as("component"))
    (labels, iter)
  }

  /** Incremental label maintenance — the steady-state replacement for
    * re-running CC over the full edge set on every crawl batch (at
    * 10^12 accumulated edges a full recompute is an O(corpus) step per
    * batch, exactly the cost class the bucketed blocking join removes
    * from candidate generation).
    *
    * Correctness rests on label CONTRACTION: every maintained label is
    * the min vertex id of its component, so collapsing each previous
    * component to its label vertex preserves component minima exactly —
    * CC over the contracted graph (new edges with endpoints mapped to
    * their previous labels; increment vertices map to themselves)
    * yields the same labels as CC over the full graph, bit-for-bit
    * (IncrementalCcSpec proves it against full recomputes on
    * adversarial graphs: chains joined end-to-end, increment ids
    * smaller than standing minima, merges of many old components).
    *
    * Per-batch cost: CC over O(|newEdges|) contracted edges + one
    * broadcast remap of the label table (the remap delta is
    * O(|newEdges|)-sized — at most two previous components per new
    * edge change label). The label-table scan itself is shuffle-free
    * (broadcast hash join preserves partitioning); a production
    * binding keeps labels bucketed by id and applies `remap` as a
    * merge-on-read delta instead of rewriting the table — the delta is
    * what [[updateLabelsWithDelta]] returns.
    *
    * @param prevLabels (id, component) — a CC FIXPOINT (labels = min
    *        vertex id per component); not checked, garbage-in applies
    * @param newEdges (two numeric id columns) — edges whose endpoints
    *        are prevLabels ids or new vertex ids
    * @param newVertices single-id-column table of vertices joining the
    *        graph this batch (absent from prevLabels)
    * @return (id, component) over prevLabels ∪ newVertices — identical
    *         to a full CC recompute over old ∪ new edges */
  def updateLabels(prevLabels: DataFrame, newEdges: DataFrame,
      newVertices: DataFrame, reliable: Boolean = false,
      broadcastRemap: Boolean = true): DataFrame =
    updateLabelsWithDelta(prevLabels, newEdges, newVertices, reliable,
      broadcastRemap)._1

  /** [[updateLabels]] plus the (old_component, component) remap delta —
    * the O(batch)-sized table a merge-on-read production binding
    * commits instead of rewriting the labels. `broadcastRemap = false`
    * is the same seam as Pipeline.Config.broadcastNames: when a
    * pathological batch's remap outgrows the broadcast envelope the
    * joins run as shuffle joins instead. */
  def updateLabelsWithDelta(prevLabels: DataFrame, newEdges: DataFrame,
      newVertices: DataFrame, reliable: Boolean = false,
      broadcastRemap: Boolean = true): (DataFrame, DataFrame) = {
    import prevLabels.sparkSession.implicits._
    def mb(df: DataFrame): DataFrame =
      if (broadcastRemap) broadcast(df) else df
    val e = newEdges.toDF("a", "b")
    // contract endpoints to their previous labels; an endpoint absent
    // from prevLabels is an increment vertex and stays itself. The
    // label table is first restricted to the batch's endpoints via a
    // broadcast SEMI-join (one streamed scan, no label shuffle — the
    // preserved side of an outer join cannot be the broadcast side, so
    // joining the full label table outer-style would shuffle it), then
    // the O(batch)-sized restriction is the broadcast build side of
    // both endpoint lookups.
    val endpoints = e.select($"a".as("id"))
      .unionByName(e.select($"b".as("id"))).distinct()
    val touched0 = prevLabels.join(mb(endpoints), Seq("id"), "left_semi")
    val touched =
      if (reliable) touched0.checkpoint(true) else touched0.localCheckpoint(true)
    val ea = e.join(mb(touched.select($"id".as("a"), $"component".as("ca"))),
      Seq("a"), "left")
    val contractedEdges = ea
      .join(mb(touched.select($"id".as("b"), $"component".as("cb"))),
        Seq("b"), "left")
      .select(coalesce($"ca", $"a").as("src"), coalesce($"cb", $"b").as("dst"))
    val contracted = run(contractedEdges, reliable = reliable)
    // remap rows where a contracted vertex (= old label or new id)
    // landed in a bigger component; old labels absent here are
    // untouched components
    val remap = contracted.where($"id" =!= $"component")
      .select($"id".as("component"), $"component".as("newc"))
    val updated = prevLabels
      .join(mb(remap), Seq("component"), "left")
      .select($"id", coalesce($"newc", $"component").as("component"))
    val fresh = newVertices.toDF("id")
      .join(mb(contracted.withColumnRenamed("component", "cc")), Seq("id"), "left")
      .select($"id", coalesce($"cc", $"id").as("component"))
    (updated.unionByName(fresh), remap)
  }

  /** Hub-degree pruning — the standard mitigation for transitive
    * over-merge: drop every edge incident to a vertex whose degree
    * exceeds `maxDegree` (such "hub" names connect to implausibly many
    * distinct mentions and chain unrelated entities through
    * transitivity; they fall out as singletons for human review).
    * Degree census is one agg. `broadcastHubs = true` (default) pins
    * broadcast anti-joins — right while |E|/maxDegree hubs fit the
    * broadcast envelope; at the 10^12-edge scale the hub COUNT can
    * outgrow it, so the same seam that turns off name broadcasts
    * (Pipeline.Config.broadcastNames) passes `false` here and the
    * anti-joins run as shuffle joins — consistent with the rest of the
    * broadcast-off scale story. */
  def pruneHubs(edges: DataFrame, maxDegree: Int,
      broadcastHubs: Boolean = true): DataFrame = {
    import edges.sparkSession.implicits._
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (broadcastHubs) broadcast(df) else df
    val e = edges.toDF("src", "dst")
    val hubs = e.select($"src".as("id")).union(e.select($"dst".as("id")))
      .groupBy($"id").agg(count(lit(1)).as("deg"))
      .where($"deg" > maxDegree)
      .select($"id")
    e.join(maybeBroadcast(hubs.select($"id".as("src"))), Seq("src"), "left_anti")
      .join(maybeBroadcast(hubs.select($"id".as("dst"))), Seq("dst"), "left_anti")
      .select($"src", $"dst")
  }

  /** Component-size distribution: (size, n_components). Production ER
    * monitors this — a fat tail means transitive closure is chaining
    * hub names (the classic ER over-merge hazard); mitigations are
    * hub-degree pruning or per-component size caps upstream. */
  def componentStats(labels: DataFrame): DataFrame = {
    import labels.sparkSession.implicits._
    labels.groupBy($"component").agg(count(lit(1)).as("size"))
      .groupBy($"size").agg(count(lit(1)).as("n_components"))
      .orderBy($"size".desc)
  }

  /** Cluster ids for every vertex in `vertices` (single id column);
    * vertices absent from the edge list map to themselves.
    * `star = true` swaps in [[runStar]] (label-identical; see its
    * scaladoc for when that trade is right). */
  def assignAll(edges: DataFrame, vertices: DataFrame,
      reliable: Boolean = false, star: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val assigned =
      if (star) runStar(edges, reliable = reliable)
      else run(edges, reliable = reliable)
    vertices.toDF("id")
      .join(assigned, Seq("id"), "left")
      .select($"id", coalesce($"component", $"id").as("component"))
  }
}
