package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cluster.ConnectedComponents
import graft.expr.{functions => gf}
import graft.pages.Extract

/** The Spark-native record-linkage dataflow (SURVEY.md §3.1 re-shaped):
  *
  *   pages →(extract)→ mentions →(normalize, distinct-memoized)→
  *   names_norm →(blocking-key explode)→ keyed →(equi hash join)→
  *   candidates →(prefilter + cascade)→ edges →(connected components)→
  *   clusters
  *
  * Scale design decisions (each .explain-verified in PipelineSpec):
  *  - normalization runs once per DISTINCT raw name and is joined back
  *    (match_pair.py:28-30's memo dict, relationally) — at web scale
  *    distinct names ≪ mentions;
  *  - candidate generation is an equi-join on exploded blocking keys,
  *    never a cross product; pair dedup keys on (idA, idB);
  *  - oversized blocks (stop-word-like keys) are SALT-SPLIT into
  *    bounded (key, salt) sub-blocks so every pair is still scored
  *    (matcher.py:381-396 scores every pair) without any task
  *    materializing a whole hot block; only runaway blocks above a
  *    hard bound are dropped, counted, and logged — never silently;
  *    AQE skew-join remains on as the second line of defense;
  *  - the cheap token_set_ratio prefilter (cutoff 50, matcher.py:33)
  *    runs before the cascade inside the same codegen stage, so >90%
  *    of candidates never reach the 230-rule scorer.
  */
object Pipeline {

  final case class Config(
      cutoff: Int = 50,
      removePeople: Boolean = true,
      // a block of n rows yields O(n²) pairs: 200 ⇒ ≤19.9k pairs per
      // un-salted block. Blocks ABOVE this are SALT-SPLIT into
      // ceil(n/cap) `(key, salt)` sub-blocks (every pair still
      // generated — the reference scores every pair, matcher.py:381-396
      // — but no single task ever materializes a whole hot block).
      maxBlockSize: Int = 200,
      // hard runaway bound: a block above this is DROPPED with logged
      // counts (4000 rows ⇒ ~8M pairs from ONE key — at web scale such
      // keys are stop-word-like artifacts whose pairs are noise, and
      // their O(n²) output would dominate the job).
      runawayBlockSize: Int = 4000,
      ccMaxIter: Int = 30,
      // postproc-ppl.py:15-24 — drop person-looking rows from the
      // FINAL output (in addition to normalize's person veto, which
      // uses a different dictionary and fires earlier).
      postFilterPeople: Boolean = true,
      // fault-tolerant checkpointing (the CLUSTER default): when set,
      // CC rounds and the endToEnd output use reliable checkpoint()
      // into this directory (HDFS/object storage in production)
      // instead of executor-memory localCheckpoint, so a lost executor
      // cannot kill a multi-hour job. None = local mode. Excluded from
      // `hash`: checkpoint placement never changes results.
      reliableCheckpointDir: Option[String] = None,
      // over-merge mitigation (a corpus-policy choice — OFF by default
      // to stay reference-faithful): when set, name-node edges
      // incident to a vertex of degree > maxHubDegree are dropped
      // before clustering (ConnectedComponents.pruneHubs — the
      // production monitor+mitigation BASELINE.md's 320k stress
      // analysis documents). Changes results ⇒ participates in `hash`.
      // NOTE: with pruning on, the name-level/mention-level
      // bit-identity contract is intentionally void — pruning is
      // defined on the name graph.
      maxHubDegree: Option[Int] = None,
      // hydration-join strategy: `true` (default) broadcasts the
      // distinct-name-sized tables (memo, node flags, name clusters) —
      // right whenever distinct names fit the 8GB/driver broadcast
      // envelope. At 10^12-document scale distinct names outgrow
      // that, so production sets `false`: the same joins run as
      // shuffle joins keyed on id/pre_proc and the cascade fan-out
      // repartition moves to the join output. Plan-only ⇒ excluded
      // from `hash`.
      broadcastNames: Boolean = true,
      // clustering algorithm: `false` (default) = min-label
      // propagation — right for ER merge graphs (dense near-cliques,
      // tiny diameter; one cheap label-table join per round). `true` =
      // alternating large-star/small-star (O(log d) rounds) for
      // corpora whose merge graphs grow long chains (near-duplicate
      // drift across a crawl). Labels identical either way (spec) ⇒
      // excluded from `hash`.
      starCc: Boolean = false) {
    def hash: String = Lineage.sha("v4", cutoff.toString, removePeople.toString,
      maxBlockSize.toString, runawayBlockSize.toString, ccMaxIter.toString,
      postFilterPeople.toString, maxHubDegree.toString)
  }

  /** pages → (mention_id, url, name). */
  def extractMentions(pages: DataFrame): DataFrame = Extract.mentions(pages)

  /** Normalize once per distinct raw name, join back (A2).
    * Input: (id, name); output adds pre_proc, nosuffix; rows whose
    * normalization fails (person veto / empty) are dropped, mirroring
    * the reference's dropna (matcher.py:440-445). */
  def normalize(names: DataFrame, cfg: Config = Config()): DataFrame =
    names.join(normalizeMemo(names, cfg), Seq("name"))

  /** The distinct-name normalization memo (name, pre_proc, nosuffix) —
    * exposed so Verify can commit it as an oracle input table. */
  def normalizeMemo(names: DataFrame, cfg: Config = Config()): DataFrame =
    names.select(col("name")).distinct()
      // explicit fan-out: distinct's output is byte-tiny, so AQE
      // coalesces it to ~1 partition — which would serialize the
      // cascade below; a user repartition is exempt from coalescing
      .repartition(names.sparkSession.sparkContext.defaultParallelism)
      // opt_barrier: without it Catalyst substitutes the cascade into
      // the two pushed-down filters AND infers them onto both join
      // sides of the memo join-back — ~5 cascade runs per raw row
      // instead of 1 per distinct name (see StableBarrier scaladoc)
      .withColumn("pre_proc", gf.opt_barrier(gf.normalize_name(col("name"), cfg.removePeople)))
      .na.drop(Seq("pre_proc"))
      .where(col("pre_proc") =!= "")
      .withColumn("nosuffix", gf.remove_suffix(col("pre_proc")))

  /** Explode blocking keys; id column must be named `id`. */
  def withBlockingKeys(norm: DataFrame): DataFrame =
    norm.withColumn("key", explode(gf.blocking_keys(col("pre_proc"))))

  /** Hot-key census: key → row count (for cap + skew logging). When
    * the keyed table carries a `w` column (name-level scoring: w =
    * mentions per name node), the census SUMS it — block sizes are
    * then mention-weighted, so cap/runaway decisions are IDENTICAL to
    * mention-level scoring in every regime (without this, a key with
    * >runaway mentions but ≤runaway distinct names would be dropped by
    * the mention-level path and kept by the name-level path, breaking
    * the bit-identity contract exactly at the boundary). */
  def blockSizes(keyed: DataFrame): DataFrame =
    if (keyed.columns.contains("w"))
      keyed.groupBy("key").agg(sum(col("w")).as("block_size"))
    else keyed.groupBy("key").agg(count(lit(1)).as("block_size"))

  /** ids appearing in ≥1 block NOT dropped by the runaway bound — the
    * exact vertex set whose (self-)pairs the blocking join can
    * generate. [[mentionComponents]] gates self-accept contraction on
    * it: a self-accepting name with ≥2 mentions whose EVERY blocking
    * key is runaway-dropped gets no mention pairs under mention-level
    * scoring, so name-level contraction must leave its mentions
    * singletons too (the round-3 ADVICE edge case). Runaway keys are
    * few by construction → broadcast anti-join. */
  def keptBlockIds(keyed: DataFrame, cfg: Config): DataFrame =
    keyed
      .join(broadcast(blockSizes(keyed)
        .where(col("block_size") > cfg.runawayBlockSize).select("key")),
        Seq("key"), "left_anti")
      .select("id").distinct()

  private def maybeBroadcast(df: DataFrame, cfg: Config): DataFrame =
    if (cfg.broadcastNames) broadcast(df) else df

  /** Hot-key census with the per-key salt count: keys in
    * (maxBlockSize, runawayBlockSize] are salted into
    * nsalt = ceil(block_size / maxBlockSize) sub-blocks; keys above
    * the runaway bound are dropped (logged via the observe deltas). */
  private def saltPlan(sizes: DataFrame, cfg: Config): DataFrame =
    sizes
      .where(col("block_size") > cfg.maxBlockSize &&
        col("block_size") <= cfg.runawayBlockSize)
      .withColumn("nsalt",
        ceil(col("block_size").cast("double") / cfg.maxBlockSize).cast("long"))
      .select("key", "nsalt")

  /** Distinct (id_a, id_b) self-pairs from a keyed table (id, key) —
    * the in-plan blocking join, exposed for spec-level recall proofs.
    *
    * Three key tiers (census is in-plan, no driver action):
    *  - block_size ≤ maxBlockSize: plain SHUFFLE_HASH self-join on key;
    *  - maxBlockSize < block_size ≤ runawayBlockSize: 2-D GRID SALT —
    *    each side is salted by its own hash and replicated across the
    *    other axis; the join runs on (key, salt_m, salt_b): every pair
    *    of the hot block is still produced exactly once (the reference
    *    scores every pair, matcher.py:381-396), with per-task work
    *    bounded by maxBlockSize² regardless of block size — the
    *    "top-key splitting" of the north rule;
    *  - block_size > runawayBlockSize: dropped, counted, logged.
    *
    * With `earlyFilter` the keyed table must also carry `nosuffix` and
    * the cheap token_set_ratio prefilter runs INSIDE each tier's join,
    * before the pair-dedup `distinct()` — see [[edgeCandidatesSelf]]
    * for why that ordering is the 100 TB shape.
    */
  def candidatePairsSelf(keyed0: DataFrame, cfg: Config = Config(),
      cacheKeyed: Boolean = true, earlyFilter: Boolean = false): DataFrame = {
    // the keyed table is consumed ~6× below (census for the anti-join,
    // census for the salt plan, both small-join sides, the hot join's
    // two sides) and each uncached scan re-evaluates the blocking_keys
    // explode (double-metaphone + minhash per row — the expensive
    // part). (id, key) rows are ~30 bytes: persist them once. Callers
    // that rebuild per micro-batch pass cacheKeyed = false and manage
    // caching themselves (a per-batch CacheManager entry never
    // released would grow without bound).
    val keyed = if (cacheKeyed) keyed0.persist() else keyed0
    val sizes = blockSizes(keyed)
    val oversize = sizes.where(col("block_size") > cfg.maxBlockSize)
    val small = keyed.join(broadcast(oversize.select("key")), Seq("key"), "left_anti")
      .observe("graft_capped_rows", count(lit(1)).as("rows_kept"))
    def sideA(df: DataFrame, extra: Column*): DataFrame =
      if (earlyFilter)
        df.select(Seq(col("key"), col("id").as("id_a"),
          col("nosuffix").as("nos_a")) ++ extra: _*)
      else df.select(Seq(col("key"), col("id").as("id_a")) ++ extra: _*)
    def sideB(df: DataFrame, extra: Column*): DataFrame =
      if (earlyFilter)
        df.select(Seq(col("key"), col("id").as("id_b"),
          col("nosuffix").as("nos_b")) ++ extra: _*)
      else df.select(Seq(col("key"), col("id").as("id_b")) ++ extra: _*)
    val keep =
      if (earlyFilter)
        col("id_a") < col("id_b") &&
          gf.prefilter_pass(col("nos_a"), col("nos_b"), cfg.cutoff)
      else col("id_a") < col("id_b")
    // SHUFFLE_HASH: the designed bucketed hash join on blocking keys.
    // A broadcast join here would inherit the (possibly AQE-coalesced,
    // single-partition) left side's parallelism and serialize
    // everything downstream. Pair dedup runs on the 16-byte id pair
    // BEFORE the name strings are joined back — at web scale the
    // duplicate-key traffic is the dominant shuffle.
    val smallPairs = sideA(small).join(sideB(small).hint("SHUFFLE_HASH"), Seq("key"))
      .where(keep)
      .select("id_a", "id_b")
    // salted tier — 2-D grid: the A side carries salt_m = hash(id) mod
    // n and is replicated across every salt_b; the B side carries
    // salt_b and is replicated across every salt_m. An unordered pair
    // {x,y} appears as (x,y) at cell (salt_m(x), salt_b(y)) and as
    // (y,x) at (salt_m(y), salt_b(x)); the id_a < id_b filter keeps
    // exactly one. Per-task work is bounded by maxBlockSize² — the 1-D
    // scheme's cap × block_size cells (up to 800k pairs at the runaway
    // bound) were measured as multi-second stragglers on dense
    // family blocks.
    val hotKeyed = keyed.join(broadcast(saltPlan(sizes, cfg)), Seq("key"))
    val hotA = sideA(hotKeyed,
      pmod(xxhash64(col("id")), col("nsalt")).as("salt_m"),
      explode(sequence(lit(0L), col("nsalt") - 1)).as("salt_b"))
    val hotB = sideB(hotKeyed,
      explode(sequence(lit(0L), col("nsalt") - 1)).as("salt_m"),
      pmod(xxhash64(col("id")), col("nsalt")).as("salt_b"))
    val hotPairs = hotA.join(hotB.hint("SHUFFLE_HASH"),
        Seq("key", "salt_m", "salt_b"))
      .where(keep)
      .select("id_a", "id_b")
      .observe("graft_salted_pairs", count(lit(1)).as("pairs_salted"))
    smallPairs.unionByName(hotPairs).distinct()
  }

  /** Self-join candidate pairs over blocking keys (salted hot keys,
    * runaway drop — see [[candidatePairsSelf]]). Returns
    * (id_a, id_b, pre_a, pre_b, nos_a, nos_b).
    *
    * Everything here is IN-PLAN — no driver-side count()/collect()
    * during query construction (a plan-time action would run the whole
    * upstream extract→normalize job once per build, a cost class that
    * grows with input). Dropped-row counts surface through the
    * `graft_keyed_rows` / `graft_capped_rows` / `graft_salted_pairs`
    * observations after the real action runs.
    *
    * `norm` is persisted here because the plan consumes it several
    * times (census, join sides, the two attachNames probes) — without
    * the persist the normalize subtree re-executes per consumer. */
  def candidatesSelf(norm: DataFrame, cfg: Config = Config()): DataFrame = {
    // census-facing one-shot entry (er_candidates, recall proofs): the
    // keyed persist below has no unpersist hook here — repeated
    // same-session callers should use edgeCandidatesSelfKeyed and
    // release the handle themselves
    norm.persist()
    val keyed = withBlockingKeys(norm)
      .observe("graft_keyed_rows", count(lit(1)).as("rows_in"))
    attachNames(candidatePairsSelf(keyed, cfg), norm, cfg)
  }

  /** Prefilter-FUSED candidate generation — the edge-path variant of
    * [[candidatesSelf]] used by everything that immediately scores
    * (endToEnd, runResumable, er_edges, streaming).
    *
    * Produces exactly `candidatesSelf(norm) where prefilter_pass` (the
    * gate commutes with the pair `distinct()` because it is a pure
    * function of the pair), but the gate runs INSIDE the blocking join,
    * so the ~99% of raw blocking pairs it rejects never reach the pair
    * dedup exchange or the name hydration. Measured at sf0.1/local[32]:
    * the unfused plan shuffles 33.9M distinct pairs and hydrates all of
    * them to feed a prefilter that keeps 360k (1.1%) — 52s of the 63s
    * er_edges wall-clock was dedup + hydration of doomed pairs. At
    * 100 TB that dedup shuffle is the dominant job cost; the fused gate
    * makes candidate volume track ACCEPTED density, not blocking-
    * collision density. */
  def edgeCandidatesSelf(norm: DataFrame, cfg: Config = Config()): DataFrame =
    edgeCandidatesSelfKeyed(norm, cfg)._1

  /** [[edgeCandidatesSelf]] plus the persisted keyed table's handle,
    * so one-shot callers (endToEnd) can unpersist it once the job's
    * terminal action has run — a repeated caller otherwise accumulates
    * one never-released CacheManager entry per invocation. */
  def edgeCandidatesSelfKeyed(norm: DataFrame,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    norm.persist()
    val cols = Seq(col("id"), col("key"), col("nosuffix")) ++
      (if (norm.columns.contains("w")) Seq(col("w")) else Nil)
    val keyed = withBlockingKeys(norm)
      .select(cols: _*)
      .observe("graft_keyed_rows", count(lit(1)).as("rows_in"))
      .persist()
    (attachNames(candidatePairsSelf(keyed, cfg, cacheKeyed = false,
      earlyFilter = true), norm, cfg), keyed)
  }

  /** Join the normalized-name columns back onto an (id_a, id_b) pair
    * table (the relational face of match_pair.py's memo dict).
    *
    * Shuffle hygiene, load-bearing at 100 TB:
    *  1. the EXPLICIT repartition spreads the id pairs over
    *     cores × 2 partitions while they are still 16-byte rows —
    *     a user repartition is exempt from AQE byte-size coalescing,
    *     which would otherwise pack the CPU-heavy cascade stage onto
    *     a handful of cores (candidate rows are tiny but each costs a
    *     230-rule scoring pass);
    *  2. the name columns are attached AFTER that shuffle via
    *     BROADCAST joins (distinct names ≪ pairs), which preserve the
    *     pair partitioning — the wide string payload never enters an
    *     exchange. On a cluster where the name memo outgrows broadcast
    *     (`cfg.broadcastNames = false`), the same joins run as
    *     SHUFFLE_HASH keyed on id and the cascade fan-out repartition
    *     moves to the join OUTPUT (the pre-join repartition would be
    *     destroyed by the join exchange anyway). */
  def attachNames(pairs: DataFrame, norm: DataFrame,
      cfg: Config = Config()): DataFrame =
    attachNames2(pairs, norm, norm, cfg)

  /** Two-table variant (main × base) of [[attachNames]]. */
  def attachNames2(pairs: DataFrame, normA: DataFrame, normB: DataFrame,
      cfg: Config = Config()): DataFrame = {
    val n1 = normA.select(col("id").as("id_a"),
      col("pre_proc").as("pre_a"), col("nosuffix").as("nos_a"))
    val n2 = normB.select(col("id").as("id_b"),
      col("pre_proc").as("pre_b"), col("nosuffix").as("nos_b"))
    val par = pairs.sparkSession.sparkContext.defaultParallelism * 2
    val joined =
      if (cfg.broadcastNames)
        pairs.repartition(par)
          .join(broadcast(n1), Seq("id_a")).join(broadcast(n2), Seq("id_b"))
      else
        pairs
          .join(n1.hint("SHUFFLE_HASH"), Seq("id_a"))
          .join(n2.hint("SHUFFLE_HASH"), Seq("id_b"))
          .repartition(par)
    joined.select("id_a", "id_b", "pre_a", "pre_b", "nos_a", "nos_b")
  }

  /** Two-sided candidate generation (main × base, matcher.py flow).
    * The two inputs must not share id values (caller offsets one side
    * if needed).
    *
    * `cacheInputs = false` hands cache lifecycle to the caller — a
    * repeated caller (e.g. foreachBatch scoring every micro-batch)
    * must persist/unpersist per invocation itself, or the shared
    * CacheManager accumulates one never-released entry per call. */
  def candidatesTwoSided(main: DataFrame, base: DataFrame,
      cfg: Config = Config(), cacheInputs: Boolean = true): DataFrame = {
    if (cacheInputs) { main.persist(); base.persist() } // each side: key explode + attachNames probe
    val keyedM = withBlockingKeys(main).select(col("key"), col("id").as("id_a"))
    val keyedB = withBlockingKeys(base).select(col("key"), col("id").as("id_b"))
    attachNames2(candidatePairsTwoSided(keyedM, keyedB, cfg,
      cacheKeyed = cacheInputs), main, base, cfg)
  }

  /** Prefilter-fused two-sided candidates — see [[edgeCandidatesSelf]]
    * for the ordering argument; identical output to
    * `candidatesTwoSided where prefilter_pass`. */
  def edgeCandidatesTwoSided(main: DataFrame, base: DataFrame,
      cfg: Config = Config(), cacheInputs: Boolean = true): DataFrame = {
    if (cacheInputs) { main.persist(); base.persist() }
    edgeCandidatesTwoSidedKeyed(main, base, baseKeyed(base), cfg,
      cacheKeyed = cacheInputs)
  }

  /** The base side's exploded keyed table (key, id_b, nos_b) — exposed
    * so a repeated caller against a FIXED universe (streaming
    * micro-batches) can compute + persist it ONCE for the query's
    * lifetime instead of re-running the key explode (double-metaphone
    * + minhash per row, "the expensive part") several times per
    * batch. */
  def baseKeyed(base: DataFrame): DataFrame =
    withBlockingKeys(base)
      .select(col("key"), col("id").as("id_b"), col("nosuffix").as("nos_b"))

  /** [[edgeCandidatesTwoSided]] over a caller-supplied (possibly
    * pre-persisted) base keyed table from [[baseKeyed]]. */
  def edgeCandidatesTwoSidedKeyed(main: DataFrame, base: DataFrame,
      keyedB: DataFrame, cfg: Config = Config(),
      cacheKeyed: Boolean = false): DataFrame = {
    val keyedM = withBlockingKeys(main)
      .select(col("key"), col("id").as("id_a"), col("nosuffix").as("nos_a"))
    attachNames2(candidatePairsTwoSided(keyedM, keyedB, cfg,
      cacheKeyed = cacheKeyed, earlyFilter = true), main, base, cfg)
  }

  /** Steady-state incremental ER (the reference's production flow:
    * match_pair.py:47-58 streams chunks against matcher.py:428-430's
    * FIXED base universe): accepted edges of one crawl increment
    * against a STANDING corpus persisted as a bucketed blocking-key
    * table ([[graft.block.BucketedKeyTable]]).
    *
    * Why this is the 100 TB shape: candidate generation re-runs on
    * every crawl increment, and in the ordinary two-sided path the
    * dominant shuffle is the hash exchange of the CORPUS keyed table.
    * Here the corpus was bucketed by `key` once at write time, so
    *  - the runaway-key census is exchange-free (the bucketed scan
    *    already delivers hash-partitioned keys),
    *  - the blocking join shuffles ONLY the increment (one exchange,
    *    to match the table's bucket distribution),
    *  - the prefilter is FUSED before the pair-dedup exchange, so the
    *    dedup traffic tracks accepted density (see
    *    [[edgeCandidatesSelf]]).
    * Steady-state cost: O(increment), not O(corpus) —
    * IncrementalErSpec pins the plan shape and the bit-identity of the
    * edges against [[edgeCandidatesTwoSided]].
    *
    * Kept deliberately un-salted: increments are bounded by crawl
    * cadence, and a pathologically hot increment can fall back to
    * [[candidatePairsTwoSided]]'s 2-D grid for that batch. Runaway
    * STANDING keys (census > runawayBlockSize) are dropped via a
    * broadcast anti-join, mirroring the two-sided path's base-side
    * runaway drop bit-for-bit. */
  def incrementalEdges(spark: SparkSession, standingTable: String,
      main: DataFrame, baseNorm: DataFrame, cfg: Config = Config()): DataFrame =
    // the keyed handle stays persisted: the CacheManager entry is
    // keyed by the logical plan, so repeated IDENTICAL calls (Bench's
    // median-of-3 over the same cached `main`) share one entry.
    // Per-micro-batch callers (distinct `main` per batch) must use
    // [[incrementalEdgesKeyed]] and release the handle themselves.
    incrementalEdgesKeyed(spark, standingTable, main, baseNorm, cfg)._1

  /** [[incrementalEdges]] plus the persisted increment-keyed handle —
    * the blocking-key explode (double-metaphone + minhash per row, the
    * expensive part) is consumed by BOTH the hot-key census action and
    * the blocking join; the persist makes it run once per batch
    * instead of twice (measured in SteadyStateProbe's per-batch
    * walls). Repeated callers unpersist the handle after the batch's
    * terminal action. */
  def incrementalEdgesKeyed(spark: SparkSession, standingTable: String,
      main: DataFrame, baseNorm: DataFrame,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    assertStandingBucketed(spark, standingTable)
    val keyedInc = incrementKeyed(main).persist()
    (scoreCandidates(incrementalCandidatesKeyed(spark, standingTable,
      keyedInc, main, baseNorm, cfg), cfg), keyedInc)
  }

  /** Runtime plan guard (always on — planning is driver-side and
    * cheap): the whole point of the standing bucketed table is that
    * the corpus never re-shuffles, so plan drift must fail the run —
    * in Verify/Bench that fails the round artifact, not just a spec.
    * The probe is a census-only plan over JUST the standing table: if
    * its groupBy(key) is satisfied by the bucket layout (zero hash
    * exchanges), EnsureRequirements satisfies the blocking join's
    * standing side from the same distribution; if the table lost its
    * bucket metadata (bad re-register, bucketed scans disabled), the
    * probe plans an exchange and we fail fast. The full candidate
    * plan is NOT a usable probe: the increment side's cached lineage
    * (normalize memo) legitimately prints its own O(increment)
    * exchanges inside the InMemoryRelation text. */
  def assertStandingBucketed(spark: SparkSession, standingTable: String): Unit = {
    val censusProbe = spark.table(standingTable)
      .groupBy("key").agg(count(lit(1)))
    val nHash = "Exchange hashpartitioning".r
      .findAllIn(censusProbe.queryExecution.executedPlan.toString).size
    require(nHash == 0,
      s"incremental plan drift: standing table '$standingTable' no longer " +
        s"satisfies groupBy/join from its buckets ($nHash hash exchanges " +
        "in the census probe plan)")
  }

  /** The increment's exploded keyed table (key, id_a, nos_a) — the
    * per-batch shuffle payload of the incremental join. */
  def incrementKeyed(main: DataFrame): DataFrame =
    withBlockingKeys(main)
      .select(col("key"), col("id").as("id_a"), col("nosuffix").as("nos_a"))

  /** The candidate half of [[incrementalEdges]] — hydrated
    * (id_a, id_b, pre_a, pre_b, nos_a, nos_b) prefilter-passing pairs
    * of increment × standing-table rows. Output is bit-identical to
    * [[edgeCandidatesTwoSided]](main, base) when the standing table
    * holds `withBlockingKeys(baseNorm)`; only the physical plan
    * differs (standing side exchange-free). `main` is consumed twice
    * (key explode + hydration probe) — callers persist it. */
  def incrementalCandidates(spark: SparkSession, standingTable: String,
      main: DataFrame, baseNorm: DataFrame, cfg: Config = Config()): DataFrame =
    incrementalCandidatesKeyed(spark, standingTable, incrementKeyed(main),
      main, baseNorm, cfg)

  /** [[incrementalCandidates]] over a caller-supplied (typically
    * persisted) increment-keyed table from [[incrementKeyed]]. */
  def incrementalCandidatesKeyed(spark: SparkSession, standingTable: String,
      keyedInc: DataFrame, main: DataFrame, baseNorm: DataFrame,
      cfg: Config = Config()): DataFrame =
    attachNames2(
      incrementalPairs(spark, standingTable, keyedInc, cfg)
        .observe("graft_incremental_pairs",
          count(lit(1)).as("pairs_deduped")),
      main, baseNorm, cfg)

  /** The raw deduped (id_a = increment id, id_b = standing id)
    * prefilter-passing pair set of the incremental blocking join —
    * exposed un-hydrated so the absorb path ([[Absorb]]) can
    * canonicalize pair order before hydration.
    *
    * `runawayKeys`: standing-census runaways by default (bit-identical
    * to [[candidatePairsTwoSided]]'s base-side drop); the absorb path
    * overrides with the COMBINED standing+increment census so the
    * union edge set matches the one-shot self path exactly. */
  def incrementalPairs(spark: SparkSession, standingTable: String,
      keyedInc: DataFrame, cfg: Config = Config(),
      runawayKeys: Option[DataFrame] = None): DataFrame = {
    val standing = spark.table(standingTable)
    // runaway census over the bucketed scan: groupBy(key) is satisfied
    // by the table's bucket distribution — no exchange
    val runaway = runawayKeys.getOrElse(
      standing.groupBy("key")
        .agg(count(lit(1)).as("block_size"))
        .where(col("block_size") > cfg.runawayBlockSize)
        .select("key"))
    val b = standing.join(broadcast(runaway), Seq("key"), "left_anti")
      .select(col("key"), col("id").as("id_b"), col("nosuffix").as("nos_b"))
    val a = keyedInc.join(broadcast(runaway), Seq("key"), "left_anti")
    // hot-increment fallback (closes the "pathologically hot increment
    // falls back manually" note): a key whose INCREMENT block exceeds
    // maxBlockSize would land its whole |inc_k| × |standing_k| product
    // in one bucket task (the standing factor is runaway-bounded, the
    // increment factor is not). Census the increment driver-side —
    // O(increment) and tiny — and only when hot keys exist, split the
    // plan: cold keys keep the exchange-free bucket join; hot keys
    // route through candidatePairsTwoSided's 2-D grid, shuffling only
    // those keys' standing rows (≤ hot × runawayBlockSize). With no
    // hot keys (the steady-state norm) the plan is EXACTLY the
    // single-join one — no second corpus scan, no empty grid branch.
    val hotKeys = a.groupBy("key").agg(count(lit(1)).as("bs_m"))
      .where(col("bs_m") > cfg.maxBlockSize)
      .select("key").as[String](org.apache.spark.sql.Encoders.STRING)
      .take(10001)
    if (hotKeys.isEmpty) {
      b.join(a, Seq("key"))
        .where(gf.prefilter_pass(col("nos_a"), col("nos_b"), cfg.cutoff))
        .select("id_a", "id_b")
        .distinct()
    } else if (hotKeys.length > 10000) {
      // a batch with >10k hot keys is not an increment in any
      // meaningful sense — escape to the full two-sided path (corpus
      // subset shuffles; correct, never a single-task product)
      System.err.println("[graft-inc] WARNING: batch has >10000 hot " +
        "keys; routing the whole batch through candidatePairsTwoSided")
      candidatePairsTwoSided(a, b, cfg, cacheKeyed = false,
        earlyFilter = true)
    } else {
      System.err.println(s"[graft-inc] ${hotKeys.length} hot increment " +
        s"keys (> ${cfg.maxBlockSize} rows); 2-D-grid scoring them " +
        "against their standing rows")
      val hot = broadcast(
        spark.createDataset(hotKeys.toSeq)(
          org.apache.spark.sql.Encoders.STRING).toDF("key"))
      val cold = b.join(a.join(hot, Seq("key"), "left_anti"), Seq("key"))
        .where(gf.prefilter_pass(col("nos_a"), col("nos_b"), cfg.cutoff))
        .select("id_a", "id_b")
      val gridded = candidatePairsTwoSided(
        a.join(hot, Seq("key"), "left_semi"),
        b.join(hot, Seq("key"), "left_semi"),
        cfg, cacheKeyed = false, earlyFilter = true,
        // the union's terminal distinct below dedups BOTH branches —
        // a second distinct inside the grid path would stack a full
        // extra exchange+agg over ~90% of the pair volume
        dedup = false)
      cold.unionByName(gridded).distinct()
    }
  }

  /** Distinct (id_a, id_b) main × base pairs from two keyed tables —
    * census on BOTH sides (at web scale the MAIN side is the huge
    * mention table, so main-hot keys are the norm, not the exception;
    * a base-only census would land a hot main key's whole
    * |main_k|×|base_k| product in one task).
    *
    * Tiers per key:
    *  - both sides ≤ maxBlockSize: plain SHUFFLE_HASH join;
    *  - either side hot (and base ≤ runawayBlockSize): 2-D GRID SALT —
    *    main rows carry salt_m = hash(id_a) mod nm and are replicated
    *    to every salt_b; base rows carry salt_b = hash(id_b) mod nb
    *    and are replicated to every salt_m; the join runs on
    *    (key, salt_m, salt_b), so each pair meets exactly once at
    *    (salt_m(a), salt_b(b)) and per-task work is bounded by
    *    maxBlockSize² regardless of EITHER side's block size.
    *    Replication cost is main×nb + base×nm rows — linear in each
    *    side, never quadratic;
    *  - base > runawayBlockSize: dropped, counted, logged (a universe
    *    block that big is a stop-word-like artifact; the main side has
    *    no runaway bound — big main keys are real data). */
  def candidatePairsTwoSided(keyedM0: DataFrame, keyedB0: DataFrame,
      cfg: Config = Config(), cacheKeyed: Boolean = true,
      earlyFilter: Boolean = false, dedup: Boolean = true): DataFrame = {
    // see candidatePairsSelf: the keyed sides are multiply consumed
    // (census + small join + hot join on each side) and every uncached
    // scan re-runs the blocking_keys explode
    val keyedM = if (cacheKeyed) keyedM0.persist() else keyedM0
    val keyedB = if (cacheKeyed) keyedB0.persist() else keyedB0
    val cap = cfg.maxBlockSize
    val sizesB = keyedB.groupBy("key").agg(count(lit(1)).as("bs_b"))
    val sizesM = keyedM.groupBy("key").agg(count(lit(1)).as("bs_m"))
    // (key, nm, nb) for keys needing the grid; keys with a runaway
    // base block are excluded here AND from the small tier → dropped
    val grid = sizesB.join(sizesM, Seq("key"))
      .where(col("bs_b") <= cfg.runawayBlockSize &&
        (col("bs_b") > cap || col("bs_m") > cap))
      .select(col("key"),
        ceil(col("bs_m").cast("double") / cap).cast("long").as("nm"),
        ceil(col("bs_b").cast("double") / cap).cast("long").as("nb"))
    val oversize = sizesB.where(col("bs_b") > cap).select("key")
      .unionByName(sizesM.where(col("bs_m") > cap).select("key")).distinct()
    def gated(pairs: DataFrame): DataFrame =
      if (earlyFilter)
        pairs.where(gf.prefilter_pass(col("nos_a"), col("nos_b"), cfg.cutoff))
      else pairs
    val smallPairs = gated(keyedM
      .join(broadcast(oversize), Seq("key"), "left_anti")
      .join(keyedB.join(broadcast(oversize), Seq("key"), "left_anti")
        .hint("SHUFFLE_HASH"), Seq("key")))
      .select("id_a", "id_b")
    val hotM = keyedM.join(broadcast(grid), Seq("key"))
      .select(keyedM.columns.filter(_ != "key").map(col) ++ Seq(col("key"),
        pmod(xxhash64(col("id_a")), col("nm")).as("salt_m"),
        explode(sequence(lit(0L), col("nb") - 1)).as("salt_b")): _*)
    val hotB = keyedB.join(broadcast(grid), Seq("key"))
      .select(keyedB.columns.filter(_ != "key").map(col) ++ Seq(col("key"),
        explode(sequence(lit(0L), col("nm") - 1)).as("salt_m"),
        pmod(xxhash64(col("id_b")), col("nb")).as("salt_b")): _*)
    val hotPairs = gated(hotM.join(hotB.hint("SHUFFLE_HASH"),
        Seq("key", "salt_m", "salt_b")))
      .select("id_a", "id_b")
      .observe("graft_salted_pairs_2s", count(lit(1)).as("pairs_salted"))
    // `dedup = false` hands the pair dedup to the CALLER's terminal
    // distinct (the incremental hot-key route unions this output with
    // its cold branch and must dedup across the union anyway — two
    // stacked distincts cost a full extra exchange+agg over the pair
    // set, 9.2 s of the r7-baseline er_incremental wall; guide §2.4)
    val u = smallPairs.unionByName(hotPairs)
    if (dedup) u.distinct() else u
  }

  /** Prefilter + cascade over candidate pairs → accepted edges with
    * the reference's output score (token_sort_ratio of nosuffix,
    * matcher.py:393).
    *
    * Order is load-bearing at scale:
    *  1. pairs are already DISTINCT (dedup before scoring — each of
    *     the ~16 blocking keys a pair can share must not re-run the
    *     230-rule cascade) and the cascade can only run where the
    *     hydrated name columns exist, i.e. above [[attachNames2]]'s
    *     post-dedup repartition — placement is structural, no barrier
    *     hacks needed;
    *  2. the opt_barrier around match_score makes the `code > 0`
    *     filter reference the materialized column instead of
    *     substituting the expression — the cascade runs ONCE per pair,
    *     not once in the filter plus once in the projection
    *     (PlanSpec asserts a single cascade site);
    *  3. the observe probes are the per-partition counter metrics of
    *     the lineage story (pairs in / accepted out). */
  def scoreCandidates(cand: DataFrame, cfg: Config = Config()): DataFrame =
    cand
      .observe("graft_candidates", count(lit(1)).as("pairs_in"))
      .where(gf.prefilter_pass(col("nos_a"), col("nos_b"), cfg.cutoff))
      .withColumn("code", gf.opt_barrier(gf.match_score(col("pre_a"), col("pre_b"))))
      .where(col("code") > 0)
      .observe("graft_edges", count(lit(1)).as("pairs_accepted"))
      .withColumn("score", gf.token_sort_ratio(col("nos_a"), col("nos_b")))

  /** Cascade code + output score for EVERY prefilter-passing candidate
    * (no accept filter) — the committed oracle-input face of
    * [[scoreCandidates]]: Verify dumps this table so DuckDB can verify
    * the `code > 0` accept filter and every downstream join-back as a
    * relational skeleton over it (the same method `_input_edges`
    * used for the clusters oracle, now anchoring er_edges /
    * er_pair_mode / er_match too). Values are identical to
    * [[scoreCandidates]] by construction (same expressions, same
    * deterministic cascade). */
  def scoredCodes(cand: DataFrame, cfg: Config = Config()): DataFrame =
    cand
      .where(gf.prefilter_pass(col("nos_a"), col("nos_b"), cfg.cutoff))
      .withColumn("code", gf.opt_barrier(gf.match_score(col("pre_a"), col("pre_b"))))
      .withColumn("score", gf.token_sort_ratio(col("nos_a"), col("nos_b")))
      .select("id_a", "id_b", "code", "score")

  /** Edges → (id, component). */
  def cluster(edges: DataFrame, vertices: DataFrame, cfg: Config = Config()): DataFrame = {
    cfg.reliableCheckpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    ConnectedComponents.assignAll(
      edges.select(col("id_a"), col("id_b")), vertices,
      reliable = cfg.reliableCheckpointDir.isDefined,
      star = cfg.starCc)
  }

  /** Full pages → clusters dataflow. The normalized-names and edge
    * tables are consumed by several downstream actions (key census,
    * candidate join, CC iterations), so they are persisted — the
    * in-memory analog of the per-stage committed outputs in
    * [[runResumable]]. */
  /** One node per DISTINCT normalized name, id = min mention id
    * carrying that name. Deterministic (no monotonically_increasing_id
    * — ids must be stable across retries for the resume story), and
    * the id choice makes name-level clustering label-identical to
    * mention-level clustering (see [[clusterMentions]]). */
  def nameNodes(norm: DataFrame): DataFrame =
    norm.groupBy("pre_proc")
      .agg(min(col("id")).as("id"),
        // nosuffix is a pure function of pre_proc — any row's value
        first(col("nosuffix")).as("nosuffix"),
        // mention count: weights the blocking census (see blockSizes)
        count(lit(1)).as("w"))

  /** Name-node components → per-mention components, bit-identically
    * to mention-level scoring.
    *
    * A name's mentions form a clique in the mention-level graph iff
    * `match(a,a)` accepts — which is NOT always (matcher.py rejects
    * identical too-general names with −21 and all-suffix names with
    * −1/−2), so blind contraction would wrongly merge self-rejecting
    * same-name mentions. The exact rule: a mention inherits its name
    * node's component iff the name SELF-ACCEPTS *and appears in ≥1
    * non-runaway-dropped block* (mention-level scoring only generates
    * self-pairs there — `keptIds`), or has ≥1 accepted edge (then
    * mention-level merges its mentions transitively through the
    * partner anyway); otherwise the mention is its own singleton —
    * exactly what mention-level CC produces. Label identity holds
    * because node id = min mention id per name, so min-label over
    * nodes = min over the component's mention ids. Asserted
    * bit-identical to the expanded mention-level path on a duplicated
    * corpus (incl. self-rejecting names) in PipelineSpec. */
  private def mentionComponents(norm: DataFrame, names: DataFrame,
      edges: DataFrame, nameClusters: DataFrame, keptIds: DataFrame,
      cfg: Config): DataFrame = {
    val endpoints = edges.select(col("id_a").as("nid"))
      .unionByName(edges.select(col("id_b").as("nid"))).distinct()
      .withColumn("has_edge", lit(true))
    // self-accept contraction is gated on the name appearing in ≥1
    // non-runaway-dropped block (keptIds): mention-level scoring
    // generates a name's self-pairs only there, so an all-keys-runaway
    // self-accepting name must stay singletons under both paths. A
    // name with an accepted edge is in a kept block by construction.
    val nodeFlag = names
      .select(col("pre_proc"), col("id").as("nid"),
        (gf.opt_barrier(gf.match_score(col("pre_proc"), col("pre_proc"))) > 0)
          .as("self_ok"))
      .join(endpoints, Seq("nid"), "left")
      .join(keptIds.select(col("id").as("nid"), lit(true).as("in_block")),
        Seq("nid"), "left")
      .select(col("pre_proc"), col("nid"),
        ((col("self_ok") && coalesce(col("in_block"), lit(false))) ||
          coalesce(col("has_edge"), lit(false))).as("contract"))
    // hydrate mentions: mention → its name node → the node's component.
    // Both maps are distinct-name-sized (≪ mentions at web scale);
    // broadcast keeps the mention table un-shuffled. When distinct
    // names outgrow the broadcast envelope (cfg.broadcastNames =
    // false — the 10^12-document regime), the same joins run as
    // shuffle joins on pre_proc/nid instead: correct at any size,
    // one extra exchange of the mention table.
    norm.select(col("id"), col("pre_proc"))
      .join(maybeBroadcast(nodeFlag, cfg), Seq("pre_proc"))
      .join(maybeBroadcast(nameClusters.withColumnRenamed("id", "nid"), cfg),
        Seq("nid"))
      .select(col("id"),
        when(col("contract"), col("component")).otherwise(col("id"))
          .as("component"))
  }

  /** pages → (mention_id, url, name, component), scoring each DISTINCT
    * normalized-name pair ONCE (match_pair.py:28-30's memo, taken to
    * its relational conclusion) and expanding components back to
    * mentions via [[mentionComponents]] (bit-identical to scoring
    * mention pairs directly).
    *
    * Why it matters at 100 TB: mentions repeat names (the web repeats
    * entities far more than it coins them), and pair volume is
    * quadratic PER BLOCK — a 10× name-duplication factor costs 100×
    * the pairs under mention-level scoring and 1× under name-level.
    * Locally the bench corpus is ~98% distinct names, so this is an
    * architecture property, not a bench win. */
  def endToEnd(pages: DataFrame, cfg: Config = Config()): DataFrame = {
    val mentions = extractMentions(pages)
    val norm = normalize(mentions.select(col("mention_id").as("id"), col("name")), cfg)
      .persist()
    val names = nameNodes(norm).persist()
    val (cand, keyed) = edgeCandidatesSelfKeyed(names, cfg)
    val edges0 = scoreCandidates(cand, cfg).persist()
    // hub pruning (opt-in over-merge mitigation): drop edges incident
    // to name nodes of degree > maxHubDegree before clustering
    val edges = cfg.maxHubDegree match {
      case Some(d) => ConnectedComponents
        .pruneHubs(edges0.select(col("id_a"), col("id_b")), d,
          broadcastHubs = cfg.broadcastNames)
        .toDF("id_a", "id_b")
      case None => edges0
    }
    val nameClusters = cluster(edges, names.select("id"), cfg)
    val clusters = mentionComponents(norm, names, edges, nameClusters,
      keptBlockIds(keyed, cfg), cfg)
    val joined = mentions.join(clusters, mentions("mention_id") === clusters("id"))
    // the reference's post-processing round trip (postproc-ppl.py:15-24)
    // as a final in-plan filter — no file round trip needed
    val filtered =
      if (cfg.postFilterPeople) joined.where(!gf.is_person(col("name")))
      else joined
    val projected = filtered
      .select(col("mention_id"), col("url"), col("name"), col("component"))
    val out =
      if (cfg.reliableCheckpointDir.isDefined) projected.checkpoint()
      else projected.localCheckpoint()
    // endToEnd-internal caches are released; the normalize memo is NOT:
    // its plan is the cross-query shared entry (identical plans dedupe
    // in the CacheManager since the PagesGen row-builder became a case
    // class), so unpersisting it here would evict it for every sibling
    // consumer in the session (e.g. the two-sided match path running
    // right after a clustering pass re-pays the full 229-rule cascade).
    // The entry is distinct-name-sized and dies with the session.
    names.unpersist()
    keyed.unpersist()
    edges0.unpersist()
    out
  }

  /** Full dataflow with per-stage committed outputs + lineage sidecars
    * (resumable: rerun skips stages whose sidecar matches). All table
    * reads/writes/fingerprints go through the [[TableIO]] seam —
    * parquet+sidecars locally, an Iceberg binding in production. */
  def runResumable(spark: SparkSession, pages: DataFrame, root: String,
      pagesFingerprint: String, cfg: Config = Config(),
      io: TableIO = ParquetTableIO): DataFrame = {
    val ch = cfg.hash
    val mentions = Lineage.stage(spark, root, "mentions", pagesFingerprint, ch, io) {
      extractMentions(pages)
    }
    val mFp = io.fingerprint(s"$root/mentions")
    val norm = Lineage.stage(spark, root, "names_norm", mFp, ch, io) {
      normalize(mentions.select(col("mention_id").as("id"), col("name")), cfg)
    }
    val nFp = io.fingerprint(s"$root/names_norm")
    // edges are NAME-level (one row per scored distinct-name pair —
    // the committed face of the match memo); ids are min-mention-ids,
    // so downstream consumers can still join them to mentions.
    // The keyed/name persists made inside the stage block are released
    // AFTER Lineage.stage's write action (the block is by-name — it
    // only runs, and only persists, when the stage isn't resumed).
    var edgeCaches: Seq[DataFrame] = Nil
    val edges = Lineage.stage(spark, root, "edges", nFp, ch, io) {
      val names = nameNodes(norm)
      val (cand, keyed) = edgeCandidatesSelfKeyed(names, cfg)
      edgeCaches = Seq(keyed, names)
      scoreCandidates(cand, cfg)
    }
    edgeCaches.foreach(_.unpersist())
    val eFp = io.fingerprint(s"$root/edges")
    Lineage.stage(spark, root, "clusters", eFp, ch, io) {
      val names = nameNodes(norm)
      // the runaway-kept vertex set is recomputed from the name nodes
      // (name-level key explode — cheap relative to the committed
      // stage, and the stage runs at most once per (input, config))
      val keyed = withBlockingKeys(names).select(col("id"), col("key"), col("w"))
      val prunedEdges = cfg.maxHubDegree match {
        case Some(d) => ConnectedComponents
          .pruneHubs(edges.select(col("id_a"), col("id_b")), d,
            broadcastHubs = cfg.broadcastNames)
          .toDF("id_a", "id_b")
        case None => edges
      }
      val nameClusters = cluster(prunedEdges, names.select("id"), cfg)
      mentionComponents(norm, names, prunedEdges, nameClusters,
        keptBlockIds(keyed, cfg), cfg)
    }
  }
}
