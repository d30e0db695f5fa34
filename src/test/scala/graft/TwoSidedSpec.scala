package graft

import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.Pipeline

/** The reference's primary entry point: matcher.py's two-sided
  * main × base match (matcher.py:381-394) — candidatesTwoSided +
  * cascade + 5-column output. Ground truth comes from the page
  * generator: mention urls encode the entity id and base-universe ids
  * ARE entity ids, so a correct match is exactly `entityOf(url) ==
  * base_idx`. */
class TwoSidedSpec extends SparkSuite {
  import spark.implicits._

  private val nEnt = 100L

  test("two-sided candidates block every variant-0 mention with its base row") {
    val mentions = Pipeline.extractMentions(PagesGen.generate(spark, nEnt, 4))
    val main = Pipeline.normalize(
      mentions.select(col("mention_id").as("id"), col("name")))
    val base = Pipeline.normalize(PagesGen.baseUniverse(spark, nEnt))
    val cand = Pipeline.candidatesTwoSided(main, base)
      .join(mentions.select(col("mention_id").as("id_a"), col("url")), Seq("id_a"))
      .select(col("url"), col("id_b")).as[(String, Long)].collect()
    assert(cand.nonEmpty)
    // variant 0 is "<base name> Inc." — it must reach its own base row
    val hit = cand.collect { case (url, b) if PagesGen.entityOf(url) == b => b }.toSet
    assert(hit.size == nEnt, s"entities with own-base candidate: ${hit.size}/$nEnt")
  }

  test("fused two-sided candidates ≡ unfused ∘ prefilter") {
    val mentions = Pipeline.extractMentions(PagesGen.generate(spark, nEnt, 4))
    val main = Pipeline.normalize(
      mentions.select(col("mention_id").as("id"), col("name")))
    val base = Pipeline.normalize(PagesGen.baseUniverse(spark, nEnt))
    val cfg = Pipeline.Config()
    val fused = Pipeline.edgeCandidatesTwoSided(main, base, cfg)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val unfused = Pipeline.candidatesTwoSided(main, base, cfg)
      .where(graft.expr.functions.prefilter_pass(
        col("nos_a"), col("nos_b"), cfg.cutoff))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(fused == unfused,
      s"fused-only=${(fused -- unfused).take(5)} unfused-only=${(unfused -- fused).take(5)}")
  }

  test("er_match emits the matcher.py 5-col contract with correct matches") {
    val out = SparkEntry.queries("er_match")(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq ==
      Seq("main_idx", "main_name", "base_idx", "base_name", "token_sort_ratio"))
    val rows = out
      .join(Pipeline.extractMentions(SparkEntry.pagesFor(spark, "/root/testdata/sf0.001"))
        .select(col("mention_id").as("main_idx"), col("url")), Seq("main_idx"))
      .select(col("url"), col("base_idx"), col("token_sort_ratio"))
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // every accepted pair carries the reference's output score range
    assert(rows.forall { case (_, _, s) => s >= 0.0 && s <= 100.0 })
    // precision: accepted matches overwhelmingly link a mention to its
    // own entity's base row (near-identical sibling names may cross)
    val correct = rows.count { case (url, b, _) => PagesGen.entityOf(url) == b }
    assert(correct.toDouble / rows.length >= 0.9,
      s"two-sided precision ${correct.toDouble / rows.length}")
    // recall: every entity's variant-0 mention ("<base> Inc.") is an
    // exact-normalized match and must be accepted
    val matched = rows.collect { case (url, b, _) if PagesGen.entityOf(url) == b => b }.toSet
    val expected = SparkEntry.entityCountFor("/root/testdata/sf0.001")
    assert(matched.size == expected, s"entities matched: ${matched.size}/$expected")
  }
}
