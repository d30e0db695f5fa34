package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.score.MatchCascade

/** SURVEY.md §8 R1: matcher.py:312 passes Python LISTS to rapidfuzz's
  * `token_sort_ratio` — whether rapidfuzz sorts a list input's
  * elements before the sequence Indel is unverifiable in this sandbox
  * (real rapidfuzz is not installable: no egress, and the pip cache
  * holds no wheels — documented in BASELINE.md). The engine and the
  * golden-generating shim both chose the UNSORTED reading.
  *
  * This spec bounds the risk of that choice: over (1) every cascade
  * golden pair, (2) token-swapped variants of every corpus name —
  * exactly the inputs where the two readings diverge (the gate scores
  * a swapped two-token list 50 unsorted vs 100 sorted) — and (3) a
  * synthetic token-pool sweep, the accept DECISION (code > 0) must be
  * identical under both readings. Any counterexample would mean the
  * unverified assumption could flip a match and must be surfaced, not
  * averaged away.
  */
class DecisionStabilitySpec extends AnyFunSuite {

  private def decisionsAgree(a: String, b: String): Boolean =
    (MatchCascade.score(a, b) > 0) == (MatchCascade.scoreSortedListGate(a, b) > 0)

  private def swapFirstTwo(name: String): String = {
    val t = name.split(" ")
    if (t.length < 2) name
    else (Array(t(1), t(0)) ++ t.drop(2)).mkString(" ")
  }

  private lazy val corpusNames: Seq[String] = {
    val rows = Csv.records("golden/cascade_golden.csv")
    (rows.map(_("a_norm")) ++ rows.map(_("b_norm"))).distinct
  }

  test("golden corpus pairs: decision identical under both list-gate readings") {
    val rows = Csv.records("golden/cascade_golden.csv")
    val bad = rows.filterNot(r => decisionsAgree(r("a_norm"), r("b_norm")))
    assert(bad.isEmpty, s"${bad.size} golden pairs flip decision: " +
      bad.take(3).map(r => (r("a_norm"), r("b_norm"))).mkString("; "))
  }

  test("token-swapped corpus variants: decision identical under both readings") {
    // the exact divergence scenario: b = a with its first two tokens
    // swapped, plus every cross pair (a, swap(b)) from the goldens
    val swapped = corpusNames.filter(_.split(" ").length >= 2)
    val selfSwaps = swapped.map(n => (n, swapFirstTwo(n)))
    val rows = Csv.records("golden/cascade_golden.csv")
    val crossSwaps = rows.map(r => (r("a_norm"), swapFirstTwo(r("b_norm"))))
    val bad = (selfSwaps ++ crossSwaps).filterNot { case (a, b) => decisionsAgree(a, b) }
    assert(bad.isEmpty, s"${bad.size} swapped pairs flip decision: " +
      bad.take(5).mkString("; "))
  }

  test("synthetic two-token pool sweep: decision identical under both readings") {
    // pool stresses the gate: shared tokens in both orders, eng words,
    // intl words, high-JW near-duplicates, digits, suffix tails
    // incl. high-Jaro-Winkler near-duplicates ("generals"/"general",
    // "zyltexs"/"zyltex") — swapped, these are where a sorted gate
    // passes (100) while the unsorted gate rejects (50), so any
    // decision flip would surface here
    val pool = Seq("acme", "zylex", "general", "generals", "motor",
      "motors", "standard", "standards", "international", "tech",
      "data", "dataco", "alpha", "beta", "zyltex", "zyltexs")
    val names = for {
      t1 <- pool; t2 <- pool if t1 != t2
      tail <- Seq("", " inc")
    } yield s"$t1 $t2$tail"
    // all ordered pairs is |names|² ≈ 70k — restrict b to names sharing
    // ≥1 token with a: the gate needs a nonzero LCS to diverge, so
    // token-disjoint pairs score identically under both readings by
    // construction and need no sweep
    val byTok = names.distinct.toVector
    var checked = 0
    val bad = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (a <- byTok; b <- byTok if a != b) {
      val ta = a.split(" ").toSet
      val tb = b.split(" ").toSet
      if ((ta & tb).nonEmpty) {
        checked += 1
        if (!decisionsAgree(a, b)) bad += ((a, b))
      }
    }
    info(s"checked $checked shared-token synthetic pairs")
    assert(bad.isEmpty, s"${bad.size} synthetic pairs flip decision: " +
      bad.take(10).mkString("; "))
  }
}
