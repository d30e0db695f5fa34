package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.score.MatchCascade
import graft.text.LegacyVariants

/** coname.py:120-144's permutation matching re-expressed over the
  * modern cascade, including the preserved reference bug at
  * coname.py:139-141 (`if three_x:` gating the three_Y attempt). */
class LegacyPermutationSpec extends AnyFunSuite {

  test("crude prefilters reject (coname.py:123-127)") {
    // both > 7 chars, char overlap 0
    assert(LegacyVariants.permutationScore("aaaabbbb cccc", "ddddeeee ffff") == -100)
  }

  test("first2-merge rescues a split-token name the direct cascade rejects") {
    // merged2("ban corp industries") = abbrAdj("bancorp industries")
    // = "bankcorp industries" (abbr2 banc\w+ → bankcorp), which the
    // direct forms can never reach (spaceless forms differ)
    val a = "ban corp industries"
    val b = LegacyVariants.firstTwoMerged(a)
    assert(b != null && b != "bancorp industries", s"expected a rewrite, got $b")
    assert(MatchCascade.score(a, b) <= 0, s"direct cascade should reject: ${MatchCascade.score(a, b)}")
    assert(LegacyVariants.permutationScore(a, b) > 0)
  }

  test("reference bug preserved: y-side three-merge gated on x's three-merge") {
    val y = "ban co rp industries"
    val x = LegacyVariants.firstThreeMerged(y) // abbrAdj("bancorp industries")
    assert(x != null && graft.score.Fuzz.pySplit(x).length == 2, s"x = $x")
    // x-side: the three-merge of y … wait, x is the merged form; as the
    // QUERY side it has 2 tokens, so permutation(x, y) may only try
    // y-side merges — and the three_Y attempt is gated on X having a
    // three-merge (coname.py:139-141), which it does not. Blocked.
    assert(LegacyVariants.permutationScore(x, y) <= 0,
      "the y-side three-merge must be blocked by the preserved bug")
    // swapped, the same variant IS reachable (x-side three-merge has
    // no such gate): asymmetry documents the bug
    assert(LegacyVariants.permutationScore(y, x) > 0)
  }
}
