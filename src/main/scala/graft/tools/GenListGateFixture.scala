package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.score.MatchCascade

/** One-off fixture generator for the matcher.py:312 list-input
  * ambiguity (SURVEY.md §8 R1): whether rapidfuzz sorts a Python-list
  * input's elements before the sequence Indel is unverifiable in this
  * sandbox (no egress, no wheels). This emits the pairs where the two
  * candidate semantics produce DIFFERENT cascade codes — the exact
  * adjudication set — with both codes recorded, plus a control sample
  * where they agree, so a future environment with real rapidfuzz can
  * settle the reading by running the reference's `match()` over the
  * same pairs once and diffing against one column.
  *
  * Output: src/test/resources/golden/list_gate_golden.csv with columns
  * (a_norm, b_norm, code_unsorted, code_sorted). ListGateFixtureSpec
  * keeps the committed fixture in sync with the engine.
  */
object GenListGateFixture {
  def main(args: Array[String]): Unit = {
    val pool = Seq("acme", "zylex", "general", "generals", "motor",
      "motors", "standard", "standards", "international", "tech",
      "data", "dataco", "alpha", "beta", "zyltex", "zyltexs")
    val names = (for {
      t1 <- pool; t2 <- pool if t1 != t2
      tail <- Seq("", " inc")
    } yield s"$t1 $t2$tail").distinct
    val scored = for {
      a <- names; b <- names if a != b
      ta = a.split(" ").toSet; tb = b.split(" ").toSet
      if (ta & tb).nonEmpty // token-disjoint pairs agree by construction
    } yield (a, b, MatchCascade.score(a, b),
      MatchCascade.scoreSortedListGate(a, b))
    val diverging = scored.filter(r => r._3 != r._4)
    val control = scored.filter(r => r._3 == r._4).take(60)
    val rows = diverging ++ control
    val csv = ("a_norm,b_norm,code_unsorted,code_sorted" +:
      rows.map { case (a, b, cu, cs) => s"$a,$b,$cu,$cs" }).mkString("\n") + "\n"
    val out = Paths.get("src/test/resources/golden/list_gate_golden.csv")
    Files.write(out, csv.getBytes(StandardCharsets.UTF_8))
    println(s"GENLISTGATE ${diverging.size} diverging + ${control.size} control rows -> $out")
  }
}
