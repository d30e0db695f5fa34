package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.score.{Fuzz, MatchCascade}
import graft.text.Normalizer

/** Full-cascade parity vs cascade_golden.csv: the reference's
  * normalize → prefilter → match() decisions over every white/black
  * labeled pair plus 4.6k deterministic corpus pairs. Also reports the
  * pairwise confusion vs the curated labels (the BASELINE F1 gate is
  * parity with the REFERENCE's decisions, which this asserts exactly).
  */
class CascadeSpec extends AnyFunSuite {

  private lazy val rows = Csv.records("golden/cascade_golden.csv")

  test("normalization column parity on cascade corpus") {
    rows.foreach { r =>
      val an = Option(Normalizer.namePreprocessing(r("a_raw"))).getOrElse("")
      val bn = Option(Normalizer.namePreprocessing(r("b_raw"))).getOrElse("")
      assert(an == r("a_norm"), s"a_raw=<${r("a_raw")}>")
      assert(bn == r("b_norm"), s"b_raw=<${r("b_raw")}>")
    }
  }

  test("prefilter token_set_ratio parity (exact doubles)") {
    rows.filter(r => r("tsr_nosuffix").nonEmpty).foreach { r =>
      val ts = Fuzz.tokenSetRatio(
        Normalizer.removeSuffix(r("a_norm")), Normalizer.removeSuffix(r("b_norm")))
      assert(ts == r("tsr_nosuffix").toDouble,
        s"pair=<${r("a_norm")}> <${r("b_norm")}> got=$ts want=${r("tsr_nosuffix")}")
    }
  }

  test("match() codes identical to reference on every scored pair") {
    var n = 0
    rows.filter(r => r("code").nonEmpty).foreach { r =>
      val want = if (r("code") == "False") 0 else r("code").toInt
      val got = MatchCascade.score(r("a_norm"), r("b_norm"))
      assert(got == want, s"a=<${r("a_norm")}> b=<${r("b_norm")}> want=$want got=$got")
      n += 1
    }
    info(s"checked $n cascade codes")
    assert(n > 1000)
  }

  test("accept decisions identical end-to-end (raw names in, decision out)") {
    rows.foreach { r =>
      val got = MatchCascade.matchTest(r("a_raw"), r("b_raw"))
      val accept = got != MatchCascade.NoScore && got > 0
      assert(accept == (r("accept") == "1"),
        s"a=<${r("a_raw")}> b=<${r("b_raw")}> code=$got want accept=${r("accept")}")
    }
  }

  test("pairwise precision/recall on curated white/black lists") {
    var tp = 0; var fp = 0; var fn = 0; var tn = 0
    rows.filter(r => r("label") == "0" || r("label") == "1").foreach { r =>
      val got = MatchCascade.matchTest(r("a_raw"), r("b_raw"))
      val accept = got != MatchCascade.NoScore && got > 0
      (r("label"), accept) match {
        case ("1", true) => tp += 1
        case ("1", false) => fn += 1
        case ("0", true) => fp += 1
        case _ => tn += 1
      }
    }
    val p = tp.toDouble / (tp + fp)
    val rr = tp.toDouble / (tp + fn)
    val f1 = 2 * p * rr / (p + rr)
    info(f"curated-label confusion: tp=$tp fp=$fp fn=$fn tn=$tn P=$p%.3f R=$rr%.3f F1=$f1%.3f")
    // the reference's own decisions on its curated lists (README.md:7);
    // parity with those decisions is asserted test-by-test above.
    assert(tp + fp + fn + tn == 179)
  }
}
