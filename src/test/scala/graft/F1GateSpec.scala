package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.block.BlockingKeys
import graft.score.MatchCascade

/** The BASELINE gate: pairwise F1 ≥ 0.99 vs the reference's match
  * decisions, evaluated within the same blocking key (BASELINE.json
  * north_rule). For every golden labeled/corpus pair that shares at
  * least one blocking key, the engine's accept decision must equal the
  * reference's — F1 vs the reference is therefore 1.0 by parity; this
  * test computes it explicitly end-to-end (raw names → normalize →
  * block → prefilter → cascade). */
class F1GateSpec extends AnyFunSuite {

  test("pairwise F1 vs reference decisions at the same blocking key") {
    val rows = Csv.records("golden/cascade_golden.csv")
    var tp = 0; var fp = 0; var fn = 0; var tn = 0; var blocked = 0
    rows.foreach { r =>
      val (aN, bN) = (r("a_norm"), r("b_norm"))
      if (aN.nonEmpty && bN.nonEmpty) {
        val shareKey = (BlockingKeys.keys(aN).toSet & BlockingKeys.keys(bN).toSet).nonEmpty
        if (shareKey) {
          blocked += 1
          val refAccept = r("accept") == "1"
          val got = MatchCascade.matchTest(r("a_raw"), r("b_raw"))
          val ourAccept = got != MatchCascade.NoScore && got > 0
          (refAccept, ourAccept) match {
            case (true, true) => tp += 1
            case (true, false) => fn += 1
            case (false, true) => fp += 1
            case _ => tn += 1
          }
        } else {
          // blocking recall guarantee: no reference-accepted pair may
          // be outside blocking
          assert(r("accept") != "1", s"accepted pair lost by blocking: <$aN> <$bN>")
        }
      }
    }
    val p = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val rr = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    val f1 = if (p + rr == 0) 0.0 else 2 * p * rr / (p + rr)
    info(f"same-block pairs=$blocked tp=$tp fp=$fp fn=$fn tn=$tn P=$p%.4f R=$rr%.4f F1=$f1%.4f")
    assert(f1 >= 0.99, f"pairwise F1 vs reference decisions = $f1%.4f < 0.99")
  }
}
