package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.score.Fuzz

/** Scorer-primitive parity vs fuzz_golden.csv (reference-pipeline
  * values) plus algebraic property checks (seeded random strings to
  * stay off the scalatest-plus bridge, which isn't in the offline
  * cache). */
class FuzzSpec extends AnyFunSuite {

  private def forAll(f: (String, String) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdef ñé xyz"
    (1 to 500).foreach { _ =>
      val a = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val b = (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      f(a, b)
    }
  }

  private def d(s: String): Double = s.toDouble

  test("ratio/token_sort/token_set/jaro_winkler match golden values exactly") {
    val rows = Csv.records("golden/fuzz_golden.csv")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r("a"), r("b"))
      assert(Fuzz.ratio(a, b) == d(r("ratio")), s"ratio($a,$b)")
      assert(Fuzz.tokenSortRatio(a, b) == d(r("token_sort")), s"token_sort($a,$b)")
      assert(Fuzz.tokenSetRatio(a, b) == d(r("token_set")), s"token_set($a,$b)")
      assert(Fuzz.jaroWinkler(a, b) == d(r("jaro_winkler")), s"jw($a,$b)")
    }
  }

  test("known jaro-winkler values") {
    assert(math.abs(Fuzz.jaroWinkler("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(Fuzz.jaroWinkler("", "") == 1.0)
    assert(Fuzz.jaroWinkler("a", "") == 0.0)
    assert(Fuzz.jaroWinkler("abc", "abc") == 1.0)
  }

  test("properties: symmetry, bounds, identity") {
    forAll { (a, b) =>
      val r = Fuzz.ratio(a, b)
      assert(r >= 0.0 && r <= 100.0)
      assert(r == Fuzz.ratio(b, a))
      assert(Fuzz.ratio(a, a) == 100.0)
      val jw = Fuzz.jaroWinkler(a, b)
      assert(jw >= 0.0 && jw <= 1.0)
      assert(jw == Fuzz.jaroWinkler(b, a))
      val lv = Fuzz.levenshtein(a, b)
      assert(lv == Fuzz.levenshtein(b, a))
    }
  }

  test("prefilter short-circuit is decision-identical to token_set_ratio > cutoff") {
    import org.apache.spark.unsafe.types.UTF8String
    val rows = Csv.records("golden/cascade_golden.csv")
      .filter(r => r("a_norm").nonEmpty && r("b_norm").nonEmpty)
    val cuts = Seq(30.0, 50.0, 80.0)
    rows.foreach { r =>
      val a = graft.text.Normalizer.removeSuffix(r("a_norm"))
      val b = graft.text.Normalizer.removeSuffix(r("b_norm"))
      cuts.foreach { c =>
        val want = Fuzz.tokenSetRatio(a, b) > c
        val got = Fuzz.tokenSetRatioGtUtf8(
          UTF8String.fromString(a), UTF8String.fromString(b), c)
        assert(got == want, s"<$a> <$b> cutoff=$c")
      }
    }
  }

  test("token ratios: order-insensitive for token_sort; subset=100 for token_set") {
    assert(Fuzz.tokenSortRatio("ab cd ef", "ef cd ab") == 100.0)
    assert(Fuzz.tokenSetRatio("general electric inc", "general electric") == 100.0)
  }

  test("bit-parallel indel distance ≡ DP (random, incl. 64-char boundary and non-ascii)") {
    val rnd = new scala.util.Random(7)
    def str(len: Int): String = {
      val sb = new StringBuilder
      for (_ <- 0 until len)
        sb += (if (rnd.nextInt(50) == 0) 'é' else ('a' + rnd.nextInt(6)).toChar)
      sb.toString
    }
    for (_ <- 0 until 5000) {
      val a = str(rnd.nextInt(70)) // crosses the 64-bit word boundary
      val b = str(rnd.nextInt(70))
      assert(graft.score.Fuzz.indelDistance(a, b) ==
        graft.score.Fuzz.indelDistanceDp(a, b), s"<$a> <$b>")
    }
    // exact boundary: n = 64 uses the full-word mask
    val a64 = "ab" * 32
    assert(graft.score.Fuzz.indelDistance(a64, a64) == 0)
    assert(graft.score.Fuzz.indelDistance(a64, "ba" * 32) ==
      graft.score.Fuzz.indelDistanceDp(a64, "ba" * 32))
  }
}
