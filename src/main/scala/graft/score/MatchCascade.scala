package graft.score

import java.util.regex.Pattern

import graft.text.{AbbrTables, Dictionaries, Normalizer}

/** The reference's accept/reject rule cascade `match(a, b)`
  * (/root/reference/matcher.py:139-366), ported rule-for-rule over the
  * same dictionaries. Input: two normalized names (a = query side,
  * b = base/CRSP side). Output: signed code; accept ⇔ code > 0. The
  * Python `return False` paths (check_double) are represented as 0,
  * which preserves `code > 0` accept semantics.
  *
  * Reference quirks preserved on purpose (SURVEY.md §8 R3): the
  * always-false chained comparison that makes +11 unreachable
  * (matcher.py:337), the dead threshold assignment at :197-198, the
  * asymmetric −23/−3 rules testing only one side, last-occurrence
  * pos_x vs first-occurrence pos_y, and scores appended for suffix
  * tokens before the `continue`.
  */
object MatchCascade extends Serializable {

  import Fuzz._

  private val suffix = AbbrTables.suffix
  private val intl = Vector("global", "international", "worldwide", "national")
  private val tooGeneral = Vector("and", "of", "for", "holdings", "holding",
    "group", "enterprises", "international", "global")
  private val na: Set[String] =
    Set("north", "america", "great") ++ intl ++ tooGeneral

  private val banList = Vector("organization", "organization", "academy",
    "university", "agency", "republic", "union", "21st", "commission",
    "council", "school", "community", "institute", "federation", "nations",
    "association", "church", "society", "league", "800", "24",
    "great america")

  /** matcher.py:122 — ASCII-only `[a-z]+`. */
  private val wPlus = Pattern.compile("[a-z]+")

  private def wPlusFirst(s: String): String = {
    val m = wPlus.matcher(s)
    if (m.find()) m.group() else null
  }

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** check_double (matcher.py:66-81). Returns true when the Python
    * function returns False (= reject signal); false for its None. */
  private def checkDoubleRejects(a: Array[String], b: Array[String]): Boolean = {
    var i = 0
    while (i < a.length - 1) {
      val a1 = a(i); val a2 = a(i + 1)
      if (ratio(a1, a2) > 89 && !(suffix.contains(a1) || suffix.contains(a2))) {
        var j = 0
        var broke = false
        while (j < b.length - 1 && !broke) {
          val b1 = b(j); val b2 = b(j + 1)
          if (ratio(b1, b2) > 89 && !(suffix.contains(b1) || suffix.contains(b2))) {
            if (ratio(a1, b1) <= 89) return true
            else broke = true
          }
          j += 1
        }
        if (!broke) return true // Python for-else: no qualifying b-bigram broke
      }
      i += 1
    }
    false
  }

  /** match(a, b) → signed code (accept ⇔ > 0). */
  def score(a: String, b: String): Int = {
    val eng = Dictionaries.eng
    val commonAbbr = Dictionaries.commonAbbr
    val commonAbbr12 = Dictionaries.commonAbbr12

    // part 1: high-similarity treatment (matcher.py:141-146)
    if (a.contains("matchit") && b.contains("matchit")) {
      val at = pySplit(a.substring(0, a.indexOf("matchit")))
      val bt = pySplit(b.substring(0, b.indexOf("matchit")))
      // Python IndexError on empty → logged and fallen through
      if (at.nonEmpty && bt.nonEmpty && at.last == bt.last) return 16
    }
    val c = Normalizer.removeSuffix(a)
    val d = Normalizer.removeSuffix(b)
    val x = pySplit(b)
    val y = pySplit(a)

    if (y.length - x.length > 5) return -23
    val _aSet = y.toSet -- suffix
    val _bSet = x.toSet -- suffix
    if ((_aSet -- na).isEmpty) return -1
    if ((_bSet -- na).isEmpty) return -2

    if (Dictionaries.hasLocation(a) && Dictionaries.hasLocation(b)) {
      if (tokenSortRatio(a, b) > 95) return 21 else return -22
    }
    if (a.replace(" ", "") == b.replace(" ", "") && a.length > 8) return 1
    if (tokenSortRatio(a, b) == 100.0 || sortedChars(c) == sortedChars(d)) {
      if (a.take(3) == b.take(3)) {
        if (tooGeneral.contains(c) && tooGeneral.contains(d)) return -21
        else if (x.length >= 2 && y.length >= 2) {
          if (x(1).take(3) == y(1).take(3)) return 1
          // else fall through (matcher.py:173-175 has no else-return)
        } else return 1
      }
    }

    var bi = 0
    while (bi < banList.length) {
      if (a.contains(banList(bi))) return -3
      bi += 1
    }

    // per-token alignment (matcher.py:183-223)
    val goodX = scala.collection.mutable.Set.empty[String]
    val goodY = scala.collection.mutable.Set.empty[String]
    var hasBadX = false
    val posX = scala.collection.mutable.HashMap.empty[String, Int]
    val posY = scala.collection.mutable.HashMap.empty[String, Int]
    val scoreX = new Array[Double](x.length + 1) // 1-based; 0 unused
    var m = 1
    while (m <= x.length) {
      val wx = x(m - 1)
      posX(wx) = m // last occurrence wins (matcher.py:188)
      var best = 0.0
      var any = false
      var n = 1
      while (n <= y.length) {
        val wy = y(n - 1)
        if (!posY.contains(wy)) posY(wy) = n // first occurrence (matcher.py:191-192)
        val sc = ratio(wx, wy)
        if (!any || sc > best) best = sc
        any = true
        if (!suffix.contains(wy)) {
          // threshold ladder — first assignment dead, preserved order
          var threshold = if (m == 1) 92 else 89
          if (x.length == y.length && x.length > 3) threshold = 75
          if (sc > threshold && wx.charAt(0) == wy.charAt(0) &&
              !(wy.last >= '0' && wy.last <= '9')) goodX += wx
          if (jaroWinkler(wx, wy) > 0.92) goodY += wy
        }
        n += 1
      }
      if (!goodX.contains(wx) && !suffix.contains(wx)) hasBadX = true
      if (!goodX.contains(wx) && m == 1) hasBadX = true
      scoreX(m) = if (any) best else 0.0
      m += 1
    }

    // high token-sort score (matcher.py:226-231)
    if (tokenSortRatio(c, d) > 94 && !hasBadX && a.charAt(0) == b.charAt(0))
      return 2

    if (x.length == 0 || y.length == 0) return -4
    if (x.length == 1 && (eng.contains(x(0)) || x(0).length < 5)) return -5
    if (x.length == 2 && eng.contains(x.take(2).mkString(" "))) return -6
    if (x.length == 3 && eng.contains(x.take(3).mkString(" "))) return -13

    // part 2 (matcher.py:247-250)
    if (checkDoubleRejects(x, y)) return 0
    if (checkDoubleRejects(y, x)) return 0

    // "all tokens explained" (matcher.py:252-275)
    val cToks = pySplit(c).toSet
    val dToks = pySplit(d).toSet
    if ((cToks -- commonAbbr -- goodY).isEmpty || (dToks -- commonAbbr -- goodX).isEmpty) {
      val remainGoodY = goodY.toSet -- suffix
      if (remainGoodY.size == 1) {
        val goodWy = wPlusFirst(remainGoodY.head)
        if (goodWy != null) {
          if (commonAbbr12.contains(goodWy)) return -8
        } else return -18
        var n = 0
        while (n < y.length) {
          val wy = y(n)
          if (!goodY.contains(wy) && !suffix.contains(wy)) {
            if (posY(wy) <= x.length) return -20
          }
          n += 1
        }
        var mm = 1
        val lim = math.min(y.length, x.length)
        while (mm <= lim) {
          if (scoreX(mm) < 80) return -20
          mm += 1
        }
      }
      if (goodX.contains(x(0)) && goodY.contains(y(0)) &&
          !eng.contains(x(0)) && !eng.contains(y(0)) &&
          a.take(3) == b.take(3)) return 10
    }

    val ggY = goodY.toSet -- commonAbbr -- suffix
    val ggX = goodX.toSet -- commonAbbr -- suffix

    // "enough informative matched letters" (matcher.py:280-307)
    val asciiCount = ggY.toSeq.map(w => w.count(isAsciiLetter)).sum
    if (ggY.size * asciiCount > 12) {
      if (!eng.contains(ggY.toArray.sorted.mkString(" "))) {
        if (ggX.nonEmpty) {
          val posGoodY = ggY.toSeq.map(posY(_))
          val posGoodX = ggX.toSeq.map(posX(_))
          if (posGoodY.size == 1 + posGoodY.max - posGoodY.min &&
              posGoodX.size == 1 + posGoodX.max - posGoodX.min) {
            if (goodY.contains(y(0)) && !eng.contains(y(0))) {
              if (scoreX(1) > 89 && x.length == 1) return 4
              else if (x.length > 1) {
                if (scoreX(1) > 89 && scoreX(2) > 89) return 4
              }
            } else {
              if (intl.contains(y(0)) && scoreX(1) > 93) {
                if (hasBadX) {
                  if (y(1).take(3) == x(0).take(3)) return 5
                } else return 55
              }
            }
          }
        }
      }
    }

    // two-token gate (matcher.py:309-332)
    val _x = x.toSet -- suffix
    val _y = y.toSet -- suffix
    if (_x.size > 1 && _y.size > 1) {
      if (tokenSortRatioSeq(scala.collection.immutable.ArraySeq(x(0), x(1)),
          scala.collection.immutable.ArraySeq(y(0), y(1))) > 84) {
        if (x(0) == y(0) && !hasBadX) return 8
        if (!eng.contains(x.take(2).mkString(" ")) && !eng.contains(y.take(2).mkString(" "))) {
          if (eng.contains(x(0)) && eng.contains(x(1)) &&
              eng.contains(y(0)) && eng.contains(y(1))) {
            if ((_y -- goodY -- commonAbbr).nonEmpty && hasBadX) return -19
          }
          if (jaroWinkler(x(0), y(0)) > 0.97 && jaroWinkler(x(1), y(1)) > 0.94) {
            if (!intl.contains(x(0)) && !intl.contains(y(1))) {
              if (hasBadX) {
                if ((_y -- goodY).isEmpty) return 91
              } else return 9
            }
          }
        } else return -9
      } else return -99
    }

    // single-token names (matcher.py:334-349)
    if (_x.size == 1 && _y.size == 1) {
      if (jaroWinkler(x(0), y(0)) > 0.97 && x(0).length > 7 &&
          math.abs(x(0).length - y(0).length) <= 1) {
        // Python chained comparison at :337 is provably always False →
        // +11 unreachable; −12 always taken.
        return -12
      }
      if (x(0).length >= 5 && y(0).length >= 5) {
        if (x(0).take(5) == y(0).take(5) &&
            x(0).takeRight(3) == y(0).takeRight(3) &&
            math.abs(x(0).length - y(0).length) <= 1) return 12
        if (x(0).takeRight(5) == y(0).takeRight(5) &&
            x(0).take(3) == y(0).take(3) &&
            math.abs(x(0).length - y(0).length) <= 1) return 13
      }
    }

    // lone good_y re-check (matcher.py:351-357)
    if (goodY.size == 1) {
      val goodWy = wPlusFirst(goodY.head)
      if (goodWy != null) {
        if (commonAbbr12.contains(goodWy)) return -8 else return -18
      }
    }
    val remainingX = x.toSet -- commonAbbr -- suffix
    if (remainingX.isEmpty) return -10
    if (remainingX.size == 1 && remainingX.head.length == 1) return -11

    -15
  }

  /** match_test (matcher.py:369-377): normalize, prefilter, score.
    * Returns None-equivalent as Int.MinValue sentinel when either name
    * normalizes away or the prefilter fails. */
  val cutoff = 50
  final val NoScore = Int.MinValue

  def matchTest(rawA: String, rawB: String): Int = {
    val a = Normalizer.namePreprocessing(rawA)
    val b = Normalizer.namePreprocessing(rawB)
    if (a == null || b == null || a.isEmpty || b.isEmpty) return NoScore
    val ts = tokenSetRatio(Normalizer.removeSuffix(a), Normalizer.removeSuffix(b))
    if (ts > cutoff) score(a, b) else NoScore
  }

  /** The matcher output score column: token_sort_ratio of the
    * suffix-stripped forms (matcher.py:393). */
  def outputScore(noSuffixA: String, noSuffixB: String): Double =
    tokenSortRatio(noSuffixA, noSuffixB)
}
