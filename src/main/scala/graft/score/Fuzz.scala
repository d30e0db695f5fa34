package graft.score

/** String-similarity primitives matching the scorers the reference
  * imports (matcher.py:24-25): rapidfuzz's `ratio` (normalized Indel
  * similarity × 100), `token_sort_ratio`, `token_set_ratio` (SeatGeek
  * decomposition over the Indel ratio), and the modern `Levenshtein`
  * package's `jaro_winkler` (Winkler boost above 0.7, 4-char prefix
  * cap, weight 0.1). Pure, allocation-light Scala so the Catalyst
  * expressions in graft.expr can call these from generated code.
  *
  * Division/multiplication order mirrors the Python implementations so
  * Double results are bit-identical to the golden fixtures.
  */
object Fuzz extends Serializable {

  /** Indel distance = |s1| + |s2| − 2·LCS over chars. */
  def indelDistance(s1: CharSequence, s2: CharSequence): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0 || m == 0) return n + m
    val dp = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      var prevDiag = 0
      val ci = s1.charAt(i)
      var j = 0
      while (j < m) {
        val tmp = dp(j + 1)
        if (ci == s2.charAt(j)) dp(j + 1) = prevDiag + 1
        else if (dp(j) > dp(j + 1)) dp(j + 1) = dp(j)
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    n + m - 2 * dp(m)
  }

  /** Indel distance over generic token sequences (rapidfuzz accepts
    * arbitrary hashable sequences; the reference passes token lists at
    * matcher.py:312 and char lists at :168). */
  def indelDistanceSeq(s1: IndexedSeq[String], s2: IndexedSeq[String]): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0 || m == 0) return n + m
    val dp = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      var prevDiag = 0
      val ci = s1(i)
      var j = 0
      while (j < m) {
        val tmp = dp(j + 1)
        if (ci == s2(j)) dp(j + 1) = prevDiag + 1
        else if (dp(j) > dp(j + 1)) dp(j + 1) = dp(j)
        prevDiag = tmp
        j += 1
      }
      i += 1
    }
    n + m - 2 * dp(m)
  }

  /** rapidfuzz fuzz.ratio — normalized Indel similarity × 100. */
  def ratio(s1: CharSequence, s2: CharSequence): Double = {
    val lensum = s1.length + s2.length
    if (lensum == 0) return 100.0
    100.0 * (1.0 - indelDistance(s1, s2).toDouble / lensum)
  }

  /** fuzz.ratio over token sequences (elementwise equality). */
  def ratioSeq(s1: IndexedSeq[String], s2: IndexedSeq[String]): Double = {
    val lensum = s1.length + s2.length
    if (lensum == 0) return 100.0
    100.0 * (1.0 - indelDistanceSeq(s1, s2).toDouble / lensum)
  }

  /** Python-`str.split()` tokenization: split on whitespace runs,
    * dropping empties. */
  def pySplit(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  private def sortedJoin(s: String): String = {
    val t = pySplit(s)
    java.util.Arrays.sort(t, java.util.Comparator.naturalOrder[String]())
    t.mkString(" ")
  }

  /** fuzz.token_sort_ratio on strings. */
  def tokenSortRatio(s1: String, s2: String): Double =
    ratio(sortedJoin(s1), sortedJoin(s2))

  /** fuzz.token_sort_ratio on 2-token (or any) sequences — rapidfuzz
    * treats a non-string sequence as a single whitespace-free token
    * run, so sorted-split is the identity and this reduces to the
    * elementwise Indel ratio. */
  def tokenSortRatioSeq(s1: IndexedSeq[String], s2: IndexedSeq[String]): Double =
    ratioSeq(s1, s2)

  /** fuzz.token_set_ratio — max of the three SeatGeek comparisons,
    * computed via the rapidfuzz distance formulas. */
  def tokenSetRatio(s1: String, s2: String): Double = {
    val ta = pySplit(s1).toSet
    val tb = pySplit(s2).toSet
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val inter = ta & tb
    val dab = ta -- tb
    val dba = tb -- ta
    if (inter.nonEmpty && (dab.isEmpty || dba.isEmpty)) return 100.0
    val ab = dab.toArray.sorted.mkString(" ")
    val ba = dba.toArray.sorted.mkString(" ")
    val sectLen = inter.toArray.sorted.mkString(" ").length
    val sd = if (sectLen > 0) 1 else 0
    val abLen = ab.length
    val baLen = ba.length
    val sectAbLen = sectLen + sd + abLen
    val sectBaLen = sectLen + sd + baLen
    var best = 0.0
    val denom0 = sectAbLen + sectBaLen
    if (denom0 > 0) {
      val d = indelDistance(ab, ba)
      best = 100.0 * (1.0 - d.toDouble / denom0)
    } else best = 100.0
    val d1 = sectLen + sectAbLen
    val r1 = if (d1 > 0) 100.0 * (1.0 - (sd + abLen).toDouble / d1) else 100.0
    val d2 = sectLen + sectBaLen
    val r2 = if (d2 > 0) 100.0 * (1.0 - (sd + baLen).toDouble / d2) else 100.0
    math.max(best, math.max(r1, r2))
  }

  /** Jaro similarity (rapidfuzz definition). */
  def jaro(s1: CharSequence, s2: CharSequence): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t) / m) / 3.0
  }

  /** Levenshtein.jaro_winkler with prefix_weight 0.1. */
  def jaroWinkler(s1: CharSequence, s2: CharSequence): Double = {
    var sim = jaro(s1, s2)
    if (sim > 0.7) {
      val mx = math.min(4, math.min(s1.length, s2.length))
      var pref = 0
      while (pref < mx && s1.charAt(pref) == s2.charAt(pref)) pref += 1
      sim += pref * 0.1 * (1.0 - sim)
    }
    sim
  }

  /** Plain Levenshtein edit distance (north-star extra scorer; Spark's
    * built-in `levenshtein` is used at the DataFrame level — this is
    * the scalar form for the cascade-side API). */
  def levenshtein(s1: CharSequence, s2: CharSequence): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  /** Python `sorted(str)` joined back — the char-anagram form used at
    * matcher.py:168 (`ratio(sorted(c), sorted(d)) == 100` ⇔ equal
    * sorted char sequences). */
  def sortedChars(s: String): String = {
    val a = s.toCharArray
    java.util.Arrays.sort(a)
    new String(a)
  }
}
