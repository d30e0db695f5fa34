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

  // thread-local scratch: the LCS DP row and Jaro match flags are the
  // per-pair allocation hot spots at millions of pairs/executor
  private val dpBuf = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  private val flagBuf = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](512)
  }

  private def dpRow(n: Int): Array[Int] = {
    var b = dpBuf.get()
    if (b.length < n) { b = new Array[Int](math.max(n, b.length * 2)); dpBuf.set(b) }
    java.util.Arrays.fill(b, 0, n, 0)
    b
  }

  private val pmBuf = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](128)
  }

  /** Indel distance = |s1| + |s2| − 2·LCS over chars.
    *
    * Hot path: normalized names are short lowercase-ASCII strings, so
    * the LCS runs bit-parallel (CIPR bit-vector LCS: one `(V + t) |
    * (V − t)` word op per s2 char instead of an O(n·m) DP row sweep —
    * ~n× fewer operations for n ≤ 64). Values are EXACT (same LCS),
    * verified against the DP in FuzzSpec and by the 1180/1023 golden
    * suites; non-ASCII or >64-char inputs fall back to the DP. */
  def indelDistance(s1: CharSequence, s2: CharSequence): Int = {
    val n = s1.length
    val m = s2.length
    if (n == 0 || m == 0) return n + m
    if (n <= 64) {
      val pm = pmBuf.get()
      var ascii = true
      var i = 0
      while (i < n && ascii) {
        val c = s1.charAt(i)
        if (c >= 128) ascii = false else pm(c) |= 1L << i
        i += 1
      }
      if (ascii) {
        // low n bits of V evolve exactly as an n-bit machine (carries/
        // borrows into bits ≥ n never feed back down); mask at the end
        var v = -1L
        var j = 0
        while (j < m) {
          val c = s2.charAt(j)
          val t = (if (c < 128) pm(c) else 0L) & v
          v = (v + t) | (v - t)
          j += 1
        }
        // clear only the touched pm entries
        i = 0
        while (i < n) { val c = s1.charAt(i); if (c < 128) pm(c) = 0L; i += 1 }
        val mask = if (n == 64) -1L else (1L << n) - 1
        val lcs = n - java.lang.Long.bitCount(v & mask)
        return n + m - 2 * lcs
      }
      // undo partial pm fill before falling back
      var k = 0
      while (k < i) { val c = s1.charAt(k); if (c < 128) pm(c) = 0L; k += 1 }
    }
    indelDistanceDp(s1, s2)
  }

  private[graft] def indelDistanceDp(s1: CharSequence, s2: CharSequence): Int = {
    val n = s1.length
    val m = s2.length
    val dp = dpRow(m + 1)
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
    val dp = dpRow(m + 1)
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

  /** Cached sorted-distinct-token view of a string (for the
    * token_set_ratio hot path: one view per distinct name, reused
    * across all its pairs). */
  final class TokenView(val s: String) {
    val sortedDistinct: Array[String] = {
      val t = pySplit(s)
      java.util.Arrays.sort(t, java.util.Comparator.naturalOrder[String]())
      // in-place unique
      var w = 0
      var i = 0
      while (i < t.length) {
        if (w == 0 || t(w - 1) != t(i)) { t(w) = t(i); w += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(t, w)
    }
  }
  private val viewMask = (1 << 18) - 1
  @transient private lazy val viewCache = new Array[TokenView](viewMask + 1)
  def tokenView(s: String): TokenView = {
    val slot = s.hashCode & viewMask
    val v = viewCache(slot)
    if (v != null && v.s == s) return v
    val nv = new TokenView(s)
    viewCache(slot) = nv
    nv
  }

  // UTF8String-keyed front cache for the prefilter expression (skips
  // per-row UTF8String→String conversion; stored key cloned because
  // inputs may alias reused row buffers)
  private final class U8View(val key: org.apache.spark.unsafe.types.UTF8String,
      val view: TokenView)
  @transient private lazy val u8Views = new Array[U8View](viewMask + 1)
  def tokenViewUtf8(u: org.apache.spark.unsafe.types.UTF8String): TokenView = {
    val slot = u.hashCode & viewMask
    val e = u8Views(slot)
    if (e != null && e.key.equals(u)) return e.view
    val v = tokenView(u.toString)
    u8Views(slot) = new U8View(u.clone(), v)
    v
  }

  /** token_set_ratio over UTF8String columns (expression hot path). */
  def tokenSetRatioUtf8(u1: org.apache.spark.unsafe.types.UTF8String,
      u2: org.apache.spark.unsafe.types.UTF8String): Double =
    tokenSetRatioViews(tokenViewUtf8(u1), tokenViewUtf8(u2))

  /** Decision-only `token_set_ratio > cutoff` with bound-based
    * short-circuit: the two subset comparisons (r1, r2) are O(1) given
    * merged lengths, and the Indel comparison is bounded above by
    * assuming the minimal distance |abLen−baLen| — the O(n·m) DP runs
    * only when the bounds straddle the cutoff. Decision-identical to
    * `tokenSetRatio(s1, s2) > cutoff` (asserted in FuzzSpec). */
  def tokenSetRatioGtUtf8(u1: org.apache.spark.unsafe.types.UTF8String,
      u2: org.apache.spark.unsafe.types.UTF8String, cutoff: Double): Boolean = {
    val a = tokenViewUtf8(u1).sortedDistinct
    val b = tokenViewUtf8(u2).sortedDistinct
    if (a.length == 0 || b.length == 0) return 0.0 > cutoff
    // merged lengths without building strings
    var sectLen = 0
    var sectCount = 0
    var abLen = 0
    var abCount = 0
    var baLen = 0
    var baCount = 0
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val cmp = a(i).compareTo(b(j))
      if (cmp == 0) { sectLen += a(i).length; sectCount += 1; i += 1; j += 1 }
      else if (cmp < 0) { abLen += a(i).length; abCount += 1; i += 1 }
      else { baLen += b(j).length; baCount += 1; j += 1 }
    }
    while (i < a.length) { abLen += a(i).length; abCount += 1; i += 1 }
    while (j < b.length) { baLen += b(j).length; baCount += 1; j += 1 }
    if (sectCount > 0 && (abCount == 0 || baCount == 0)) return 100.0 > cutoff
    if (abCount > 1) abLen += abCount - 1
    if (baCount > 1) baLen += baCount - 1
    if (sectCount > 1) sectLen += sectCount - 1
    val sd = if (sectLen > 0) 1 else 0
    val sectAbLen = sectLen + sd + abLen
    val sectBaLen = sectLen + sd + baLen
    val d1 = sectLen + sectAbLen
    val r1 = if (d1 > 0) 100.0 * (1.0 - (sd + abLen).toDouble / d1) else 100.0
    val d2 = sectLen + sectBaLen
    val r2 = if (d2 > 0) 100.0 * (1.0 - (sd + baLen).toDouble / d2) else 100.0
    if (math.max(r1, r2) > cutoff) return true
    val denom0 = sectAbLen + sectBaLen
    if (denom0 <= 0) return 100.0 > cutoff
    // upper bound: dist ≥ |abLen − baLen|
    val upper = 100.0 * (1.0 - math.abs(abLen - baLen).toDouble / denom0)
    if (upper <= cutoff) return false
    tokenSetRatioViews(tokenViewUtf8(u1), tokenViewUtf8(u2)) > cutoff
  }

  private val sbA = new ThreadLocal[java.lang.StringBuilder] {
    override def initialValue() = new java.lang.StringBuilder(64)
  }
  private val sbB = new ThreadLocal[java.lang.StringBuilder] {
    override def initialValue() = new java.lang.StringBuilder(64)
  }

  /** fuzz.token_set_ratio — max of the three SeatGeek comparisons,
    * computed via the rapidfuzz distance formulas over a sorted-merge
    * of the cached per-name token views (zero steady-state
    * allocation). */
  def tokenSetRatio(s1: String, s2: String): Double =
    tokenSetRatioViews(tokenView(s1), tokenView(s2))

  def tokenSetRatioViews(v1: TokenView, v2: TokenView): Double = {
    val a = v1.sortedDistinct
    val b = v2.sortedDistinct
    if (a.length == 0 || b.length == 0) return 0.0
    val ab = sbA.get(); ab.setLength(0)
    val ba = sbB.get(); ba.setLength(0)
    var sectLen = 0
    var sectCount = 0
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val cmp = a(i).compareTo(b(j))
      if (cmp == 0) { sectLen += a(i).length; sectCount += 1; i += 1; j += 1 }
      else if (cmp < 0) { if (ab.length > 0) ab.append(' '); ab.append(a(i)); i += 1 }
      else { if (ba.length > 0) ba.append(' '); ba.append(b(j)); j += 1 }
    }
    while (i < a.length) { if (ab.length > 0) ab.append(' '); ab.append(a(i)); i += 1 }
    while (j < b.length) { if (ba.length > 0) ba.append(' '); ba.append(b(j)); j += 1 }
    if (sectCount > 0 && (ab.length == 0 || ba.length == 0)) return 100.0
    if (sectCount > 1) sectLen += sectCount - 1 // join spaces
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

  /** Python `a[:k] == b[:k]` without allocation. */
  def prefixEq(a: String, b: String, k: Int): Boolean = {
    val la = math.min(k, a.length)
    val lb = math.min(k, b.length)
    la == lb && a.regionMatches(0, b, 0, la)
  }

  /** Python `a[-k:] == b[-k:]` without allocation. */
  def suffixEq(a: String, b: String, k: Int): Boolean = {
    val la = math.min(k, a.length)
    val lb = math.min(k, b.length)
    la == lb && a.regionMatches(a.length - la, b, b.length - lb, la)
  }

  /** Jaro similarity (rapidfuzz definition). */
  def jaro(s1: CharSequence, s2: CharSequence): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    var fb = flagBuf.get()
    if (fb.length < l1 + l2) {
      fb = new Array[Boolean](math.max(l1 + l2, fb.length * 2)); flagBuf.set(fb)
    }
    java.util.Arrays.fill(fb, 0, l1 + l2, false)
    val m1 = fb // slots [0, l1)
    val off = l1 // m2 = slots [l1, l1+l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!fb(off + j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; fb(off + j) = true; matches += 1; done = true
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
        while (!fb(off + k)) k += 1
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
