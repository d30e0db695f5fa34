package graft.score

import graft.text.{AbbrTables, Dictionaries}

/** Precomputed single-name facts consumed by the match cascade. Every
  * field is a pure function of the name, derived exactly as the
  * reference derives it inline (matcher.py:139-366) — hoisting them
  * here changes cost, not semantics (CascadeSpec's 1000+ golden codes
  * prove it).
  *
  * At millions of pairs per executor each distinct name participates
  * in many pairs, so these are memoized in a per-JVM direct-mapped
  * cache (races benign: pure function, atomic reference writes).
  */
final class NameAnalysis(val name: String) {
  private val suffix = AbbrTables.suffix
  private val eng = Dictionaries.eng
  private val commonAbbr = Dictionaries.commonAbbr

  val tokens: Array[String] = Fuzz.pySplit(name)
  val tokIsSuffix: Array[Boolean] = tokens.map(suffix.contains)
  val tokIsEng: Array[Boolean] = tokens.map(eng.contains)

  /** " ".join(sorted(tokens)) — token_sort_ratio's canonical form. */
  val sortJoined: String = {
    val t = java.util.Arrays.copyOf(tokens, tokens.length)
    java.util.Arrays.sort(t, java.util.Comparator.naturalOrder[String]())
    t.mkString(" ")
  }

  val noSpace: String = name.replace(" ", "")

  /** remove_suffix form (c/d in the cascade). */
  val c: String = Dictionaries.removeSuffix(name)
  val cTokens: Array[String] = Fuzz.pySplit(c)
  val cSortedChars: String = Fuzz.sortedChars(c)
  val cSortJoined: String = {
    val t = java.util.Arrays.copyOf(cTokens, cTokens.length)
    java.util.Arrays.sort(t, java.util.Comparator.naturalOrder[String]())
    t.mkString(" ")
  }

  val hasLoc: Boolean = Dictionaries.hasLocation(name)
  val hasMatchit: Boolean = name.contains("matchit")

  /** a.split("matchit")[0].split()[-1]; null when the Python code
    * would raise IndexError (caught at matcher.py:145-146). */
  val matchitLast: String =
    if (!hasMatchit) null
    else {
      val pre = Fuzz.pySplit(name.substring(0, name.indexOf("matchit")))
      if (pre.isEmpty) null else pre(pre.length - 1)
    }

  /** distinct tokens, first-occurrence order (set semantics). */
  val tokDistinct: Array[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    tokens.foreach(seen.add)
    seen.toArray(new Array[String](seen.size))
  }

  /** set(tokens) - suffix */
  val nonSuffixDistinct: Array[String] = tokDistinct.filterNot(suffix.contains)

  /** `not (set(tokens) - suffix - na)` (matcher.py:155-157) */
  val onlySuffixNa: Boolean = nonSuffixDistinct.forall(MatchCascade.naSet.contains)

  /** distinct c-tokens not in common_abbr (for the "all tokens
    * explained" check, matcher.py:252-254). */
  val cToksNotAbbr: Array[String] = {
    val seen = new java.util.LinkedHashSet[String]()
    cTokens.foreach(seen.add)
    seen.toArray(new Array[String](seen.size)).filterNot(commonAbbr.contains)
  }

  /** set(tokens) - common_abbr - suffix (matcher.py:358). */
  val remainingNonAbbrSuffix: Array[String] =
    tokDistinct.filterNot(t => commonAbbr.contains(t) || suffix.contains(t))

  val first2Joined: String =
    if (tokens.length >= 2) tokens(0) + " " + tokens(1) else null
  val first2InEng: Boolean = first2Joined != null && eng.contains(first2Joined)
  val first3InEng: Boolean =
    tokens.length >= 3 && eng.contains(tokens(0) + " " + tokens(1) + " " + tokens(2))

  val banHit: Boolean = MatchCascade.banListSeq.exists(name.contains)

  /** first occurrence index (1-based) of token — pos_y semantics. */
  def posFirst(tok: String): Int = {
    var i = 0
    while (i < tokens.length) {
      if (tokens(i) == tok) return i + 1
      i += 1
    }
    0
  }

  /** last occurrence index (1-based) — pos_x semantics. */
  def posLast(tok: String): Int = {
    var i = tokens.length - 1
    while (i >= 0) {
      if (tokens(i) == tok) return i + 1
      i -= 1
    }
    0
  }
}

object NameAnalysis {
  private val mask = (1 << 18) - 1
  @transient private lazy val vals = new Array[NameAnalysis](mask + 1)

  // self-validating slot (v.name is final ⇒ safely published; a stale
  // read just recomputes)
  def of(name: String): NameAnalysis = {
    val slot = name.hashCode & mask
    val v = vals(slot)
    if (v != null && v.name == name) return v
    val nv = new NameAnalysis(name)
    vals(slot) = nv
    nv
  }

  // UTF8String-keyed front cache: lets the Catalyst expressions skip
  // the per-row UTF8String→String conversion entirely in steady state.
  // The stored key is CLONED — incoming UTF8Strings may alias reused
  // row buffers.
  private final class U8Entry(
      val key: org.apache.spark.unsafe.types.UTF8String,
      val analysis: NameAnalysis)
  @transient private lazy val u8Vals = new Array[U8Entry](mask + 1)

  def ofUtf8(u: org.apache.spark.unsafe.types.UTF8String): NameAnalysis = {
    val slot = u.hashCode & mask
    val e = u8Vals(slot)
    if (e != null && e.key.equals(u)) return e.analysis
    val a = of(u.toString)
    u8Vals(slot) = new U8Entry(u.clone(), a)
    a
  }
}
