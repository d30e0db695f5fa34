package graft.block

import org.apache.commons.codec.language.{DoubleMetaphone, Soundex}

import graft.score.Fuzz
import graft.text.AbbrTables

/** Blocking-key generation for candidate pairing (north-star tier:
  * Double Metaphone + Soundex of the first informative token, a
  * token-sorted key, and character-3-gram MinHash band signatures).
  *
  * The reference generates candidates by full cross product with a
  * cheap prefilter (matcher.py:381-396) — O(N·M) and unusable at
  * 10^12 scale. These keys replace it with equi-join blocking whose
  * candidate set is a superset of the reference's accepted pairs on
  * the eval corpus (asserted in BlockingSpec), so pairwise decisions
  * inside a block are unchanged.
  *
  * All keys are deterministic (fixed hash seeds; no Random), so blocks
  * are reproducible across runs/executors — required for the lineage/
  * resume story.
  */
object BlockingKeys extends Serializable {

  // 8 bands × 3 rows: a typo'd-pair shingle Jaccard of ~0.6 collides
  // with p ≈ 1−(1−0.216)^8 ≈ 0.86 on the minhash tier ALONE — and the
  // phonetic/prefix/token-sort keys cover the same pairs from a second
  // angle (the golden-accepted recall spec measures the union at 100%).
  // The earlier 12 × 2 banding had r = 2, which admits J ≈ 0.3
  // non-pairs with p ≈ 0.68: at sf0.1 that made minhash bands the top
  // ~280 hot keys (500–5000 members each, ~69M raw pairs that the
  // prefilter then rejected); r = 3 cuts that collision mass ~10×
  // while the accepted pairs stay reachable.
  val DefaultNumHashes = 24
  val DefaultBands = 8

  // stop tokens never used as the "informative" anchor (suffix ∪ na,
  // matcher.py:122-136)
  private val stop: Set[String] = AbbrTables.suffix ++
    Set("north", "america", "great", "global", "international",
      "worldwide", "national", "and", "of", "for", "holdings", "holding",
      "group", "enterprises")

  private val dmetaphone = new ThreadLocal[DoubleMetaphone] {
    override def initialValue(): DoubleMetaphone = {
      val d = new DoubleMetaphone
      d.setMaxCodeLen(6)
      d
    }
  }
  private val soundexCodec = new Soundex()

  def doubleMetaphone(s: String): String = {
    val r = dmetaphone.get().doubleMetaphone(s)
    if (r == null) "" else r
  }

  def soundex(s: String): String =
    try {
      val r = soundexCodec.encode(s.filter(c => Character.isLetter(c)))
      if (r == null) "" else r
    } catch { case _: IllegalArgumentException => "" }

  /** First token not in the stop set; falls back to the first token. */
  def firstInformativeToken(name: String): String = {
    val toks = Fuzz.pySplit(name)
    if (toks.isEmpty) return ""
    var i = 0
    while (i < toks.length) {
      if (!stop.contains(toks(i))) return toks(i)
      i += 1
    }
    toks(0)
  }

  /** Sorted non-stop tokens joined — exact key for permuted names. */
  def tokenSortKey(name: String): String = {
    val toks = Fuzz.pySplit(name).filterNot(stop.contains)
    java.util.Arrays.sort(toks, java.util.Comparator.naturalOrder[String]())
    toks.mkString(" ")
  }

  // ---- deterministic MinHash over char 3-gram shingles ----

  /** 64-bit mix (splitmix64 finalizer) — stable across JVMs. */
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def shingleHashes(s0: String): Array[Long] = {
    val s = s0.replace(" ", "")
    if (s.length < 3) return Array(mix64(s.hashCode.toLong & 0xffffffffL))
    val out = new Array[Long](s.length - 2)
    var i = 0
    while (i < s.length - 2) {
      var h = 1125899906842597L
      var j = i
      while (j < i + 3) { h = 31 * h + s.charAt(j); j += 1 }
      out(i) = mix64(h)
      i += 1
    }
    out
  }

  /** MinHash signature banded into `bands` groups of `numHashes/bands`
    * rows; each band renders as "b:<band>:<hex>". Identical band ⇒
    * candidate pair (standard LSH banding). */
  def minhashBands(name: String, numHashes: Int = DefaultNumHashes,
      bands: Int = DefaultBands): Array[String] = {
    val shingles = shingleHashes(name)
    if (shingles.isEmpty) return Array.empty
    val sig = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      val seed = mix64(0x9e3779b97f4a7c15L * (h + 1))
      var mn = Long.MaxValue
      var i = 0
      while (i < shingles.length) {
        val v = mix64(shingles(i) ^ seed)
        if (v < mn) mn = v
        i += 1
      }
      sig(h) = mn
      h += 1
    }
    val rows = numHashes / bands
    val out = new Array[String](bands)
    var b = 0
    while (b < bands) {
      var acc = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        acc = mix64(acc ^ sig(b * rows + r))
        r += 1
      }
      out(b) = "b" + b + ":" + java.lang.Long.toHexString(acc)
      b += 1
    }
    out
  }

  /** Full key set for a normalized name. */
  def keys(name: String, numHashes: Int = DefaultNumHashes,
      bands: Int = DefaultBands): Array[String] = {
    if (name.isEmpty) return Array.empty
    val ft = firstInformativeToken(name)
    val buf = new scala.collection.mutable.ArrayBuffer[String](bands + 3)
    if (ft.nonEmpty) {
      val dm = doubleMetaphone(ft)
      if (dm.nonEmpty) buf += ("dm:" + dm)
      val sx = soundex(ft)
      if (sx.nonEmpty) buf += ("sx:" + sx)
      // prefix key catches consonant-skeleton typos phonetics miss
      // ("syntex"/"syntrex"); coarse buckets are bounded by the
      // block-size cap, not by the key itself
      buf += ("p4:" + ft.substring(0, math.min(4, ft.length)))
    }
    val ts = tokenSortKey(name)
    if (ts.nonEmpty) buf += ("ts:" + ts)
    buf ++= minhashBands(name, numHashes, bands).map("mh:" + _)
    buf.distinct.toArray
  }
}
