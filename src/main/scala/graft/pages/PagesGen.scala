package graft.pages

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic Common-Crawl-style `pages` table in the
  * driver-mandated shape (BASELINE.json input_hint):
  * (url string, warc_ts timestamp, html binary, text string,
  * lang string).
  *
  * Every row is a pure function of its index (per-row seeded PRNG), so
  * the table is identical regardless of partitioning, executor count,
  * or scale factor — the basis of the byte-identical-extracted-text
  * invariant and of reproducible benchmarks. Each page carries one
  * company-name mention (a per-entity variant: suffix swap, typo,
  * token permutation, abbreviation …), so ground-truth clusters are
  * known (entity id) and the matcher has realistic work.
  */
object PagesGen {

  private val adjectives = Array("acme", "global", "advanced", "united",
    "pacific", "northern", "premier", "dynamic", "pioneer", "sterling",
    "summit", "liberty", "crescent", "atlas", "meridian", "cascade",
    "granite", "horizon", "beacon", "vanguard", "crystal", "phoenix",
    "evergreen", "falcon", "monarch", "sapphire", "titan", "aurora",
    "redwood", "ironwood", "silverline", "bluepeak", "stonebridge",
    "clearwater", "goldleaf", "brightstar")

  private val nouns = Array("systems", "industries", "technologies",
    "holdings", "dynamics", "materials", "networks", "laboratories",
    "energy", "robotics", "logistics", "instruments", "semiconductors",
    "analytics", "biosciences", "aerospace", "chemicals", "textiles",
    "plastics", "foods", "breweries", "motors", "railways", "telecom",
    "pharmaceuticals", "optics", "marine", "mining", "forestry", "media")

  private val legalForms = Array("Inc.", "Corporation", "Corp", "Co.",
    "LLC", "Ltd.", "Limited", "Company", "GmbH", "S.A.", "AG", "Co., Ltd.")

  private val langs = Array("en", "en", "en", "en", "en", "en", "en",
    "en", "de", "ja")

  /** Base (canonical) name of entity e — deterministic AND injective:
    * e maps bijectively onto (adjective, noun, optional 2nd noun)
    * combos via a fixed odd multiplier coprime to the combo count, so
    * two entities never share a base name (ground-truth clusters stay
    * exact); beyond the combo space a numeric district token keeps
    * names unique. */
  def entityBaseName(e: Long): String = {
    val nCombos = adjectives.length.toLong * nouns.length * (nouns.length + 1) // 36·30·31
    val idx = (e % nCombos) * 7919L % nCombos
    val gen = e / nCombos
    val adj = adjectives((idx % adjectives.length).toInt)
    val rest = idx / adjectives.length
    val noun1 = nouns((rest % nouns.length).toInt)
    val second = (rest / nouns.length).toInt // 0 = none, else noun index+1
    val sb = new StringBuilder(adj.capitalize)
    sb += ' '
    sb ++= noun1.capitalize
    if (second > 0) { sb += ' '; sb ++= nouns(second - 1).capitalize }
    if (gen > 0) { sb ++= " District "; sb ++= gen.toString }
    sb.toString
  }

  private val syllables = Array("ba", "cor", "dan", "fel", "gor", "hul",
    "jin", "kel", "lor", "mar", "nex", "pol", "quor", "rin", "sol",
    "tarn", "ul", "vex", "wor", "zan")

  /** Coined (injective, pronounceable) base name: the entity id in
    * base-20 syllables + a sector noun. Mirrors real company-name
    * statistics better than the small-vocabulary combos of
    * [[entityBaseName]]: FIRST tokens are globally distinctive, which
    * is the reference matcher's core assumption (rule +10,
    * matcher.py:273-275, accepts on first-token identity when the
    * token is not an English word — sound for CRSP-like data, and
    * catastrophic under a generator that reuses 36 adjectives across
    * 30k entities). Used by scale stress tests. */
  def coinedBaseName(e: Long): String = {
    // ≥4 base-20 digits, zero ("ba") padded; the syllable set has 20
    // distinct first letters ⇒ prefix-free ⇒ uniquely decodable ⇒
    // the coined token is injective in e for ALL e
    val sb = new StringBuilder
    var x = e
    var i = 0
    while (x > 0 || i < 4) {
      sb ++= syllables((x % syllables.length).toInt)
      x /= syllables.length
      i += 1
    }
    s"${sb.toString.capitalize} ${nouns((e % nouns.length).toInt).capitalize}"
  }

  private def swapChars(s: String, i: Int): String =
    if (i + 1 >= s.length) s
    else s.substring(0, i) + s.charAt(i + 1) + s.charAt(i) + s.substring(i + 2)

  /** Variant v of entity e's name — typo/suffix/permutation noise. */
  def mentionName(e: Long, v: Int, coined: Boolean = false): String = {
    val base = if (coined) coinedBaseName(e) else entityBaseName(e)
    val r = new scala.util.Random(0x5eed0002L * (e + 1) + v)
    val form = legalForms(r.nextInt(legalForms.length))
    v % 6 match {
      case 0 => s"$base ${legalForms(0)}"
      case 1 => s"$base $form"
      case 2 => s"The $base $form"
      case 3 => // adjacent-char typo in the longest word
        val toks = base.split(' ')
        val li = toks.indices.maxBy(i => toks(i).length)
        if (toks(li).length >= 6) {
          toks(li) = swapChars(toks(li), 2 + r.nextInt(toks(li).length - 4))
          s"${toks.mkString(" ")} $form"
        } else s"$base $form"
      case 4 => // token permutation (legal form first)
        val toks = base.split(' ')
        s"${toks.reverse.mkString(" ")} $form"
      case _ => s"${base.toUpperCase(java.util.Locale.ROOT)} $form"
    }
  }

  private val paraDe = "Unternehmensprofil und Geschäftsbericht für "
  private val paraJa = "会社概要および事業報告: "

  def htmlFor(e: Long, v: Int, lang: String, coined: Boolean = false): String = {
    val name = mentionName(e, v, coined)
    val para = lang match {
      case "de" => paraDe + name
      case "ja" => paraJa + name
      case _ => s"Corporate profile and annual report for $name"
    }
    s"""<html><head><title>Profile $e-$v</title></head>
       |<body><h1>Record $e/$v</h1>
       |<p>Company: $name</p>
       |<p>$para</p>
       |<p>Crawl batch ${e % 97}</p></body></html>""".stripMargin
  }

  /** Row builder for [[generate]] as a CASE CLASS, not an anonymous
    * closure: Catalyst compares `MapElements.func` by object equality
    * when deciding whether two plans are the same (`sameResult`), and
    * an anonymous closure is a fresh, never-equal instance per call —
    * so every separately-constructed pages subtree defeated the
    * CacheManager and re-ran the whole pages→extract→normalize chain
    * per query (measured: a second `normalize(extractMentions(pagesFor))`
    * plan reported usesCache=false and recomputed). Structural equality
    * here restores the documented one-cache-entry-per-identical-plan
    * behavior. Output rows are byte-identical to the old closure. */
  private final case class PageRowFn(mpe: Int, coined: Boolean)
      extends (java.lang.Long => (String, Timestamp, Array[Byte], String, String))
      with Serializable {
    override def apply(i0: java.lang.Long): (String, Timestamp, Array[Byte], String, String) = {
      val i = i0.longValue()
      val e = i / mpe
      val v = (i % mpe).toInt
      val lang = langs(((e * 31 + v) % langs.length).toInt)
      val html = htmlFor(e, v, lang, coined)
      val bytes = html.getBytes(StandardCharsets.UTF_8)
      val text = Extract.extractText(bytes)
      val ts = new Timestamp(1609459200000L + i * 1000L) // 2021-01-01 + i sec
      (s"https://host$e-$v.example/profile", ts, bytes, text, lang)
    }
  }

  /** Deterministic pages DataFrame: nEntities × mentionsPerEntity rows. */
  def generate(spark: SparkSession, nEntities: Long, mentionsPerEntity: Int,
      partitions: Int = 32, coined: Boolean = false): DataFrame = {
    import spark.implicits._
    spark.range(0, nEntities * mentionsPerEntity, 1, partitions)
      .map(PageRowFn(mentionsPerEntity, coined))
      .toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** Ground-truth entity id for a page url (test oracle). */
  def entityOf(url: String): Long =
    url.stripPrefix("https://host").takeWhile(_ != '-').toLong

  /** Deterministic "base universe" name list — the analog of the
    * reference's stocknames.csv (README.md:19-26): one canonical name
    * per entity, formal legal form. Ids are the small entity indices,
    * disjoint from the xxhash64 mention-id space the two-sided matcher
    * joins against. */
  /** Same case-class-function idiom as [[PageRowFn]] (plan equality /
    * CacheManager dedupe across separately-constructed invocations). */
  private final case class BaseRowFn(coined: Boolean)
      extends (java.lang.Long => (Long, String)) with Serializable {
    override def apply(e0: java.lang.Long): (Long, String) = {
      val e = e0.longValue()
      (e, (if (coined) coinedBaseName(e) else entityBaseName(e)) + " Inc.")
    }
  }

  def baseUniverse(spark: SparkSession, nEntities: Long,
      coined: Boolean = false): DataFrame = {
    import spark.implicits._
    spark.range(0, nEntities, 1, 8)
      .map(BaseRowFn(coined))
      .toDF("id", "name")
  }
}
