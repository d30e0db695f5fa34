package graft.text

import java.util.Locale
import java.util.regex.Pattern

/** Company-name normalization with the exact semantics of the
  * reference's `name_preprocessing` (/root/reference/utils/_name_pre.py:20-79)
  * and `remove_suffix` (matcher.py:59-63).
  *
  * Deliberately-preserved reference quirks (SURVEY.md §8 R3):
  *  - `(?=\w+)our\b` → "or" also rewrites the standalone word "our";
  *    `(?=\w+)er\b` → "ers" and `tt\b` → "t" likewise act on standalone
  *    words;
  *  - `\b[a-z]\.(?!\w)\b` can never match (the trailing \b after a
  *    non-word "." with a non-word follower is unsatisfiable) — kept
  *    for fidelity, it is a no-op;
  *  - the roman-numeral loop (_name_pre.py:50-66) `continue`s every
  *    entry and is omitted as a verified no-op;
  *  - the single-letter merge (_name_pre.py:44-47) concatenates ALL
  *    single-letter matches, even discontiguous ones, and then does a
  *    literal replace of that concatenation — discontiguous runs
  *    therefore do not merge, exactly as in the reference.
  */
object Normalizer extends Serializable {

  private val U = Pattern.UNICODE_CHARACTER_CLASS

  private val reOur = Pattern.compile("""(?=\w+)our\b""", U)
  private val reOldNew = Pattern.compile("""old$|new$""", U)
  private val reTt = Pattern.compile("""(?=\w+)tt\b""", U)
  private val reEr = Pattern.compile("""(?=\w+)er\b""", U)
  private val reCoInc = Pattern.compile("""\bco\.? inc\b""", U)
  private val reCoLtd = Pattern.compile("""\bco\.? ltd\b""", U)
  private val reThe = Pattern.compile("""\bthe\b""", U)
  private val reLetterDot = Pattern.compile("""\b[a-z]\.(?!\w)\b""", U)
  private val reJr = Pattern.compile("""\bjr\.\b""", U)
  private val reSr = Pattern.compile("""\bsr\.\b""", U)
  private val reWord = Pattern.compile("""[\w\d]+""", U)
  private val reSingle = Pattern.compile("""\b\w\s\b""", U)
  private val reW = Pattern.compile("""\w+""", U)

  private def findAll(p: Pattern, s: String): Vector[String] = {
    val m = p.matcher(s)
    val out = Vector.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** Python `s.split(sep)[0]`. */
  private def beforeFirst(s: String, sep: String): String = {
    val i = s.indexOf(sep)
    if (i < 0) s else s.substring(0, i)
  }

  /** Python `s.split(sep)[-1]`. */
  private def afterLast(s: String, sep: String): String = {
    val i = s.lastIndexOf(sep)
    if (i < 0) s else s.substring(i + sep.length)
  }

  /** `name_preprocessing(z, remove_people)`. Returns null when the
    * person-name veto fires (_name_pre.py:68-78). */
  def namePreprocessing(z0: String, removePeople: Boolean = true): String = {
    var z = z0.toLowerCase(Locale.ROOT).replace("'", "")
    z = z.replace("-redh", "").replace("-old", "").replace("-new", "")
    z = beforeFirst(z, "-pre")
    z = beforeFirst(z, "-adr")
    z = afterLast(z, "division of")
    z = afterLast(z, "known as")
    z = beforeFirst(z, "-consolidated")
    z = reOur.matcher(z).replaceAll("or")
    z = reOldNew.matcher(z).replaceAll("")
    z = reTt.matcher(z).replaceAll("t")
    z = reEr.matcher(z).replaceAll("ers")
    z = z.replace("`", "").replace("& company", "").replace("& companies", "")
    z = reCoInc.matcher(z).replaceAll("inc")
    z = reCoLtd.matcher(z).replaceAll("inc")
    z = reThe.matcher(z).replaceAll("")
    z = reLetterDot.matcher(z).replaceAll("")
    z = reJr.matcher(z).replaceAll("")
    z = reSr.matcher(z).replaceAll("")
    z = findAll(reWord, z).mkString(" ")
    // single-letter merge (_name_pre.py:44-47)
    val a = findAll(reSingle, z).mkString("")
    if (a.nonEmpty) {
      val b = a.replace(" ", "")
      z = z.replace(a, b + " ")
    }
    // roman-numeral loop omitted: verified no-op (_name_pre.py:50-66)
    z = Rewrite.abbrAdj(z)
    if (removePeople) {
      val ws = findAll(reW, z)
      var counter = 0
      if (ws.length > 1) {
        ws.foreach { w =>
          if (w.length > 1 && Dictionaries.personNames.contains(w)) counter += 1
        }
      }
      val wsSet = ws.toSet
      if ((AbbrTables.abbrTargets & wsSet).isEmpty) {
        val denom = (wsSet - "matchit").size
        if (counter >= 2 && denom > 0 && counter.toDouble / denom >= 0.6)
          return null
      }
    }
    z.strip().toLowerCase(Locale.ROOT)
  }

  /** matcher.py:59-63 — strips suffix tokens; intentionally does NOT
    * collapse the doubled spaces it leaves behind. */
  def removeSuffix(name: String): String = Dictionaries.removeSuffix(name)

  /** postproc-ppl.py:4-24 — person detector used by the post filter:
    * `First M. Last` shape on the RAW name, or every `[\w\d]+` token
    * (lowercased) being a first/surname. An empty token list is
    * vacuously a person, as in the reference. */
  private val rePerson = Pattern.compile("""^\w{4,} \w\. \w{4,}$""", U)
  def isPerson(name: String): Boolean = {
    if (rePerson.matcher(name).find()) return true
    val toks = findAll(reWord, name)
    toks.forall { t =>
      val l = t.toLowerCase(Locale.ROOT)
      Dictionaries.firstNames.contains(l) || Dictionaries.surNames.contains(l)
    }
  }
}
