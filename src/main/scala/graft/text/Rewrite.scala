package graft.text

import java.util.Locale
import java.util.regex.{Matcher, Pattern}

/** Ordered regex rewrite engine with the exact semantics of the
  * reference's `_abbr_adj` (/root/reference/utils/_abbr.py:5-28):
  *
  *  - rules applied strictly in list order;
  *  - a pattern containing `"(?"` is used as-is with a trailing
  *    `(?!\w)`; any other pattern is wrapped `(?<!\w)…(?!\w)`;
  *  - matching is case-insensitive and Unicode-aware (Python `re`
  *    defaults → Java `CASE_INSENSITIVE | UNICODE_CASE |
  *    UNICODE_CHARACTER_CLASS`);
  *  - the replacement is a space plus the target, then one
  *    left-to-right pass collapsing `"  "` → `" "` and a strip;
  *  - a non-blank target is de-doubled once per rule
  *    (`\btarget\s+target\b` → target, case-SENSITIVE, _abbr.py:24-27);
  *  - final collapse + strip + lowercase (_abbr.py:28).
  */
final class Rewrite(rules: Seq[(String, String)]) extends Serializable {

  private val FLAGS =
    Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS

  private final case class Compiled(
      pattern: Pattern,
      replacement: String, // " " + target, already quoted for appendReplacement
      collapse: Pattern,   // null when target is blank
      collapseRepl: String)

  @transient private lazy val compiled: Array[Compiled] = rules.map { case (pat, target) =>
    val p =
      if (pat.contains("(?")) Pattern.compile(pat + """(?!\w)""", FLAGS)
      else Pattern.compile("""(?<!\w)""" + pat + """(?!\w)""", FLAGS)
    val collapse =
      if (target.strip().nonEmpty)
        Pattern.compile("""\b""" + target + """\s+""" + target + """\b""")
      else null
    Compiled(p, Matcher.quoteReplacement(" " + target), collapse,
      if (collapse != null) Matcher.quoteReplacement(target) else null)
  }.toArray

  def apply(name0: String): String = {
    var name = name0
    var i = 0
    while (i < compiled.length) {
      val r = compiled(i)
      name = r.pattern.matcher(name).replaceAll(r.replacement)
        .replace("  ", " ").strip()
      if (r.collapse != null)
        name = r.collapse.matcher(name).replaceAll(r.collapseRepl)
      i += 1
    }
    name.replace("  ", " ").strip().toLowerCase(Locale.ROOT)
  }
}

object Rewrite {
  /** abbr_adj = hardcode + abbr1 + abbr2 (_abbr.py:333). */
  lazy val abbrAdj: Rewrite =
    new Rewrite(AbbrTables.hardcode ++ AbbrTables.abbr)
}
