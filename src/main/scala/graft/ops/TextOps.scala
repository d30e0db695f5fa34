package graft.ops

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis operators for large-scale training-data pipelines:
  * language id (stopword/char-class heuristic), quality scoring,
  * token counting (whitespace + BPE-ish word-piece regex), rolling-hash
  * document fingerprinting, and DuckDB-compatible character-set
  * Jaccard. Scalar cores are static methods so the expressions stay
  * codegen-friendly.
  */
object TextOps {

  // --- language id ---
  private val enStop = Set("the", "and", "of", "to", "in", "is", "for",
    "with", "that", "was", "are", "this", "from", "report", "profile")
  private val deStop = Set("der", "die", "das", "und", "für", "mit",
    "ist", "von", "ein", "eine", "nicht", "geschäftsbericht",
    "unternehmensprofil")
  private val frStop = Set("le", "la", "les", "et", "de", "des", "un",
    "une", "pour", "dans", "est", "que")
  private val esStop = Set("el", "la", "los", "las", "de", "del",
    "para", "con", "una", "por", "es")

  def langId(text0: String): String = {
    if (text0 == null || text0.isEmpty) return "und"
    val text = text0.toLowerCase(Locale.ROOT)
    var cjk = 0; var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
            b == Character.UnicodeScript.KATAKANA) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk.toDouble / total > 0.05) return "ja"
    val toks = graft.score.Fuzz.pySplit(text)
    var en = 0; var de = 0; var fr = 0; var es = 0
    toks.foreach { t =>
      if (enStop(t)) en += 1
      if (deStop(t)) de += 1
      if (frStop(t)) fr += 1
      if (esStop(t)) es += 1
    }
    val best = math.max(math.max(en, de), math.max(fr, es))
    if (best == 0) "und"
    else if (best == en) "en"
    else if (best == de) "de"
    else if (best == fr) "fr"
    else "es"
  }

  /** BPE-ish token estimate: word pieces of ≤4 chars (rough subword
    * count: ceil(len/4) per word) + punctuation tokens. */
  def tokenEstimate(text: String): Int = {
    if (text == null) return 0
    var tokens = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) {
        var j = i
        while (j < n && Character.isLetterOrDigit(text.charAt(j))) j += 1
        tokens += (j - i + 3) / 4
        i = j
      } else {
        if (!Character.isWhitespace(c)) tokens += 1
        i += 1
      }
    }
    tokens
  }

  /** Polynomial rolling hash (deterministic 64-bit document
    * fingerprint; same role as content md5 but cheap + streaming). */
  def rollingFingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 1469598103934665603L
    var i = 0
    while (i < text.length) {
      h = (h ^ text.charAt(i)) * 1099511628211L
      i += 1
    }
    h
  }

  /** SimHash64 over word tokens (near-dup signature). */
  def simHash64(text: String): Long = {
    val toks = graft.score.Fuzz.pySplit(
      if (text == null) "" else text.toLowerCase(Locale.ROOT))
    if (toks.isEmpty) return 0L
    val acc = new Array[Int](64)
    toks.foreach { t =>
      var h = 1125899906842597L
      var i = 0
      while (i < t.length) { h = 31 * h + t.charAt(i); i += 1 }
      h = graft.ops.TextOps.mix64(h)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** DuckDB-compatible character-set Jaccard (distinct chars). */
  def charJaccard(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = new java.util.HashSet[Character]()
    val sb = new java.util.HashSet[Character]()
    a.foreach(c => sa.add(c))
    b.foreach(c => sb.add(c))
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Word n-gram (shingle) set Jaccard. */
  def wordNgramJaccard(a: String, b: String, n: Int): Double = {
    def shingles(s: String): Set[String] = {
      val t = graft.score.Fuzz.pySplit(s.toLowerCase(Locale.ROOT))
      if (t.length < n) Set(t.mkString(" "))
      else (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" ")).toSet
    }
    val sa = shingles(a); val sb = shingles(b)
    val inter = (sa & sb).size
    val union = sa.size + sb.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  // --- expressions ---

  case class LangId(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(langId(v.toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"UTF8String.fromString(graft.ops.TextOps.langId($c.toString()))")
    override def prettyName: String = "lang_id"
    override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
  }

  case class TokenEstimate(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any = tokenEstimate(v.toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ops.TextOps.tokenEstimate($c.toString())")
    override def prettyName: String = "token_estimate"
    override protected def withNewChildInternal(c: Expression): TokenEstimate = copy(child = c)
  }

  case class SimHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = simHash64(v.toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ops.TextOps.simHash64($c.toString())")
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
  }

  case class Fingerprint(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = rollingFingerprint(v.toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.ops.TextOps.rollingFingerprint($c.toString())")
    override def prettyName: String = "fingerprint64"
    override protected def withNewChildInternal(c: Expression): Fingerprint = copy(child = c)
  }

  case class CharJaccard(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = charJaccard(a.toString, b.toString)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.ops.TextOps.charJaccard($a.toString(), $b.toString())")
    override def prettyName: String = "char_jaccard"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CharJaccard =
      copy(left = l, right = r)
  }

  case class WordNgramJaccard(left: Expression, right: Expression, n: Int)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      wordNgramJaccard(a.toString, b.toString, n)
    override def prettyName: String = "word_ngram_jaccard"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): WordNgramJaccard =
      copy(left = l, right = r)
  }

  def lang_id(c: Column): Column = GraftBridge.column(LangId(GraftBridge.expression(c)))
  def token_estimate(c: Column): Column =
    GraftBridge.column(TokenEstimate(GraftBridge.expression(c)))
  def simhash64(c: Column): Column = GraftBridge.column(SimHash(GraftBridge.expression(c)))
  def fingerprint64(c: Column): Column =
    GraftBridge.column(Fingerprint(GraftBridge.expression(c)))
  def char_jaccard(a: Column, b: Column): Column =
    GraftBridge.column(CharJaccard(GraftBridge.expression(a), GraftBridge.expression(b)))
  def word_ngram_jaccard(a: Column, b: Column, n: Int): Column =
    GraftBridge.column(WordNgramJaccard(GraftBridge.expression(a), GraftBridge.expression(b), n))

  /** Oracle-expressible quality metrics (pure length arithmetic so the
    * DuckDB oracle can reproduce them bit-for-bit). */
  def qualityColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text).cast(LongType),
    "n_spaces" -> (length(text) - length(regexp_replace(text, " ", ""))).cast(LongType),
    "n_digits" -> (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast(LongType),
    "n_words" -> (length(text) - length(regexp_replace(text, " ", "")) + lit(1)).cast(LongType)
  )
}
