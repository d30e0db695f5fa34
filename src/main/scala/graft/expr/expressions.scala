package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.block.BlockingKeys
import graft.score.{Fuzz, MatchCascade}
import graft.text.Normalizer

/** Custom Catalyst expressions for the record-linkage pipeline
  * (SURVEY.md §2.10). The hot scoring trio (token ratios, Jaro-Winkler,
  * cascade) emit a static-call `doGenCode`, so they stay inside
  * whole-stage codegen; the once-per-distinct-name expressions
  * (normalize, blocking keys) use CodegenFallback.
  */

/** name_preprocessing(col, removePeople) — null when the person veto
  * fires (_name_pre.py:68-78). */
case class NormalizeName(child: Expression, removePeople: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val s = Normalizer.namePreprocessing(v.toString, removePeople)
    if (s == null) null else UTF8String.fromString(s)
  }
  override def prettyName: String = "normalize_name"
  override protected def withNewChildInternal(c: Expression): NormalizeName = copy(child = c)
}

/** Optimizer barrier: identity passthrough REPORTED as nondeterministic
  * so Catalyst neither collapses the wrapped projection into consumers
  * nor substitutes it into pushed-down filters, nor infers it across
  * join constraints. Used around expensive once-per-distinct-row
  * expressions (the normalize cascade): without it, filter pushdown +
  * constraint inference re-evaluate the cascade once per FILTER
  * predicate per JOIN SIDE on the pre-distinct rows — ~5× the work,
  * growing with input (observed 3× slowdown of the blocking stage at
  * sf0.1). Evaluation is in fact pure, so caching/resume determinism
  * is unaffected. */
case class StableBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override def prettyName: String = "opt_barrier"
  override protected def withNewChildInternal(c: Expression): StableBarrier = copy(child = c)
}

/** remove_suffix(col) (matcher.py:59-63). */
case class RemoveSuffix(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Normalizer.removeSuffix(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.Normalizer.removeSuffix($c.toString()))")
  override def prettyName: String = "remove_suffix"
  override protected def withNewChildInternal(c: Expression): RemoveSuffix = copy(child = c)
}

/** rapidfuzz fuzz.token_set_ratio. */
case class TokenSetRatio(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Fuzz.tokenSetRatioUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.score.Fuzz.tokenSetRatioUtf8($a, $b)")
  override def prettyName: String = "token_set_ratio"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenSetRatio =
    copy(left = l, right = r)
}

/** Decision-only prefilter `token_set_ratio(a,b) > cutoff` with
  * bound-based short-circuiting (Fuzz.tokenSetRatioGtUtf8). */
case class PrefilterPass(left: Expression, right: Expression, cutoff: Double)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    Fuzz.tokenSetRatioGtUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], cutoff)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.score.Fuzz.tokenSetRatioGtUtf8($a, $b, $cutoff)")
  override def prettyName: String = "prefilter_pass"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PrefilterPass =
    copy(left = l, right = r)
}

/** rapidfuzz fuzz.token_sort_ratio. */
case class TokenSortRatio(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Fuzz.tokenSortRatio(a.toString, b.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.score.Fuzz.tokenSortRatio($a.toString(), $b.toString())")
  override def prettyName: String = "token_sort_ratio"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TokenSortRatio =
    copy(left = l, right = r)
}

/** rapidfuzz fuzz.ratio (normalized Indel similarity × 100). */
case class IndelRatio(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = Fuzz.ratio(a.toString, b.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.score.Fuzz.ratio($a.toString(), $b.toString())")
  override def prettyName: String = "indel_ratio"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IndelRatio =
    copy(left = l, right = r)
}

/** Levenshtein.jaro_winkler (prefix weight 0.1). */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Fuzz.jaroWinkler(a.toString, b.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.score.Fuzz.jaroWinkler($a.toString(), $b.toString())")
  override def prettyName: String = "jaro_winkler"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

/** match(a, b) cascade code (matcher.py:139-366); accept ⇔ > 0. */
case class MatchScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    MatchCascade.scoreUtf8(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.score.MatchCascade.scoreUtf8($a, $b)")
  override def prettyName: String = "match_score"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): MatchScore =
    copy(left = l, right = r)
}

/** Double Metaphone phonetic code (commons-codec, ships with Spark). */
case class DoubleMetaphoneExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(BlockingKeys.doubleMetaphone(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.block.BlockingKeys.doubleMetaphone($c.toString()))")
  override def prettyName: String = "double_metaphone"
  override protected def withNewChildInternal(c: Expression): DoubleMetaphoneExpr = copy(child = c)
}

/** Array of blocking keys for a normalized name (north-star tier:
  * phonetic + token-sort + char-3-gram MinHash bands). */
case class BlockingKeysExpr(child: Expression,
    numHashes: Int = BlockingKeys.DefaultNumHashes,
    bands: Int = BlockingKeys.DefaultBands)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val keys = BlockingKeys.keys(v.toString, numHashes, bands)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      keys.map(UTF8String.fromString))
  }
  override def prettyName: String = "blocking_keys"
  override protected def withNewChildInternal(c: Expression): BlockingKeysExpr = copy(child = c)
}

/** MinHash band signatures over character 3-gram shingles. */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      BlockingKeys.minhashBands(v.toString, numHashes, bands).map(UTF8String.fromString))
  override def prettyName: String = "minhash_bands"
  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** Person-name detector (postproc-ppl.py:4-24). */
case class IsPerson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = Normalizer.isPerson(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.Normalizer.isPerson($c.toString())")
  override def prettyName: String = "is_person"
  override protected def withNewChildInternal(c: Expression): IsPerson = copy(child = c)
}

/** Column-level API + SQL registration. */
object functions {
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def normalize_name(c: Column): Column = col(NormalizeName(ex(c)))
  def normalize_name(c: Column, removePeople: Boolean): Column =
    col(NormalizeName(ex(c), removePeople))
  def opt_barrier(c: Column): Column = col(StableBarrier(ex(c)))
  def remove_suffix(c: Column): Column = col(RemoveSuffix(ex(c)))
  def token_set_ratio(a: Column, b: Column): Column = col(TokenSetRatio(ex(a), ex(b)))
  def prefilter_pass(a: Column, b: Column, cutoff: Double): Column =
    col(PrefilterPass(ex(a), ex(b), cutoff))
  def token_sort_ratio(a: Column, b: Column): Column = col(TokenSortRatio(ex(a), ex(b)))
  def indel_ratio(a: Column, b: Column): Column = col(IndelRatio(ex(a), ex(b)))
  def jaro_winkler(a: Column, b: Column): Column = col(JaroWinkler(ex(a), ex(b)))
  def match_score(a: Column, b: Column): Column = col(MatchScore(ex(a), ex(b)))
  def double_metaphone(c: Column): Column = col(DoubleMetaphoneExpr(ex(c)))
  def blocking_keys(c: Column): Column = col(BlockingKeysExpr(ex(c)))
  def minhash_bands(c: Column, numHashes: Int, bands: Int): Column =
    col(MinHashBands(ex(c), numHashes, bands))
  def is_person(c: Column): Column = col(IsPerson(ex(c)))

  /** Register every expression for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("normalize_name", es => NormalizeName(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("remove_suffix", es => RemoveSuffix(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("token_set_ratio", es => TokenSetRatio(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("token_sort_ratio", es => TokenSortRatio(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("indel_ratio", es => IndelRatio(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler", es => JaroWinkler(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("match_score", es => MatchScore(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("double_metaphone", es => DoubleMetaphoneExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("blocking_keys", es => BlockingKeysExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("is_person", es => IsPerson(es.head), "scala_udf")
  }
}
