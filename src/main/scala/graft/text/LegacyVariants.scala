package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.score.Fuzz

/** The legacy matcher's durable ideas (coname.py), re-expressed over
  * the modern normalizer:
  *
  *  - leading-token merge variants (`first_two_adj`/`first_three_adj`,
  *    coname.py:45-52): concatenate the first 2 (resp. 3) tokens, keep
  *    the rest, re-run the abbreviation rewriter — catches
  *    "A B C Industries" vs "ABC Industries" style splits;
  *  - rare-token / rare-adjacent-pair signals (df ≤ 2 "unique_word" /
  *    "pair_word", coname.py:221-244): corpus-level document-frequency
  *    aggregation, computed relationally instead of driver-side dicts.
  */
object LegacyVariants {

  /** first_two_adj: merge first 2 tokens (needs > 2 tokens, else null). */
  def firstTwoMerged(name: String): String = {
    val t = Fuzz.pySplit(name)
    if (t.length <= 2) null
    else Rewrite.abbrAdj(t(0) + t(1) + " " + t.drop(2).mkString(" "))
  }

  /** first_three_adj: merge first 3 tokens (needs > 3 tokens). */
  def firstThreeMerged(name: String): String = {
    val t = Fuzz.pySplit(name)
    if (t.length <= 3) null
    else Rewrite.abbrAdj(t(0) + t(1) + t(2) + " " + t.drop(3).mkString(" "))
  }

  case class FirstTwoMerged(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val r = firstTwoMerged(v.toString)
      if (r == null) null else UTF8String.fromString(r)
    }
    override def prettyName: String = "first_two_merged"
    override protected def withNewChildInternal(c: Expression): FirstTwoMerged = copy(child = c)
  }

  case class FirstThreeMerged(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val r = firstThreeMerged(v.toString)
      if (r == null) null else UTF8String.fromString(r)
    }
    override def prettyName: String = "first_three_merged"
    override protected def withNewChildInternal(c: Expression): FirstThreeMerged = copy(child = c)
  }

  def first_two_merged(c: Column): Column =
    GraftBridge.column(FirstTwoMerged(GraftBridge.expression(c)))
  def first_three_merged(c: Column): Column =
    GraftBridge.column(FirstThreeMerged(GraftBridge.expression(c)))

  /** coname.py:120-144's `permutation()` matching re-expressed over
    * the MODERN cascade (SURVEY.md §2.2 P8): try the (full,
    * first2-merged, first3-merged) variants of each side through
    * `MatchCascade.score`; accept at the first variant combination
    * with code > 0.
    *
    * Preserved reference semantics:
    *  - the crude prefilters run first: char-overlap < 4 rejects when
    *    both names are > 7 chars (coname.py:123-125), token_set_ratio
    *    < 55 rejects (:126-127) — both → sentinel −100;
    *  - variant order: (x,y), (two_x,y), (three_x,y) — the three_x
    *    attempt gated on two_x existing — then (x,two_y), (x,three_y);
    *  - the reference BUG at coname.py:139-141 (`if three_x:` guarding
    *    the three_Y attempt) is reproduced: the y-side three-merge is
    *    only tried when the X side has a three-merge;
    *  - fuzzywuzzy numerics are NOT reproduced (SURVEY §3.3): scores
    *    use this engine's rapidfuzz-parity kernels.
    *
    * Returns the first accepting code (> 0), else the full-form
    * cascade code (≤ 0), else −100 on prefilter reject. */
  def permutationScore(a: String, b: String): Int = {
    if (a.length > 7 && b.length > 7 && (a.toSet & b.toSet).size < 4) return -100
    if (Fuzz.tokenSetRatio(a, b) < 55) return -100
    val full = graft.score.MatchCascade.score(a, b)
    if (full > 0) return full
    val twoA = firstTwoMerged(a)
    if (twoA != null) {
      val c = graft.score.MatchCascade.score(twoA, b)
      if (c > 0) return c
      val threeA = firstThreeMerged(a)
      if (threeA != null) {
        val c3 = graft.score.MatchCascade.score(threeA, b)
        if (c3 > 0) return c3
      }
    }
    val twoB = firstTwoMerged(b)
    if (twoB != null) {
      val c = graft.score.MatchCascade.score(a, twoB)
      if (c > 0) return c
      if (firstThreeMerged(a) != null) { // reference bug: gates on X's three-merge
        val threeB = firstThreeMerged(b)
        if (threeB != null) {
          val c3 = graft.score.MatchCascade.score(a, threeB)
          if (c3 > 0) return c3
        }
      }
    }
    full
  }

  case class PermutationScore(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      permutationScore(a.toString, b.toString)
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.text.LegacyVariants.permutationScore($a.toString(), $b.toString())")
    override def prettyName: String = "permutation_score"
    override protected def withNewChildrenInternal(l: Expression, r: Expression): PermutationScore =
      copy(left = l, right = r)
  }

  def permutation_score(a: Column, b: Column): Column =
    GraftBridge.column(PermutationScore(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Tokens with corpus document frequency ≤ maxDf (unique_word,
    * coname.py:242-244). Input: (id, name) with space-joined tokens. */
  def rareTokens(names: DataFrame, nameCol: String, maxDf: Int = 2): DataFrame =
    names.select(explode(split(col(nameCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)

  /** Adjacent token pairs with corpus df ≤ maxDf (pair_word,
    * coname.py:229-245), via array zip of the token list with its
    * tail — no UDF, pure Catalyst. */
  def rareAdjacentPairs(names: DataFrame, nameCol: String, maxDf: Int = 2): DataFrame = {
    val toks = split(col(nameCol), " ")
    names
      .select(explode(zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b))).as("pair"))
      .where(col("pair").contains(" "))
      .groupBy("pair").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
  }
}
