package graft

import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}
import graft.score.{Fuzz, MatchCascade}
import graft.text.Normalizer

/** Catalyst expressions agree with the scalar engine, under codegen. */
class ExpressionSpec extends SparkSuite {
  import spark.implicits._

  private lazy val names = Csv.records("golden/norm_golden.csv")
    .map(_("input")).filter(_.nonEmpty).distinct.take(300)

  test("normalize_name + remove_suffix columns match scalar engine") {
    val df = names.toDF("name")
      .withColumn("pre", gf.normalize_name($"name"))
      .withColumn("nos", gf.remove_suffix(coalesce($"pre", lit(""))))
    df.collect().foreach { r =>
      val want = Normalizer.namePreprocessing(r.getString(0))
      assert(Option(r.getString(1)) == Option(want), s"name=${r.getString(0)}")
      val wantNos = Normalizer.removeSuffix(Option(want).getOrElse(""))
      assert(r.getString(2) == wantNos)
    }
  }

  test("scoring expressions run inside whole-stage codegen and agree") {
    val pairs = Csv.records("golden/cascade_golden.csv")
      .filter(r => r("code").nonEmpty)
      .map(r => (r("a_norm"), r("b_norm"), if (r("code") == "False") 0 else r("code").toInt))
    val df = pairs.toDF("a", "b", "want")
      .repartition(2) // defeat ConvertToLocalRelation so a real codegen stage exists
      .withColumn("code", gf.match_score($"a", $"b"))
      .withColumn("tsr", gf.token_sort_ratio($"a", $"b"))
      .withColumn("tset", gf.token_set_ratio($"a", $"b"))
      .withColumn("jw", gf.jaro_winkler($"a", $"b"))
    val rows = df.collect()
    // after AQE finalization the scoring Project must be inside a
    // whole-stage-codegen stage (rendered as "*(n) Project")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"), plan)
    rows.foreach { r =>
      assert(r.getAs[Int]("code") == r.getAs[Int]("want"),
        s"${r.getString(0)} | ${r.getString(1)}")
      assert(r.getAs[Double]("tsr") == Fuzz.tokenSortRatio(r.getString(0), r.getString(1)))
      assert(r.getAs[Double]("tset") == Fuzz.tokenSetRatio(r.getString(0), r.getString(1)))
      assert(r.getAs[Double]("jw") == Fuzz.jaroWinkler(r.getString(0), r.getString(1)))
    }
  }

  test("SQL registration works") {
    gf.register(spark)
    val got = spark.sql(
      "SELECT match_score('morgan foods inc', 'morgans foods inc') AS c, " +
      "double_metaphone('siemens') AS dm").collect().head
    assert(got.getInt(0) == MatchCascade.score("morgan foods inc", "morgans foods inc"))
    assert(got.getString(1).nonEmpty)
  }

  test("null propagation: person-vetoed names null out, downstream filters drop them") {
    val df = Seq("Ford, Diane", "MORGAN FOODS, INC.").toDF("name")
      .withColumn("pre", gf.normalize_name($"name"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(1)))
    assert(df.na.drop().count() == 1)
  }
}
