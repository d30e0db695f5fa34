package graft

import org.apache.spark.sql.functions._

import graft.score.TfIdf

/** TF-IDF cosine scorer (north-star extra; reference analog is
  * coname.py's df≤2 rare-token signal): hand-computed goldens. */
class TfIdfSpec extends SparkSuite {
  import spark.implicits._

  test("pair cosine matches hand computation") {
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"), (3L, "durian"))
      .toDF("id", "name")
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val got = TfIdf.pairCosine(pairs, docs, "id", "name")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // idf: apple ln(3/2); banana/cherry/durian ln(3)
    val a = math.log(1.5); val b = math.log(3.0)
    val exp12 = a * a / (a * a + b * b) // shared "apple" only
    assert(math.abs(got((1L, 2L)) - exp12) < 1e-6, s"got ${got((1L, 2L))} want $exp12")
    assert(got((1L, 3L)) == 0.0) // no shared token
    assert(got((2L, 3L)) == 0.0)
  }

  test("identical docs → cosine 1; zero-idf vocabulary → cosine 0") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
      .toDF("id", "name")
    val got = TfIdf.pairCosine(Seq((1L, 2L)).toDF("id_a", "id_b"), docs, "id", "name")
      .as[(Long, Long, Double)].collect().head._3
    assert(got == 1.0)
    // every token in every doc → all idf 0 → zero norms → defined as 0
    val flat = Seq((1L, "x"), (2L, "x")).toDF("id", "name")
    val z = TfIdf.pairCosine(Seq((1L, 2L)).toDF("id_a", "id_b"), flat, "id", "name")
      .as[(Long, Long, Double)].collect().head._3
    assert(z == 0.0)
  }

  test("df/idf aggregation: counts over distinct (id, word)") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "name")
    val idf = TfIdf.idf(TfIdf.termFreq(docs, "id", "name"))
      .select("word", "df").as[(String, Long)].collect().toMap
    assert(idf == Map("a" -> 2L, "b" -> 1L, "c" -> 1L)) // tf 2 in doc 1 still df 1
  }
}
