package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Dictionaries

/** Proves the decomposed fast location matcher ≡ the reference-shaped
  * 29k-alternative regex (matcher.py:84) on every golden name and on
  * targeted edge cases (end-alternative quirks, wildcard dots,
  * multi-word phrases, double spaces). */
class LocationSpec extends AnyFunSuite {

  private def ref(name: String): Boolean =
    Dictionaries.referenceLocationPattern.matcher(name).find()

  test("fast matcher equals reference regex on golden corpus") {
    val names = Csv.records("golden/norm_golden.csv")
      .flatMap(r => Seq(r("norm"), r("norm_keep_people"))).filter(_.nonEmpty).distinct
    names.foreach { n =>
      assert(Dictionaries.hasLocation(n) == ref(n), s"name=<$n>")
    }
  }

  test("edge cases") {
    val cases = Seq(
      "les escaldes something",      // first alternative (no leading \b)
      "charles escaldes",            // ...which may match mid-word
      "andorra la vella inc",        // multi-word phrase
      "new york capital",            // common US location
      "beijing tech",                // single word
      "partido de jose c paz",       // dotted phrase (wildcard)
      "noloc nohere xyzzy",          // negative
      "double  space new york",      // doubled space must not break others
      "new  york",                   // doubled space inside phrase → no match
      ""                             // empty
    )
    cases.foreach { n =>
      assert(Dictionaries.hasLocation(n) == ref(n), s"name=<$n>")
    }
  }
}
