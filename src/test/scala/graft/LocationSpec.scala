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

  test("fast matcher equals reference regex on 6k generator + recombined names") {
    val base = (0 until 1000).map(i =>
      graft.text.Normalizer.namePreprocessing(
        graft.pages.PagesGen.mentionName(i / 4, i % 4), removePeople = false))
      .filter(n => n != null && n.nonEmpty)
    val rnd = new scala.util.Random(7)
    val locWords = Seq("york", "san", "jose", "paz", "st", "poelten", "leandro",
      "alem", "beijing", "escaldes", "countries", "zuwarah", "andorra", "la", "vella")
    val recombined = (0 until 5000).map { _ =>
      val toks = (0 until 1 + rnd.nextInt(5)).map { _ =>
        if (rnd.nextBoolean()) locWords(rnd.nextInt(locWords.length))
        else base(rnd.nextInt(base.length)).split(" ").head
      }
      toks.mkString(" ")
    }
    (base ++ recombined).foreach { n =>
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
