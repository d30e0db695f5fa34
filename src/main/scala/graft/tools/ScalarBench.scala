package graft.tools

import graft.score.{Fuzz, MatchCascade, NameAnalysis}

/** Scalar cascade micro-benchmark (pairs/sec) at 1..N threads. */
object ScalarBench {
  def run(names: Array[String], nPairs: Int, seed: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < nPairs) {
      val a = names((i + seed) % names.length)
      val b = names((i * 31 + 7 + seed) % names.length)
      if (Fuzz.tokenSetRatio(NameAnalysis.of(a).c, NameAnalysis.of(b).c) > 50)
        acc += MatchCascade.score(a, b)
      i += 1
    }
    acc
  }

  def main(args: Array[String]): Unit = {
    val names = (0 until 24000).map { i =>
      graft.text.Normalizer.namePreprocessing(
        graft.pages.PagesGen.mentionName(i / 4, i % 4), removePeople = false)
    }.filter(n => n != null && n.nonEmpty).toArray
    run(names, 300000, 0) // warm
    for (threads <- Seq(1, 8, 32)) {
      val per = 1500000
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { run(names, per, t * 1047) })
        th.start(); th
      }
      ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d  ${threads * per / secs}%.0f pairs/sec total, ${per / secs}%.0f per thread")
    }
  }
}
