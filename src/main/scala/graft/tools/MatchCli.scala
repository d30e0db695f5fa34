package graft.tools

import graft.score.MatchCascade
import graft.text.Normalizer

/** Tiny scalar CLI mirroring the reference's pair-scoring contract
  * (match_pair.py:19-23): reads `a<TAB>b` name pairs from stdin,
  * writes `accept<TAB>code<TAB>norm_a<TAB>norm_b`. Single-process
  * utility for smoke-testing the cascade outside Spark; the
  * distributed path is graft.pipeline. */
object MatchCli {
  def main(args: Array[String]): Unit = {
    val in = scala.io.Source.stdin.getLines()
    in.foreach { line =>
      val parts = line.split('\t')
      if (parts.length >= 2) {
        val a = Normalizer.namePreprocessing(parts(0))
        val b = Normalizer.namePreprocessing(parts(1))
        val code =
          if (a == null || b == null || a.isEmpty || b.isEmpty) MatchCascade.NoScore
          else MatchCascade.matchTest(parts(0), parts(1))
        val accept = code != MatchCascade.NoScore && code > 0
        val codeStr = if (code == MatchCascade.NoScore) "none" else code.toString
        println(s"$accept\t$codeStr\t${Option(a).getOrElse("∅")}\t${Option(b).getOrElse("∅")}")
      }
    }
  }
}
