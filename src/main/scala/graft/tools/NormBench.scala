package graft.tools

/** Round-7 micro: namePreprocessing throughput (names/sec, single
  * thread) over the deterministic mention-name mix. */
object NormBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(30000)
    val names = (0 until n).map(i =>
      graft.pages.PagesGen.mentionName(i / 4, i % 4)).toArray
    // warm
    var sink = 0
    for (_ <- 0 until 2; nm <- names.take(5000)) {
      val r = graft.text.Normalizer.namePreprocessing(nm, removePeople = true)
      if (r != null) sink += r.length
    }
    val t0 = System.nanoTime()
    names.foreach { nm =>
      val r = graft.text.Normalizer.namePreprocessing(nm, removePeople = true)
      if (r != null) sink += r.length
    }
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"NORMBENCH $n names in $secs%.2fs = ${n / secs}%.0f names/s (sink=$sink)")
  }
}
