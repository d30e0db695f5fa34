package graft.tools

/** Dev microbenchmark: scalar cost of BlockingKeys.keys per name. */
object KeyBench {
  def main(args: Array[String]): Unit = {
    val names = (0 until 26000).map { i =>
      graft.text.Normalizer.namePreprocessing(
        graft.pages.PagesGen.mentionName(i / 4, i % 4), removePeople = false)
    }.filter(n => n != null && n.nonEmpty).toArray
    // warm
    var acc = 0
    names.take(2000).foreach(n => acc += graft.block.BlockingKeys.keys(n).length)
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      names.foreach(n => acc += graft.block.BlockingKeys.keys(n).length)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"KEYBENCH ${names.length} names in $ms%.0f ms = ${ms * 1e6 / names.length}%.0f ns/name (acc=$acc)")
    }
    // break down components
    val t1 = System.nanoTime()
    names.foreach(n => acc += graft.block.BlockingKeys.minhashBands(n).length)
    println(f"KEYBENCH minhash only: ${(System.nanoTime() - t1) / 1e6}%.0f ms")
    val t2 = System.nanoTime()
    names.foreach { n =>
      val ft = graft.block.BlockingKeys.firstInformativeToken(n)
      acc += graft.block.BlockingKeys.doubleMetaphone(ft).length
      acc += graft.block.BlockingKeys.soundex(ft).length
    }
    println(f"KEYBENCH phonetic only: ${(System.nanoTime() - t2) / 1e6}%.0f ms (acc=$acc)")
  }
}
