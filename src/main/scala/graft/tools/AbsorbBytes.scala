package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pages.PagesGen
import graft.pipeline.{Absorb, Pipeline}

/** Round-7 byte instrumentation for the absorb loop (VERDICT r6 task
  * 5): per-batch shuffle-read/write and input bytes SPLIT BY PHASE
  * (census / pairs / hydrate-restrict / score / labels / append — the
  * job-description labels Absorb.absorb sets), at a given standing
  * corpus size. Run at two corpus sizes with the same increment size
  * and the O(increment)-vs-O(corpus) cost split is directly visible:
  * shuffle bytes should track the INCREMENT, input (read) bytes are
  * the documented residual that tracks the corpus in this in-process
  * binding.
  *
  * Usage: runMain graft.tools.AbsorbBytes [standingEnts] [incEnts] [nInc]
  */
object AbsorbBytes {
  def main(args: Array[String]): Unit = {
    val nStand = args.headOption.map(_.toLong).getOrElse(40000L)
    val nIncEnt = args.lift(1).map(_.toLong).getOrElse(2000L)
    val nInc = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // phase-attributed task metrics: jobStart carries the description
    // and the job's stage ids; taskEnd is attributed via its stage id
    val stagePhase = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    final case class Tot(var sw: Long = 0L, var sr: Long = 0L, var in: Long = 0L)
    val totals = new java.util.concurrent.ConcurrentHashMap[String, Tot]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("other")
          val ph = if (desc.startsWith("absorb: ")) desc.stripPrefix("absorb: ")
            else "other"
          e.stageIds.foreach(sid => stagePhase.put(sid, ph))
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            val ph = Option(stagePhase.get(e.stageId)).getOrElse("other")
            val t = totals.computeIfAbsent(ph, _ => Tot())
            t.synchronized {
              t.sw += m.shuffleWriteMetrics.bytesWritten
              t.sr += m.shuffleReadMetrics.totalBytesRead
              t.in += m.inputMetrics.bytesRead
            }
          }
        }
      })
    def drain(): Unit = {
      var prev = totals.toString
      var stable = 0
      val t0 = System.nanoTime()
      while (stable < 3 && (System.nanoTime() - t0) < 8000000000L) {
        Thread.sleep(200)
        val cur = totals.toString
        if (cur == prev) stable += 1 else stable = 0
        prev = cur
      }
    }
    def snapshot(): Map[String, (Long, Long, Long)] = {
      drain()
      import scala.jdk.CollectionConverters._
      totals.asScala.map { case (k, t) => (k, (t.sw, t.sr, t.in)) }.toMap
    }
    def diff(a: Map[String, (Long, Long, Long)],
        b: Map[String, (Long, Long, Long)]): Map[String, (Long, Long, Long)] =
      (a.keySet ++ b.keySet).map { k =>
        val (w1, r1, i1) = b.getOrElse(k, (0L, 0L, 0L))
        val (w0, r0, i0) = a.getOrElse(k, (0L, 0L, 0L))
        (k, (w1 - w0, r1 - r0, i1 - i0))
      }.toMap

    println(s"ABSORBBYTES config standing=$nStand ents, " +
      s"increment=$nIncEnt ents x$nInc batches")
    // standing corpus: coined names (globally distinctive first tokens
    // — the scale-stress generator), mentions 4x per entity
    val all = Pipeline.normalize(
      Pipeline.extractMentions(PagesGen.generate(spark,
          nStand + nIncEnt * nInc, 4, partitions = 64, coined = true))
        .select(col("mention_id").as("id"), col("name")))
      .select("id", "pre_proc", "nosuffix").persist()
    val nTotal = all.count()
    println(s"ABSORBBYTES corpus rows=$nTotal")
    // deterministic slices: standing = pmod(id, total)=... simpler:
    // slice by pmod over (nInc+1) weighted — standing gets weight by
    // using pmod(id, K) < K_stand
    val k = 1000
    val kStand = (k * nStand.toDouble / (nStand + nIncEnt * nInc)).toLong
    val kIncW = (k - kStand) / nInc
    def sliceInc(i: Int) = all.where(
      pmod(col("id"), lit(k)) >= kStand + i * kIncW &&
      pmod(col("id"), lit(k)) < (if (i == nInc - 1) k.toLong else kStand + (i + 1) * kIncW))
    val seed = all.where(pmod(col("id"), lit(k)) < kStand).persist()
    println(s"ABSORBBYTES seed rows=${seed.count()}")

    val table = s"graft_bytes_${System.nanoTime()}"
    val path = java.nio.file.Files.createTempDirectory("graft_bytes").toString
    val tInit = System.nanoTime()
    var st = Absorb.init(spark, table, 32, path, seed)
    println(f"ABSORBBYTES init(one-shot seed) ${(System.nanoTime() - tInit) / 1e9}%.1fs")
    for (b <- 0 until nInc) {
      val inc = sliceInc(b).persist()
      val incRows = inc.count()
      val s0 = snapshot()
      val t0 = System.nanoTime()
      val r = Absorb.absorb(spark, st, inc, monitor = true)
      st = r.standing
      val wall = (System.nanoTime() - t0) / 1e9
      val d = diff(s0, snapshot())
      val mb = 1024.0 * 1024.0
      println(f"ABSORBBYTES batch$b incRows=$incRows wall=$wall%.1fs")
      d.toSeq.sortBy(_._1).foreach { case (ph, (w, rr, in)) =>
        if (w + rr + in > 0)
          println(f"ABSORBBYTES batch$b phase=$ph%-16s shufW=${w / mb}%9.1fMB " +
            f"shufR=${rr / mb}%9.1fMB input=${in / mb}%9.1fMB")
      }
    }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
