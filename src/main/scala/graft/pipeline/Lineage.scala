package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage committed outputs with lineage sidecars — the engine's
  * resumability story (north rule: "resumable from checkpoint with
  * per-partition lineage + metrics").
  *
  * Every pipeline stage writes its output table plus a `_lineage.json`
  * sidecar recording the input fingerprint, config hash, row count,
  * per-file (≈ per-partition) row counters, and wall time. On rerun, a
  * stage whose (inputFingerprint, configHash) matches its sidecar is
  * skipped and its committed output is read back — the job resumes
  * from the last committed stage. This is the local-parquet face of
  * the TableIO seam; on a production cluster the same protocol maps to
  * Iceberg snapshot ids + snapshot summary metrics (no code change
  * above the seam).
  */
object Lineage {

  def sha(parts: String*): String = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(p => md.update(p.getBytes(StandardCharsets.UTF_8)))
    md.digest().take(12).map("%02x".format(_)).mkString
  }

  /** Fingerprint of the compiled engine itself: SHA over every class
    * file under `graft/` on the classpath (directory classpaths in
    * dev, jar entries in a deployed assembly), sorted by name. Folded into
    * every durable stage/table root so a behavior-changing code edit
    * can never silently resume stale committed stages — the manual
    * version string in Config.hash guarded only edits someone
    * remembered to bump. Computed once per JVM (~10 ms locally). */
  lazy val codeFingerprint: String = {
    val md = MessageDigest.getInstance("SHA-256")
    val entries = scala.collection.mutable.SortedMap[String, Array[Byte]]()
    var failed = false
    try {
      val urls = getClass.getClassLoader.getResources("graft")
      while (urls.hasMoreElements) {
        val url = urls.nextElement()
        url.getProtocol match {
          case "file" =>
            val root = Paths.get(url.toURI)
            val stream = Files.walk(root)
            try stream.forEach { p =>
              if (p.toString.endsWith(".class") && Files.isRegularFile(p))
                entries(s"graft/${root.relativize(p)}") = Files.readAllBytes(p)
            } finally stream.close()
          case "jar" =>
            val conn = url.openConnection()
              .asInstanceOf[java.net.JarURLConnection]
            val jar = conn.getJarFile
            val es = jar.entries()
            while (es.hasMoreElements) {
              val e = es.nextElement()
              if (e.getName.startsWith("graft/") && e.getName.endsWith(".class")) {
                val in = jar.getInputStream(e)
                try entries(e.getName) = in.readAllBytes()
                finally in.close()
              }
            }
          case _ => ()
        }
      }
    } catch { case e: Throwable =>
      failed = true
      System.err.println(s"[graft-lineage] code fingerprint failed: ${e.getMessage}")
    }
    // fail CLOSED: any fingerprinting error (or an unknown classpath
    // protocol yielding zero entries, or a walk that threw midway and
    // left a stable PARTIAL digest) falls back to a per-JVM random
    // token — every durable root derived from it then misses and
    // rebuilds, the safe direction. The old constant 'nocode' made
    // every failing version share roots, exactly the stale-resume the
    // fingerprint exists to prevent.
    if (failed || entries.isEmpty) {
      val token = s"nofp-${java.util.UUID.randomUUID().toString.take(8)}"
      System.err.println(s"[graft-lineage] code fingerprint unavailable; " +
        s"using per-JVM token $token (durable stages will rebuild)")
      token
    } else {
      entries.foreach { case (name, bytes) =>
        md.update(name.getBytes(StandardCharsets.UTF_8)); md.update(bytes)
      }
      md.digest().take(8).map("%02x".format(_)).mkString
    }
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Run (or resume) a stage through the [[TableIO]] seam. Returns
    * the committed DataFrame. */
  def stage(spark: SparkSession, root: String, name: String,
      inputFingerprint: String, configHash: String,
      io: TableIO = ParquetTableIO)
      (build: => DataFrame): DataFrame = {
    val dir = s"$root/$name"
    val metaPath = Paths.get(s"$dir/_lineage.json")
    val expected = s""""input":"${esc(inputFingerprint)}","config":"${esc(configHash)}""""
    if (Files.exists(metaPath) &&
        new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8).contains(expected)) {
      return io.read(spark, dir)
    }
    val t0 = System.nanoTime()
    val built = build
    io.write(built, dir)
    // observe() probes planted by the stages (pairs in/accepted,
    // keyed/capped row counts) materialize with the write action;
    // commit them into the sidecar so cap/skew decisions are
    // observable per stage without extra jobs
    // non-numeric metric values (strings, timestamps, nulls) are
    // JSON-quoted/escaped — a raw interpolation would corrupt the
    // sidecar and break resume's sidecar matching
    def jsonVal(v: Any): String = v match {
      case null => "null"
      case n: Number => n.toString
      case b: Boolean => b.toString
      case other => s""""${esc(other.toString)}""""
    }
    val observed = built.queryExecution.observedMetrics.toSeq.sortBy(_._1)
      .map { case (n, row) =>
        val fields = row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
          s""""${esc(f)}":${jsonVal(row.get(i))}"""
        }.mkString(",")
        s""""${esc(n)}":{$fields}"""
      }.mkString("{", ",", "}")
    val committed = io.read(spark, dir)
    val perFile = committed.groupBy(input_file_name().as("file")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rows = perFile.map(_._2).sum
    val wallMs = (System.nanoTime() - t0) / 1000000
    val filesJson = perFile.sortBy(_._1).map { case (f, n) =>
      s"""{"file":"${esc(f.substring(f.lastIndexOf('/') + 1))}","rows":$n}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"stage":"${esc(name)}",$expected,"rows":$rows,"wall_ms":$wallMs,
         |"committed_at":"${java.time.Instant.now()}","partitions":${perFile.length},
         |"observed":$observed,
         |"partition_counters":$filesJson}""".stripMargin.replace("\n", "")
    Files.write(metaPath, json.getBytes(StandardCharsets.UTF_8))
    committed
  }

  /** Fingerprint of an input directory: path + sidecar content if
    * present (stages chain on each other's sidecars). */
  def dirFingerprint(path: String): String = {
    val metaPath = Paths.get(s"$path/_lineage.json")
    if (Files.exists(metaPath))
      sha(path, new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8))
    else sha(path)
  }
}
