package graft

import java.nio.charset.StandardCharsets
import scala.io.Source

/** Minimal RFC-4180 CSV reader for the golden fixtures (quoted fields,
  * embedded commas/quotes/newlines). */
object Csv {
  def parse(text: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val row = Vector.newBuilder[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    var sawAny = false
    val n = text.length
    while (i < n) {
      val ch = text.charAt(i)
      if (inQuotes) {
        if (ch == '"') {
          if (i + 1 < n && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQuotes = false
        } else field += ch
      } else ch match {
        case '"' => inQuotes = true; sawAny = true
        case ',' => row += field.result(); field.clear(); sawAny = true
        case '\r' => // ignore
        case '\n' =>
          if (sawAny || field.nonEmpty) { row += field.result(); rows += row.result() }
          field.clear(); row.clear(); sawAny = false
        case c => field += c; sawAny = true
      }
      i += 1
    }
    if (sawAny || field.nonEmpty) { row += field.result(); rows += row.result() }
    rows.result()
  }

  def resource(path: String): Vector[Vector[String]] = {
    val in = getClass.getClassLoader.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    val text = try Source.fromInputStream(in)(scala.io.Codec(StandardCharsets.UTF_8)).mkString
    finally in.close()
    parse(text)
  }

  /** rows as maps keyed by the header row */
  def records(path: String): Vector[Map[String, String]] = {
    val rows = resource(path)
    val header = rows.head
    rows.tail.map(r => header.zip(r).toMap)
  }
}
