package graft.pages

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML → text extraction (the byte-identical-per-url
  * invariant from BASELINE.json input_hint) and mention extraction.
  * Pure function of the html bytes: UTF-8 decode, tags → line breaks,
  * per-line trim, drop blanks, join with "\n". No parser state, no
  * charset sniffing, no timestamps — same bytes in, same bytes out,
  * on any executor.
  */
object Extract {

  private val tag = java.util.regex.Pattern.compile("<[^>]*>")

  def extractText(html: Array[Byte]): String = {
    val s = new String(html, StandardCharsets.UTF_8)
    val noTags = tag.matcher(s).replaceAll("\n")
    val sb = new StringBuilder(noTags.length)
    var first = true
    noTags.split('\n').foreach { line =>
      val t = line.trim
      if (t.nonEmpty) {
        if (!first) sb += '\n'
        sb ++= t
        first = false
      }
    }
    sb.toString
  }

  case class ExtractText(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(extractText(v.asInstanceOf[Array[Byte]]))
    override def prettyName: String = "extract_text"
    override protected def withNewChildInternal(c: Expression): ExtractText = copy(child = c)
  }

  def extract_text(c: Column): Column =
    GraftBridge.column(ExtractText(GraftBridge.expression(c)))

  /** Company-name mentions from extracted text: lines of the form
    * `Company: <name>`. Returns (mention_id, url, name).
    *
    * mention_id = xxhash64(url, name) — deterministic across runs and
    * partitionings (required for resume); at 10^12 rows production
    * would widen to a 128-bit id (e.g. two-long md5) to keep collision
    * probability negligible.
    */
  def mentions(pages: DataFrame): DataFrame = {
    pages
      .select(col("url"), explode(split(col("text"), "\n")).as("line"))
      .where(col("line").startsWith("Company: "))
      .select(
        xxhash64(col("url"), col("line")).as("mention_id"),
        col("url"),
        expr("substring(line, 10)").as("name"))
  }
}
