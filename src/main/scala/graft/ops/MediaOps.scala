package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batched feature extraction over
  * partitions. The image/audio codecs are NOT in this container, so
  * `decodeStub` is a clearly-marked deterministic FAKE decoder — the
  * Spark-side plumbing (schema, partitioning, batch shape, feature
  * struct) is real and tested; swapping in a true codec is a
  * one-function change.
  */
object MediaOps {

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** FAKE media decode (deterministic): real implementation would call
    * an image/audio codec here. Width/height/features are pure
    * functions of the payload bytes so tests and resume are stable. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 1469598103934665603L
    var i = 0
    while (i < payload.length) { h = (h ^ payload(i)) * 1099511628211L; i += 1 }
    val width = 64 + (Math.floorMod(h, 8L) * 32L).toInt
    val height = 64 + (Math.floorMod(h >>> 8, 8L) * 32L).toInt
    val feat = new Array[Float](8)
    var j = 0
    while (j < 8) {
      feat(j) = ((TextOps.mix64(h + j) >>> 11) * (1.0 / (1L << 53))).toFloat
      j += 1
    }
    (width, height, feat)
  }

  /** media table: (media_id, payload binary, format, byte_len) —
    * synthesized from a text column as the opaque payload. */
  def mediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col(idCol) % 3 + 1).cast(IntegerType)).as("format"))
      .withColumn("byte_len", length(col("payload")).cast(IntegerType))

  /** FAKE resize (deterministic): a real implementation scales the
    * decoded raster; here the "pixels" are a hash fold of the payload
    * re-sampled to the target dims, so schema/plumbing/determinism are
    * real and the codec call is one function swap. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, (w * h) / 64)) // thumbnail-ish
    var acc = 1469598103934665603L
    var i = 0
    while (i < out.length) {
      // empty payloads (a 0-byte media blob) hash the index instead —
      // payload(0) on an empty array would throw on the executor
      val b = if (payload.length == 0) i.toByte else payload(i % payload.length)
      acc = (acc ^ b) * 1099511628211L
      out(i) = (TextOps.mix64(acc + w * 31 + h) & 0xff).toByte
      i += 1
    }
    out
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_off", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame sampling for time-media payloads: `n` evenly spaced fixed
    * size byte windows per payload (a real decoder seeks keyframes; the
    * PLUMBING — one row per (media, frame), bounded frame size, order
    * stability — is what the pipeline needs). One input row → n output
    * rows via flatMap inside the partition iterator. */
  def sampleFrames(media: DataFrame, n: Int, frameBytes: Int = 256): DataFrame =
    media.select("media_id", "payload")
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          (0 until n).iterator.map { k =>
            val off = if (payload.length <= frameBytes) 0
              else (payload.length - frameBytes).toLong * k / math.max(1, n - 1)
            val end = math.min(payload.length, off.toInt + frameBytes)
            Row(id, k, off.toInt, java.util.Arrays.copyOfRange(payload, off.toInt, end))
          }
        }
      }(org.apache.spark.sql.Encoders.row(frameSchema))

  /** Typed resize expression (like every sibling op — a Scala UDF here
    * would be opaque to Catalyst's null handling and stats). Output
    * size contract: max(1, (w·h)/64) bytes — the relational skeleton
    * the q27 oracle checks. */
  case class ResizeExpr(child: Expression, w: Int, h: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(p: Any): Any =
      resizeStub(p.asInstanceOf[Array[Byte]], w, h)
    override def prettyName: String = "media_resize"
    override protected def withNewChildInternal(c: Expression): ResizeExpr =
      copy(child = c)
  }

  def resize(c: Column, w: Int, h: Int): Column =
    GraftBridge.column(ResizeExpr(GraftBridge.expression(c), w, h))

  /** Resize stage over the media table: adds (thumb, thumb_len). */
  def resizeAll(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("thumb", resize(col("payload"), w, h))
      .withColumn("thumb_len", length(col("thumb")).cast(IntegerType))

  /** Batched per-partition feature extraction (the mapPartitions shape
    * a real codec needs: one codec instance per partition, streamed
    * batches, no per-row setup). Stays a Dataset transform — a
    * MapPartitions node inside the plan, not an RDD round trip — so
    * upstream pushdown/pruning and downstream AQE still apply around
    * the opaque decode. */
  def extractFeatures(media: DataFrame): DataFrame =
    media.select("media_id", "payload", "format", "byte_len")
      .mapPartitions { it =>
        // per-partition "codec" init happens here in a real decoder
        it.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, feat) = decodeStub(payload)
          Row(id, r.getInt(3), r.getString(2), w, h, feat.toSeq)
        }
      }(org.apache.spark.sql.Encoders.row(featureSchema))
}
