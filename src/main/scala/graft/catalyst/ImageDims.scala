package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `image_dims(bytes)` — container-format header parse for image payloads:
  * returns `struct<format string, width int, height int>` for PNG, JPEG and
  * GIF bytes, NULL for anything else (truncated, corrupt, or not an image).
  *
  * This is the honest version of the multimodal decode step: dimensions are
  * read from the actual wire format — PNG's big-endian IHDR chunk, JPEG's
  * SOF marker found by walking the variable-length segment list (skipping
  * APP0/EXIF/comment segments, as a real decoder's header pass does), GIF's
  * little-endian logical screen descriptor. Only the pixel decode itself
  * stays out of scope (no codec libraries in this environment — and a
  * metadata pass over 100 TB of media must not decode pixels anyway: this
  * expression touches at most a few hundred header bytes per row, runs
  * map-side inside whole-stage codegen, and never moves the payload).
  *
  * Parsing is total: every read is bounds-checked and malformed input
  * degrades to NULL, never an exception — at scale a poison row must not
  * kill the stage.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_dims expects BINARY, got ${t.sql}")
    }

  override def dataType: DataType = ImageDimsUtil.schema
  override def nullable: Boolean = true

  override protected def nullSafeEval(b: Any): Any =
    ImageDimsUtil.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      InternalRow ${ev.value}_r = graft.catalyst.ImageDimsUtil.parse($b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): ImageDims = copy(child = newChild)

  override def prettyName: String = "image_dims"
}

/** Static parser invoked from generated code. */
object ImageDimsUtil {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    if (w <= 0 || h <= 0) null
    else new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w, h))

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 6) return null
    // PNG: 8-byte signature, then the IHDR chunk (must be first per spec):
    // 4-byte length, "IHDR", width/height as big-endian u32 at 16/20.
    if (b.length >= 24 && (0 until 8).forall(i => b(i) == PngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return row("png", be32(b, 16), be32(b, 20))
    // GIF: "GIF87a"/"GIF89a", then the logical screen descriptor's
    // little-endian u16 width/height at 6/8.
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return row("gif", le16(b, 6), le16(b, 8))
    // JPEG: SOI, then a marker-segment walk. Dimensions live in the first
    // frame header (SOF0..SOF15, excluding DHT/JPG/DAC which share the
    // 0xCx range): u16 height at +5, u16 width at +7 past the marker.
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return null // marker desync → corrupt
        // fill bytes: any number of 0xFF may pad before a marker
        while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
        if (i + 1 >= b.length) return null
        val m = b(i + 1) & 0xff
        if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone marker, no payload
        } else if (m == 0xd9 || m == 0xda) {
          return null // EOI / start-of-scan before any SOF: no dims
        } else if (i + 3 >= b.length) {
          return null
        } else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                   m != 0xcc) {
          if (i + 8 >= b.length) return null
          return row("jpeg", be16(b, i + 7), be16(b, i + 5))
        } else {
          val segLen = be16(b, i + 2)
          if (segLen < 2) return null
          i += 2 + segLen
        }
      }
      return null
    }
    null
  }
}

object ImageDims {
  /** Column-API form; requires [[register]] once per session. */
  def imageDims(bytes: Column): Column =
    org.apache.spark.sql.functions.call_function("image_dims", bytes)

  /** Register `image_dims` for Column-API and spark.sql usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "image_dims", exprs => ImageDims(exprs.head), "scala_udf")
}
