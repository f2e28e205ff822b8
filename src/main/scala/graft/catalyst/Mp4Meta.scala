package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `video_meta(bytes)` — ISO BMFF (MP4) container header parse: returns
  * `struct<brand string, timescale long, duration_ms long>` recovered by
  * walking the real box structure — `ftyp` (major brand), then the
  * top-level box list to `moov`, then `moov`'s children to `mvhd`, whose
  * FullBox payload carries the movie timescale and duration (version 0:
  * u32 fields; version 1: u64 duration) — and NULL for anything that is
  * not an MP4. The video twin of [[ImageDims]]: a 100 TB metadata pass
  * reads a few hundred header bytes per row inside whole-stage codegen and
  * never decodes a frame or moves the payload.
  *
  * Parsing is total and hostile-input-safe: all sizes are read as unsigned
  * (u32, or the u64 largesize when size == 1; size == 0 = "to end of
  * file"), every advance is checked to move strictly forward and stay in
  * bounds, so corrupt sizes end the walk as "not an MP4" instead of
  * looping or throwing.
  */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"video_meta expects BINARY, got ${t.sql}")
    }

  override def dataType: DataType = Mp4MetaUtil.schema
  override def nullable: Boolean = true

  override protected def nullSafeEval(b: Any): Any =
    Mp4MetaUtil.parse(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
      InternalRow ${ev.value}_r = graft.catalyst.Mp4MetaUtil.parse($b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r;
      }
    """)

  override protected def withNewChildInternal(
      newChild: Expression): Mp4Meta = copy(child = newChild)

  override def prettyName: String = "video_meta"
}

/** Static parser invoked from generated code. */
object Mp4MetaUtil {

  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  private def u32(b: Array[Byte], i: Int): Long =
    (((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)) & 0xffffffffL

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Box header at `off` within [lo, hi): (payload start, box end), or null
    * when the header is truncated or the size is corrupt (moves backwards /
    * overruns `hi`). size == 1 → 64-bit largesize; size == 0 → to `hi`.
    */
  private def boxSpan(b: Array[Byte], off: Int, hi: Int): (Int, Int) = {
    if (off + 8 > hi) return null
    val size0 = u32(b, off)
    var hdr = 8
    var size = size0
    if (size0 == 1) {
      if (off + 16 > hi) return null
      size = u64(b, off + 8)
      hdr = 16
    } else if (size0 == 0) {
      size = (hi - off).toLong
    }
    val end = off.toLong + size
    // `end < off + hdr` also catches a hostile largesize near
    // Long.MaxValue overflowing `end` negative — without it both bounds
    // checks pass and the walk would read out of bounds or cycle
    if (size < hdr || end > hi || end < off + hdr) return null
    (off + hdr, end.toInt)
  }

  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    // first box must be ftyp (ISO 14496-12 §4.3): its payload leads with
    // the major brand 4CC
    val ftyp = boxSpan(b, 0, b.length)
    if (ftyp == null || !fourcc(b, 4, "ftyp") || ftyp._1 + 4 > ftyp._2)
      return null
    val brand = new String(b, ftyp._1, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    // top-level walk to moov (free/mdat/… skipped by size)
    var off = ftyp._2
    while (off < b.length) {
      val span = boxSpan(b, off, b.length)
      if (span == null) return null
      if (fourcc(b, off + 4, "moov")) {
        // moov children walk to mvhd
        var c = span._1
        while (c < span._2) {
          val cs = boxSpan(b, c, span._2)
          if (cs == null) return null
          if (fourcc(b, c + 4, "mvhd")) {
            val p = cs._1
            if (p + 1 > cs._2) return null
            val version = b(p) & 0xff
            // FullBox: version(1) + flags(3), then creation/modification
            // times, timescale, duration — u32s at v0, u64 times/duration
            // at v1 (timescale stays u32)
            val (timescale, duration) =
              if (version == 0) {
                if (p + 20 > cs._2) return null
                (u32(b, p + 12), u32(b, p + 16))
              } else if (version == 1) {
                if (p + 32 > cs._2) return null
                (u32(b, p + 20), u64(b, p + 24))
              } else return null
            // duration is unsigned on the wire: a value that reads negative
            // as a signed Long, or would overflow the ms conversion, is
            // treated as corrupt rather than wrapped
            if (timescale <= 0 || duration < 0 ||
                duration > Long.MaxValue / 1000L) return null
            return new GenericInternalRow(Array[Any](
              UTF8String.fromString(brand), timescale,
              duration * 1000L / timescale))
          }
          c = cs._2
        }
        return null // moov without mvhd: not a playable movie header
      }
      off = span._2
    }
    null // no moov box
  }
}

object Mp4Meta {
  /** Column-API form; requires [[register]] once per session. */
  def videoMeta(bytes: Column): Column =
    org.apache.spark.sql.functions.call_function("video_meta", bytes)

  /** Register `video_meta` for Column-API and spark.sql usage. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "video_meta", exprs => Mp4Meta(exprs.head), "scala_udf")
}
