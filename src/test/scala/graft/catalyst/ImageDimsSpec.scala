package graft.catalyst

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `image_dims` parses the REAL container wire formats — golden byte
  * arrays here are hand-assembled per the public specs (PNG IHDR, JPEG
  * JFIF/SOF marker walk, GIF logical screen descriptor) and every malformed
  * variant must degrade to NULL, never throw (a poison row at 100 TB must
  * not kill the stage).
  */
class ImageDimsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def png(w: Int, h: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    o.write(Array[Byte](0, 0, 0, 13), 0, 4)
    o.write("IHDR".getBytes, 0, 4)
    Seq(w, h).foreach(v => o.write(Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte), 0, 4))
    o.write(Array[Byte](8, 6, 0, 0, 0), 0, 5)
    o.toByteArray
  }

  private def jpeg(w: Int, h: Int, sof: Int = 0xc0,
                   fill: Boolean = false): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(Array(0xff, 0xd8).map(_.toByte), 0, 2) // SOI
    // APP0 JFIF segment the walk must skip
    o.write((Array(0xff, 0xe0, 0x00, 0x10) ++ "JFIF".getBytes.map(_.toInt)
      ++ Array(0, 1, 1, 0, 0, 1, 0, 1, 0, 0)).map(_.toByte), 0, 18)
    if (fill) o.write(Array(0xff, 0xff).map(_.toByte), 0, 2) // pad bytes
    o.write(Array(0xff, sof, 0x00, 0x11, 8,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff).map(_.toByte),
      0, 9)
    o.write(Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1), 0, 10)
    o.toByteArray
  }

  private def gif(w: Int, h: Int): Array[Byte] =
    ("GIF89a".getBytes.map(_.toInt) ++ Array(
      w & 0xff, w >> 8, h & 0xff, h >> 8, 0xf7, 0, 0)).map(_.toByte)

  private def dims(b: Array[Byte]): Option[(String, Int, Int)] =
    Option(ImageDimsUtil.parse(b)).map(r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

  test("PNG/JPEG/GIF golden headers parse to their encoded dimensions") {
    assert(dims(png(1920, 1080)) == Some(("png", 1920, 1080)))
    assert(dims(jpeg(640, 480)) == Some(("jpeg", 640, 480)))
    assert(dims(gif(320, 200)) == Some(("gif", 320, 200)))
  }

  test("JPEG walk handles progressive SOF2 and fill bytes before markers") {
    assert(dims(jpeg(333, 77, sof = 0xc2)) == Some(("jpeg", 333, 77)))
    assert(dims(jpeg(12, 34, fill = true)) == Some(("jpeg", 12, 34)))
  }

  test("malformed input degrades to NULL, never throws") {
    assert(dims(null).isEmpty)
    assert(dims(Array.empty[Byte]).isEmpty)
    assert(dims("not an image at all".getBytes).isEmpty)
    assert(dims(png(100, 100).take(20)).isEmpty)  // truncated mid-IHDR
    assert(dims(jpeg(10, 10).take(24)).isEmpty)   // truncated before SOF
    assert(dims(Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte)).isEmpty)
    assert(dims(png(0, 5)).isEmpty)               // zero dimension
    // EOI before any SOF: a JPEG with no frame header
    assert(dims(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
    // segment length below the minimum 2 → corrupt walk stops
    assert(dims(Array(0xff, 0xd8, 0xff, 0xe1, 0x00, 0x01)
      .map(_.toByte)).isEmpty)
  }

  test("codegen path (registered function over a DataFrame) matches") {
    ImageDims.register(spark)
    import spark.implicits._
    val df = Seq(png(1918, 12), jpeg(7, 60000), gif(1, 1),
      "junk".getBytes).toDF("b")
    val got = df.select(ImageDims.imageDims($"b").as("d"))
      .selectExpr("d.format", "d.width", "d.height").collect()
    assert(got(0).getString(0) == "png" && got(0).getInt(1) == 1918 &&
      got(0).getInt(2) == 12)
    assert(got(1).getString(0) == "jpeg" && got(1).getInt(1) == 7 &&
      got(1).getInt(2) == 60000)
    assert(got(2).getString(0) == "gif" && got(2).getInt(1) == 1)
    assert(got(3).isNullAt(0))
  }
}
