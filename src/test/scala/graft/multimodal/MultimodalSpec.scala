package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plumbing tests for binary media columns: schema round-trip through
  * parquet, per-partition decode (stubbed codec), null/empty payloads,
  * and scan-level pruning of the binary column for metadata-only queries.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def media = Multimodal.fromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  test("binary column round-trips parquet with declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    media.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("media_bytes").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(back.count() == media.count())
    val one = back.filter(col("media_id") === 1).head()
    val text = new String(one.getAs[Array[Byte]]("media_bytes"), "UTF-8")
    assert(text.startsWith("spark") || text.nonEmpty)
  }

  test("distributed decode: deterministic stub over partitions, empty-safe") {
    import spark.implicits._
    implicit val s = spark
    val ds = media.select(col("media_id"), col("kind"), col("media_bytes"),
        col("meta.source_doc"), col("meta.mime"))
      .as[Multimodal.MediaRow]
      .repartition(7) // decode must not depend on partitioning
    val out = Multimodal.decodeMeta(ds).collect()
    assert(out.length == 500 && out.forall(_.ok))
    assert(out.forall(m => m.width >= 1 && m.width <= 1920))
    assert(out.filter(_.kind == "image").forall(_.duration_ms == 0))
    assert(out.filter(_.kind != "image").forall(_.duration_ms > 0))
    // determinism: same input → same metadata regardless of partitioning
    val out2 = Multimodal.decodeMeta(ds.repartition(3)).collect()
    assert(out.sortBy(_.media_id).toSeq == out2.sortBy(_.media_id).toSeq)
    // empty payload → ok=false, no crash
    val empty = Multimodal.DecodeStub.decode(
      Multimodal.MediaRow(9L, "image", Array.emptyByteArray, 0L, "x"))
    assert(!empty.ok && empty.n_bytes == 0)
  }

  test("resize planning and frame sampling over the stubbed codec") {
    import spark.implicits._
    implicit val s = spark
    val ds = media.select(col("media_id"), col("kind"), col("media_bytes"),
        col("meta.source_doc"), col("meta.mime"))
      .as[Multimodal.MediaRow]
    val resized = Multimodal.resizeMeta(ds, maxSide = 256).collect()
    assert(resized.length == 500)
    assert(resized.forall(r =>
      r.target_w <= 256 && r.target_h <= 256 &&
        (r.scale == 1.0 || math.max(r.width, r.height) > 256)))
    // when downscaled, the long side lands exactly on the target box
    assert(resized.filter(_.scale < 1.0).forall(r =>
      math.max(r.target_w, r.target_h) == 256))

    val frames = Multimodal.frameSample(ds, n = 4).collect()
    val videos = ds.filter(col("kind") === "video").count()
    assert(frames.length == videos * 4)
    assert(frames.groupBy(_.media_id).values
      .forall(f => f.map(_.frame_idx).sorted.sameElements(0 until 4)))
    // frames evenly spaced, strictly increasing per video
    assert(frames.groupBy(_.media_id).values.forall { f =>
      val ms = f.sortBy(_.frame_idx).map(_.frame_ms)
      ms.zip(ms.tail).forall { case (a, b) => a <= b }
    })
  }

  test("mp4 box walk: v0/v1 layouts parse, corrupt sizes terminate") {
    def be4(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(tag: String, payload: Array[Byte]): Array[Byte] =
      be4(payload.length + 8L) ++ tag.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be4(0x200) ++ "mp41".getBytes("US-ASCII"))
    def mvhdV0(ts: Int, dur: Int) = box("mvhd",
      new Array[Byte](12) ++ be4(ts) ++ be4(dur) ++ new Array[Byte](80))
    def mvhdV1(ts: Int, dur: Long) = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++ be4(ts) ++
        be4(dur >> 32) ++ be4(dur & 0xffffffffL) ++ new Array[Byte](80))
    val v0 = ftyp ++ box("free", new Array[Byte](8)) ++
      box("moov", mvhdV0(600, 3000))
    val r0 = graft.catalyst.Mp4MetaUtil.parse(v0)
    assert(r0 != null && r0.getString(0) == "isom" &&
      r0.getLong(1) == 600 && r0.getLong(2) == 5000)
    val v1 = ftyp ++ box("moov", mvhdV1(1000, 4500L))
    val r1 = graft.catalyst.Mp4MetaUtil.parse(v1)
    assert(r1 != null && r1.getLong(1) == 1000 && r1.getLong(2) == 4500)
    // not an MP4 / truncated / corrupt → NULL, never a hang or throw
    assert(graft.catalyst.Mp4MetaUtil.parse("plain text".getBytes) == null)
    assert(graft.catalyst.Mp4MetaUtil.parse(v0.take(30)) == null)
    val corruptSize = v0.clone()
    corruptSize(ftyp.length) = 0xff.toByte // free box size → huge u32
    assert(graft.catalyst.Mp4MetaUtil.parse(corruptSize) == null)
    val zeroLoop = ftyp ++ be4(7L) ++ "free".getBytes("US-ASCII") // size<hdr
    assert(graft.catalyst.Mp4MetaUtil.parse(zeroLoop) == null)
    // hostile 64-bit largesize near Long.MaxValue: `off + size` would
    // overflow negative and slip past both bounds checks — must reject,
    // not crash or loop
    val huge = ftyp ++ be4(1L) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](0x7f.toByte, -1, -1, -1, -1, -1, -1, -16) ++
      new Array[Byte](16)
    assert(graft.catalyst.Mp4MetaUtil.parse(huge) == null)
  }

  test("metadata query prunes the binary column at the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm2").toString
    media.write.mode("overwrite").parquet(dir)
    val metaQ = spark.read.parquet(dir)
      .select(col("media_id"), col("kind"), col("meta.source_doc"))
    val scanSchema = metaQ.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanSchema.contains("media_id") &&
      !scanSchema.contains("media_bytes"))
  }

  test("ImageCodec: real decode, resize, luma stats, scale-stable aHash") {
    import graft.multimodal.ImageCodec
    val pattern = 0x5A5A_F00F_C3C3_0FF0L
    val png64 = ImageCodec.patternPng(pattern, 64)
    // decode returns true dimensions and pixels
    val (w, h, px) = ImageCodec.decode(png64).get
    assert(w == 64 && h == 64 && px.length == 64 * 64)
    // luma stats over a half-set bit pattern: mean strictly between the
    // extremes, nonzero contrast
    val (mean, std) = ImageCodec.lumaStats(png64).get
    assert(mean > 0 && mean < 255 && std > 0, s"mean=$mean std=$std")
    // REAL resize: dims shrink aspect-preserving, content survives
    val small = ImageCodec.resizePng(png64, 32).get
    val (sw, sh, _) = ImageCodec.decode(small).get
    assert(sw == 32 && sh == 32)
    // the perceptual hash is stable across render sizes AND the resize,
    // and equals the source pattern's thresholding (piecewise-constant
    // grid: block averages reproduce exactly)
    val h64 = ImageCodec.aHash64(png64).get
    assert(h64 == ImageCodec.aHash64(ImageCodec.patternPng(pattern, 32)).get)
    assert(h64 == ImageCodec.aHash64(ImageCodec.patternPng(pattern, 48)).get)
    assert(h64 == ImageCodec.aHash64(small).get)
    assert(h64 == pattern,
      f"aHash must recover the grid pattern: got $h64%016x")
    // a different pattern separates
    assert(h64 != ImageCodec.aHash64(ImageCodec.patternPng(~pattern, 64)).get)
    // JPEG round-trips through the same decode path (lossy but decodable)
    val img = new java.awt.image.BufferedImage(10, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val (jw, jh, _) = ImageCodec.decode(bos.toByteArray).get
    assert(jw == 10 && jh == 7)
    // garbage is None, never an exception
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
  }

  test("VideoCodec: MJPEG demux walks real JPEG structure — exact frame " +
    "recovery, resync over garbage, truncation dropped, decoded hashes " +
    "stable across quality") {
    import graft.multimodal.{ImageCodec, VideoCodec}
    val pattern = 0x5A5A_F00F_C3C3_0FF0L
    val f1 = ImageCodec.patternJpeg(pattern, 48, 0.65f)
    val f2 = ImageCodec.patternJpeg(pattern, 64, 0.92f)
    val f3 = ImageCodec.patternJpeg(~pattern, 56, 0.8f)
    // quality and size move the bytes but not the decoded hash
    assert(!java.util.Arrays.equals(f1, f2))
    assert(ImageCodec.aHash64(f1).get == pattern)
    assert(ImageCodec.aHash64(f2).get == pattern)
    assert(ImageCodec.aHash64(f3).get == ~pattern)
    // clean concatenated stream: exact frame boundaries back out
    val frames = VideoCodec.mjpegFrames(f1 ++ f2 ++ f3)
    assert(frames.length == 3)
    assert(java.util.Arrays.equals(frames(0), f1))
    assert(java.util.Arrays.equals(frames(1), f2))
    assert(java.util.Arrays.equals(frames(2), f3))
    // inter-frame garbage (including a stray 0xFF) resyncs to SOI
    val junk = Array[Byte](0x00, -1 /* 0xFF */, 0x17, 0x42)
    val dirty = VideoCodec.mjpegFrames(junk ++ f1 ++ junk ++ f2 ++ junk)
    assert(dirty.length == 2)
    assert(java.util.Arrays.equals(dirty(0), f1))
    assert(java.util.Arrays.equals(dirty(1), f2))
    // a truncated trailing frame is dropped, the complete ones survive
    val cut = VideoCodec.mjpegFrames(f1 ++ f2.dropRight(40))
    assert(cut.length == 1 && java.util.Arrays.equals(cut.head, f1))
    // hostile inputs: empty / null / not-JPEG never throw
    assert(VideoCodec.mjpegFrames(Array.emptyByteArray).isEmpty)
    assert(VideoCodec.mjpegFrames(null).isEmpty)
    assert(VideoCodec.mjpegFrames("ffd8 nowhere".getBytes).isEmpty)
    // every demuxed frame decodes through the ordinary image path
    frames.foreach(fb => assert(ImageCodec.decode(fb).nonEmpty))
  }

  test("AudioCodec: real PCM16 sample walk — exact closed forms") {
    import graft.multimodal.AudioCodec
    val wav = AudioCodec.squareWav(amplitude = 12000, nSamples = 400)
    val f = AudioCodec.pcm16Features(wav).get
    assert(f.rms == 12000.0, s"square-wave RMS must be exact: ${f.rms}")
    assert(f.peak == 12000L && f.zcr == 1.0, s"$f")
    // the header walk agrees with the sample count: 400 samples @ 8 kHz
    // = 50 ms through the metadata pass too
    val meta = graft.multimodal.Multimodal.DecodeStub.decode(
      graft.multimodal.Multimodal.MediaRow(1L, "audio", wav, 1L, "audio/wav"))
    assert(meta.ok && meta.duration_ms == 50, s"$meta")
    // silence: all-zero samples
    val silent = AudioCodec.squareWav(0, 100)
    val fs = AudioCodec.pcm16Features(silent).get
    assert(fs.rms == 0.0 && fs.peak == 0L && fs.zcr == 0.0)
    // a non-PCM payload is None, never an exception
    assert(AudioCodec.pcm16Features("RIFFxxxxWAVEjunk".getBytes).isEmpty)
  }

  test("pixelFeatures / resizePixels: distributed real-pixel pass") {
    import graft.multimodal.{ImageCodec, Multimodal}
    implicit val s = spark
    import spark.implicits._
    val rows = (0L until 6L).map { i =>
      val bytes =
        if (i % 3 == 2) s"not an image $i".getBytes // mixed corpus
        else ImageCodec.patternPng(0xF0F0_1234_ABCD_5678L ^ i / 3, 64)
      Multimodal.MediaRow(i, "image", bytes, i, "image/png")
    }
    val media = rows.toDS()
    val feats = Multimodal.pixelFeatures(media).collect()
      .sortBy(_.media_id)
    assert(feats.count(_.ok) == 4 && feats.count(!_.ok) == 2)
    assert(feats.filter(_.ok).forall(f =>
      f.width == 64 && f.luma_std > 0))
    // two renders of the same pattern share the perceptual hash
    assert(feats(0).ahash == feats(1).ahash &&
      feats(0).ahash != feats(3).ahash)
    val resized = Multimodal.resizePixels(media, 32).collect()
    assert(resized.length == 4, "non-images drop from the resize pass")
    assert(resized.forall(r => r.width == 32 && r.height == 32))
    // resize preserves the perceptual identity
    assert(ImageCodec.aHash64(resized.head.png).get == feats(0).ahash)
  }
}
