package graft.multimodal

/** REAL pixel codec over the JDK's standard `javax.imageio` (PNG / JPEG /
  * GIF / BMP ship with every JVM — no external library): decode to pixels,
  * aspect-preserving resize with PNG re-encode, luminance statistics, and
  * a 64-bit average perceptual hash. This replaces the last fake half of
  * the multimodal stub — the Spark plumbing around it
  * ([[Multimodal.decodeMeta]] et al.) is unchanged, and the HEADER parsers
  * (PNG/JPEG/GIF dims, WAV/MP4 duration) remain the fast metadata pass:
  * at 100 TB you run the header walk over everything and the pixel pass
  * only on what survives filtering.
  *
  * Everything here is per-item pure JVM work designed to run INSIDE
  * `mapPartitions` — no driver hop, no shared state; `ImageIO` caching is
  * disabled so decode never touches local disk on an executor.
  */
object ImageCodec {

  // executors may run headless; ImageIO's BufferedImage path needs no
  // display either way, and disk caching off keeps decode pure-memory
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded raster: packed 0xRRGGBB rows, row-major. None: not a
    * decodable image (wrong magic, truncated, or an unsupported format —
    * the caller's quarantine path, never an exception). */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (bytes == null || bytes.length < 8) None
    else try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        (w, h, img.getRGB(0, 0, w, h, null, 0, w))
      }
    } catch { case _: Exception => None }

  /** REAL aspect-preserving resize: longest side becomes `maxSide`
    * (never upscaled), bilinear-quality `drawImage`, re-encoded as PNG.
    * None when the payload is not an image. */
  def resizePng(bytes: Array[Byte], maxSide: Int): Option[Array[Byte]] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
        val (tw, th) = (math.max(1, math.round(w * scale).toInt),
          math.max(1, math.round(h * scale).toInt))
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    } catch { case _: Exception => None }

  /** ITU-R 601 luma of one packed RGB pixel. */
  @inline private def luma(rgb: Int): Double =
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
      0.114 * (rgb & 0xff)

  /** Mean / stddev of real pixel luminance — the brightness/contrast
    * quality gates an image-corpus filter runs. */
  def lumaStats(bytes: Array[Byte]): Option[(Double, Double)] =
    decode(bytes).map { case (_, _, px) =>
      var s = 0.0; var s2 = 0.0
      px.foreach { p => val l = luma(p); s += l; s2 += l * l }
      val mean = s / px.length
      (mean, math.sqrt(math.max(0.0, s2 / px.length - mean * mean)))
    }

  /** 64-bit AVERAGE HASH over real pixels: partition the raster into an
    * 8×8 grid of blocks, average each block's luma, set bit (row*8+col)
    * when the block is at or above the global mean. Robust to RESIZING
    * and re-encoding (block averages are scale-invariant), which byte
    * hashes (md5) are not — the perceptual near-dup key for image
    * dedup: exact or near duplicates land in the same hash bucket, so
    * corpus-scale image dedup is a hash groupBy, never an all-pairs
    * pixel compare. */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    decode(bytes).map { case (w, h, px) =>
      val sums = new Array[Double](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val by = math.min(7, y * 8 / h)
        var x = 0
        while (x < w) {
          val i = by * 8 + math.min(7, x * 8 / w)
          sums(i) += luma(px(y * w + x)); counts(i) += 1
          x += 1
        }
        y += 1
      }
      val avgs = Array.tabulate(64)(i =>
        if (counts(i) == 0) 0.0 else sums(i) / counts(i))
      val mean = avgs.sum / 64
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (avgs(i) >= mean) bits |= (1L << i)
        i += 1
      }
      bits
    }

  /** PNG-encode a deterministic test raster: pixel (x, y) takes the 8×8
    * BIT PATTERN cell it falls in (64 bits of `pattern`), white for a set
    * bit. Piecewise-constant on the grid ⇒ any render size reproduces the
    * same block averages ⇒ [[aHash64]] recovers `pattern`'s thresholding
    * regardless of size — the property the image-dedup oracle pins. */
  def patternPng(pattern: Long, side: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(patternRaster(pattern, side), "png", bos)
    bos.toByteArray
  }

  private def patternRaster(pattern: Long,
                            side: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val bit = math.min(7, y * 8 / side) * 8 + math.min(7, x * 8 / side)
        img.setRGB(x, y,
          if (((pattern >> bit) & 1L) == 1L) 0xffffff else 0x000000)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[patternPng]]'s JPEG twin at an explicit compression quality — a
    * REAL (lossy) baseline JPEG via the JDK writer. Different qualities
    * or sizes give byte-distinct encodes, while the block-constant
    * raster keeps [[aHash64]] of the DECODED pixels identical (DCT
    * ringing perturbs cell edges, never a cell's average past the
    * black/white mean) — the property the MJPEG frame-dedup oracle
    * pins. */
  def patternJpeg(pattern: Long, side: Int, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(patternRaster(pattern, side), null,
          null), p)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }
}

/** REAL PCM sample math over RIFF/WAVE payloads. PCM is not a codec —
  * 16-bit samples are little-endian shorts sitting in the `data` chunk —
  * so the sample pass is pure JVM arithmetic with no library at all:
  * RMS loudness, peak amplitude and zero-crossing rate, the audio
  * quality gates a speech-corpus filter runs. Same executor-side
  * `mapPartitions` discipline as the image codec.
  */
object AudioCodec {

  final case class Pcm(rms: Double, peak: Long, zcr: Double)

  /** Features of a PCM16 mono/stereo WAV; None when the payload is not
    * RIFF/WAVE or not 16-bit PCM (compressed WAV needs a real codec). */
  def pcm16Features(bytes: Array[Byte]): Option[Pcm] = {
    val b = bytes
    if (b == null || b.length < 44 || b(0) != 'R' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
        b(10) != 'V' || b(11) != 'E') return None
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= b.length && (!fmtOk || dataOff < 0)) {
      val id = new String(b, off, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(off + 4)
      if (id == "fmt " && off + 24 <= b.length)
        fmtOk = le16(off + 8) == 1 && le16(off + 22) == 16 // PCM, 16-bit
      else if (id == "data") { dataOff = off + 8; dataLen = sz }
      val next = off.toLong + 8L + sz + (sz & 1L) // untrusted u32 guard
      off = if (next <= off || next > b.length) b.length else next.toInt
    }
    if (!fmtOk || dataOff < 0) return None
    val n = (math.min(dataLen, (b.length - dataOff).toLong) / 2).toInt
    if (n == 0) return Some(Pcm(0.0, 0L, 0.0))
    var s2 = 0.0
    var peak = 0L
    var crossings = 0L
    var prevSign = 0
    var i = 0
    while (i < n) {
      val s = ((b(dataOff + 2 * i) & 0xff) |
        (b(dataOff + 2 * i + 1) << 8)).toShort.toInt
      s2 += s.toDouble * s
      if (math.abs(s.toLong) > peak) peak = math.abs(s.toLong)
      val sign = Integer.signum(s)
      if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
      if (sign != 0) prevSign = sign
      i += 1
    }
    Some(Pcm(math.sqrt(s2 / n), peak,
      if (n > 1) crossings.toDouble / (n - 1) else 0.0))
  }

  /** Genuine PCM16 WAV bytes of a ±`amplitude` square wave alternating
    * every sample — RMS is exactly `amplitude` and the zero-crossing
    * rate exactly 1.0, the closed forms the oracle recomputes. */
  def squareWav(amplitude: Int, nSamples: Int,
                sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      bb.putShort((if (i % 2 == 0) amplitude else -amplitude).toShort)
      i += 1
    }
    bb.array()
  }
}
