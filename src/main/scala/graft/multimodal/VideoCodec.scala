package graft.multimodal

/** REAL video FRAME decode for the one video codec family the JVM ships:
  * MOTION JPEG. An MJPEG elementary stream is concatenated baseline JPEG
  * frames, so the demux is the marker walk every MJPEG tool performs
  * (segment lengths to SOS, then a stuffing-aware scan of the entropy
  * data to EOI) and the per-frame pixel decode is `javax.imageio` — the
  * same standard-JDK codec [[ImageCodec]] uses for stills. Inter-frame
  * codecs (H.264/VP9/AV1) genuinely require a native library this
  * container excludes; their CONTAINER metadata walk is
  * [[graft.catalyst.Mp4Meta]], and their pixel decode stays documented
  * out. Same executor-side `mapPartitions` discipline as the image
  * codec: per-item pure JVM work, payload bytes never leave the task.
  */
object VideoCodec {

  /** Byte length of one well-formed BASELINE JPEG starting at `off`, or
    * -1 when no complete frame starts there. Walks marker segments by
    * their u16 lengths up to SOS, then scans the entropy-coded data for
    * the first marker that is neither a stuffed 0xFF00 nor a restart
    * (FFD0–FFD7) — for a baseline (single-scan) frame that marker is
    * EOI. This is exact, not heuristic: entropy data byte-stuffs every
    * 0xFF, so FFD9 inside a scan cannot be payload. All bounds checks
    * total — a hostile byte string yields -1, never a throw. */
  private def frameLength(b: Array[Byte], off: Int): Int = {
    def u8(p: Int): Int = b(p) & 0xff
    var i = off
    if (i + 2 > b.length || u8(i) != 0xff || u8(i + 1) != 0xd8) return -1
    i += 2
    while (i + 4 <= b.length) {
      if (u8(i) != 0xff) return -1
      val m = u8(i + 1)
      if (m == 0xd8) return -1 // nested SOI: malformed
      if (m == 0xd9) return i + 2 - off // EOI before any scan
      val len = (u8(i + 2) << 8) | u8(i + 3)
      if (len < 2 || i + 2 + len > b.length) return -1
      i += 2 + len
      if (m == 0xda) { // SOS consumed: entropy-coded data follows
        while (i + 2 <= b.length) {
          if (u8(i) == 0xff && u8(i + 1) != 0x00 &&
              (u8(i + 1) < 0xd0 || u8(i + 1) > 0xd7)) {
            return if (u8(i + 1) == 0xd9) i + 2 - off else -1
          }
          i += 1
        }
        return -1 // truncated entropy data
      }
    }
    -1
  }

  /** Split an MJPEG elementary stream into its complete JPEG frame
    * payloads. Garbage between frames is skipped by resync-to-SOI, and
    * a truncated trailing frame is dropped — quarantine semantics
    * (never an exception), mirroring [[ImageCodec.decode]]'s None. */
  def mjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (bytes == null) return Nil
    val out = Seq.newBuilder[Array[Byte]]
    var i = 0
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xd8) {
        val n = frameLength(bytes, i)
        if (n > 0) {
          out += java.util.Arrays.copyOfRange(bytes, i, i + n)
          i += n
        } else i += 1 // no complete frame here — resync forward
      } else i += 1
    }
    out.result()
  }
}
