package graft.ext

/** A REAL video container for the multimodal path — YUV4MPEG2 (y4m), the
  * uncompressed interchange format every video toolchain can emit, and the
  * one "video codec" decodable with zero libraries: an ASCII stream header,
  * then `FRAME\n`-delimited raw I420 planes. Completes the codec-free
  * trio ([[Ppm]] raster, [[Wav]] waveform): frame demux, plane geometry,
  * and per-frame pixel scans all run on executor byte arrays.
  *
  * Encoder pixel model (q142's synthetic corpus): frame f's luma plane is
  * y(x, y) = x + y + 10·f with chroma fixed at neutral 128. Dimensions are
  * bounded (w ≤ 64, h ≤ 48, f < 8) so no value reaches 256 — every
  * per-frame luma mean has the CLOSED FORM (w−1)/2 + (h−1)/2 + 10f that a
  * SQL oracle computes without decoding. A frame-boundary slip, plane-size
  * error, or luma/chroma mixup breaks the identity. */
object Y4m {

  final case class Frame(luma: Array[Byte])
  final case class Video(width: Int, height: Int, frames: Seq[Frame])

  /** Deterministic y4m stream: `nFrames` I420 frames of the pixel model. */
  def encode(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0, "empty video")
    require(width % 2 == 0 && height % 2 == 0, "I420 needs even dimensions")
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    val ySize = width * height
    val cSize = (width / 2) * (height / 2)
    val out = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (frameMark.length + ySize + 2 * cSize))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put(frameMark)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out.put((x + y + 10 * f).toByte); x += 1 }
        y += 1
      }
      var c = 0
      while (c < 2 * cSize) { out.put(128.toByte); c += 1 }
      f += 1
    }
    out.array()
  }

  /** Parse a y4m stream: the `YUV4MPEG2` signature line (W/H/C tags; only
    * C420 accepted, which is also the spec default), then demux every
    * `FRAME` (parameters after FRAME are legal and skipped) into its luma
    * plane; chroma planes are validated for size and skipped. */
  def decode(bytes: Array[Byte]): Video = {
    def fail(msg: String) = throw new IllegalArgumentException(s"y4m parse error: $msg")
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      if (pos >= bytes.length) fail("unterminated header line")
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = readLine()
    if (!header.startsWith("YUV4MPEG2")) fail("missing YUV4MPEG2 signature")
    var w = -1; var h = -1; var colorspace = "C420"
    header.split(' ').drop(1).foreach { tag =>
      if (tag.startsWith("W")) w = tag.drop(1).toInt
      else if (tag.startsWith("H")) h = tag.drop(1).toInt
      else if (tag.startsWith("C")) colorspace = tag
    }
    if (w <= 0 || h <= 0) fail(s"missing/invalid dimensions W$w H$h")
    // Magnitude bound: unbounded header dims would overflow the plane sizes
    // below (2^16 × 2^16 luma wraps to 0) and defeat the truncation check.
    if (w > (1 << 14) || h > (1 << 14)) fail(s"dimensions W$w H$h out of range")
    if (colorspace != "C420" && colorspace != "C420jpeg" && colorspace != "C420mpeg2")
      fail(s"unsupported colorspace $colorspace")
    // 4:2:0 subsampling needs even dimensions (encode enforces the same);
    // accepting odd W/H here would floor the chroma plane size and silently
    // misalign every subsequent frame boundary.
    if (w % 2 != 0 || h % 2 != 0)
      fail(s"odd dimensions W$w H$h unsupported for $colorspace")
    val ySize = w * h
    val cSize = (w / 2) * (h / 2)
    val frames = Seq.newBuilder[Frame]
    while (pos < bytes.length) {
      val mark = readLine()
      if (!mark.startsWith("FRAME")) fail(s"expected FRAME, got '$mark'")
      if (bytes.length - pos < ySize + 2 * cSize) fail("truncated frame planes")
      frames += Frame(java.util.Arrays.copyOfRange(bytes, pos, pos + ySize))
      pos += ySize + 2 * cSize
    }
    val fs = frames.result()
    if (fs.isEmpty) fail("no frames")
    Video(w, h, fs)
  }

  /** Mean luma of one frame (unsigned bytes) — the brightness statistic
    * shot-boundary detectors and quality filters compute per frame. */
  def lumaMean(frame: Frame): Double = {
    var s = 0L
    var i = 0
    while (i < frame.luma.length) { s += frame.luma(i) & 0xff; i += 1 }
    s.toDouble / frame.luma.length
  }
}
