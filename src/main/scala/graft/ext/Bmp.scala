package graft.ext

/** A second REAL raster codec for the multimodal path — uncompressed
  * 24-bpp Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + BI_RGB pixel
  * array), pure-JVM like [[Ppm]]. Where P6 PPM is the MINIMAL raster format
  * (ASCII header + raw RGB), BMP is the one with the classic decode traps a
  * real pipeline must get right, and this codec exists to prove the
  * batch-decode plumbing carries them:
  *
  *  - rows are stored BOTTOM-UP when biHeight > 0 (the common case) and
  *    top-down when biHeight < 0 — a decoder that forgets the flip returns
  *    a vertically mirrored image;
  *  - pixels are BGR, not RGB — a decoder that forgets the swap transposes
  *    the red and blue channels;
  *  - every row is padded to a 4-byte boundary — a decoder that ignores the
  *    stride shears the image after the first row whenever 3·w mod 4 ≠ 0;
  *  - the pixel array starts at bfOffBits, which need not be 54 — extra
  *    header/palette bytes are legal and must be skipped via the offset,
  *    not assumed away.
  *
  * [[decode]] normalizes all of that away and returns the same logical
  * shape as [[Ppm.Image]]: row-major top-down RGB.
  *
  * Encoder pixel model (q206's synthetic corpus): LOGICAL pixel (x, y) has
  * r = x mod 256, g = y mod 256, b = (x+y) mod 256 — the [[Ppm]] model, so
  * channel means keep their closed forms (mean_r = (w−1)/2,
  * mean_g = (h−1)/2, mean_b = (w+h−2)/2 when w+h ≤ 257). Because whole-
  * image channel means are invariant to row order, they CANNOT catch a
  * missed bottom-up flip — the top-half green mean ((h/2 − 1)/2 for even h,
  * vs (3h/2 − 1)/2·… for a mirrored decode) is the statistic that does, and
  * q206 reports it for exactly that reason. File length has the closed form
  * 54 + h · ceil4(3w) (ceil4(n) = ((n+3)/4)·4), so a truncated or over-
  * padded write also breaks the oracle.
  */
object Bmp {

  /** Logical image: row-major, TOP-DOWN, RGB (the [[Ppm.Image]] layout). */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  private val FileHeaderLen = 14
  private val InfoHeaderLen = 40
  private val PixelOffset = FileHeaderLen + InfoHeaderLen

  private def rowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Deterministic 24-bpp bottom-up BMP of the given size (pixel model in
    * the object scaladoc). */
  def encode(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val stride = rowStride(width)
    val fileSize = PixelOffset + stride * height
    val out = new Array[Byte](fileSize)
    def u32(at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte
      out(at + 1) = ((v >>> 8) & 0xff).toByte
      out(at + 2) = ((v >>> 16) & 0xff).toByte
      out(at + 3) = ((v >>> 24) & 0xff).toByte
    }
    def u16(at: Int, v: Int): Unit = {
      out(at) = (v & 0xff).toByte
      out(at + 1) = ((v >>> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    u32(2, fileSize)
    u32(10, PixelOffset)
    u32(14, InfoHeaderLen)
    u32(18, width)
    u32(22, height) // positive: bottom-up
    u16(26, 1) // planes
    u16(28, 24) // bpp
    u32(30, 0) // BI_RGB
    u32(34, stride * height)
    // resolutions + palette counts stay zero
    var y = 0
    while (y < height) {
      // logical row y lands at storage row (height - 1 - y): bottom-up
      var o = PixelOffset + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        out(o) = ((x + y) % 256).toByte // B
        out(o + 1) = (y % 256).toByte // G
        out(o + 2) = (x % 256).toByte // R
        o += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse one uncompressed 24-bpp BMP into the logical top-down RGB shape.
    * Handles bottom-up (biHeight > 0) and top-down (biHeight < 0) storage,
    * row padding, and a bfOffBits beyond the 54-byte headers. Malformed
    * input throws, same containment contract as [[Ppm.decode]]. */
  def decode(bytes: Array[Byte]): Image = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"BMP parse error: $msg")
    def u32(at: Int): Int =
      (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8) |
        ((bytes(at + 2) & 0xff) << 16) | ((bytes(at + 3) & 0xff) << 24)
    def u16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    if (bytes.length < PixelOffset) fail("shorter than the two headers")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("not BM")
    val offBits = u32(10)
    if (u32(14) < InfoHeaderLen) fail(s"info header ${u32(14)} < $InfoHeaderLen")
    val w = u32(18)
    val rawH = u32(22)
    val topDown = rawH < 0
    val h = if (topDown) -rawH else rawH
    if (u16(26) != 1) fail(s"planes ${u16(26)}")
    if (u16(28) != 24) fail(s"unsupported bpp ${u16(28)} (24 only)")
    if (u32(30) != 0) fail(s"unsupported compression ${u32(30)} (BI_RGB only)")
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) fail(s"bad dims $w x $rawH")
    val stride = rowStride(w)
    // Long math: a crafted header could overflow Int in offset + stride·h.
    if (offBits < PixelOffset || offBits.toLong + stride.toLong * h > bytes.length)
      fail(s"pixel array [$offBits, +${stride.toLong * h}) outside ${bytes.length} bytes")
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var s = offBits + srcRow * stride
      var d = y * w * 3
      var x = 0
      while (x < w) {
        px(d) = bytes(s + 2) // R from BGR
        px(d + 1) = bytes(s + 1)
        px(d + 2) = bytes(s)
        s += 3
        d += 3
        x += 1
      }
      y += 1
    }
    Image(w, h, px)
  }

  /** Per-channel means over the decoded pixels (unsigned bytes). */
  def channelMeans(img: Image): (Double, Double, Double) =
    Raster.channelMeans(img.pixels)

  /** Mean green over the TOP ⌊h/2⌋ logical rows — the row-order witness:
    * whole-image means are row-order-invariant, so this is the statistic
    * that catches a missed bottom-up flip (see object scaladoc). */
  def topHalfGreenMean(img: Image): Double =
    Raster.topRowsChannelMean(img.pixels, img.width, img.height / 2, 1)
}
