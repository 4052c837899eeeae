package graft.ext

/** A REAL image codec for the multimodal path — binary P6 PPM, the one
  * raster format decodable with zero codec libraries (pure header parse +
  * raw RGB bytes). [[Multimodal.fakeDecode]] remains the documented stand-in
  * for formats that genuinely need codecs (JPEG/MP4); this module is the
  * existence proof that the pipeline's batch-decode plumbing carries a real
  * decoder unchanged: parse errors, pixel scans, and resampling all happen
  * on executor-side byte arrays.
  *
  * Encoder pixel model (used by q140's synthetic corpus): row-major RGB with
  * r = x mod 256, g = y mod 256, b = (x+y) mod 256 — chosen so channel
  * means have CLOSED FORMS in (w, h) that a SQL oracle can compute without
  * decoding: for w+h ≤ 257 no value wraps, so mean_r = (w−1)/2,
  * mean_g = (h−1)/2, mean_b = (w+h−2)/2, and after a nearest-neighbor
  * resize to 32×32 the means are averages of the 32 mapped source
  * coordinates. A misparsed header (wrong offset, swapped dims) shifts the
  * channel phase or geometry and breaks those identities — which is what
  * makes the closed forms a real end-to-end decode check, not a tautology.
  */
object Ppm {

  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  /** Deterministic P6 image of the given size (see pixel model above). */
  def encode(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        out(o) = (x % 256).toByte
        out(o + 1) = (y % 256).toByte
        out(o + 2) = ((x + y) % 256).toByte
        o += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse one P6 image: magic, whitespace/`#` comments, width, height,
    * maxval 255, single whitespace, then exactly w·h·3 raw bytes. Malformed
    * input throws — the batch decoder's error containment is the caller's
    * policy (q140 maps clean synthetic media; an ingest pipeline would wrap
    * this in a try and route rejects to a quarantine column). */
  def decode(bytes: Array[Byte]): Image = {
    var pos = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"PPM parse error at byte $pos: $msg")
    def skipSpaceAndComments(): Unit = {
      var going = true
      while (going && pos < bytes.length) {
        val b = bytes(pos) & 0xff
        if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else going = false
      }
    }
    def readInt(): Int = {
      skipSpaceAndComments()
      if (pos >= bytes.length || bytes(pos) < '0' || bytes(pos) > '9')
        fail("expected integer")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > (1 << 24)) fail("integer out of range")
        pos += 1
      }
      v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') fail("not P6")
    pos = 2
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    if (maxval != 255) fail(s"unsupported maxval $maxval")
    if (w == 0 || h == 0) fail("zero-dimension image")
    // exactly ONE whitespace byte separates the header from pixel data
    if (pos >= bytes.length || !isSpace(bytes(pos))) fail("missing pixel separator")
    pos += 1
    // Long math: w and h are each <= 2^24, so w*h*3 can overflow Int and a
    // crafted header could alias need == leftover bytes — validate unwrapped.
    val need = w.toLong * h * 3
    if ((bytes.length - pos).toLong != need)
      fail(s"expected $need pixel bytes, have ${bytes.length - pos}")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  /** Per-channel means over the raw pixel scan (unsigned bytes). */
  def channelMeans(img: Image): (Double, Double, Double) =
    Raster.channelMeans(img.pixels)

  /** Nearest-neighbor resample: output pixel (ix, iy) reads source
    * (⌊ix·w/ow⌋, ⌊iy·h/oh⌋) — the standard vision-preprocessor downsample,
    * actually moving pixel bytes (not just metadata arithmetic). */
  def resizeNearest(img: Image, ow: Int, oh: Int): Image = {
    require(ow > 0 && oh > 0, "empty target")
    val out = new Array[Byte](ow * oh * 3)
    var iy = 0
    while (iy < oh) {
      val sy = (iy.toLong * img.height / oh).toInt
      var ix = 0
      while (ix < ow) {
        val sx = (ix.toLong * img.width / ow).toInt
        val so = (sy * img.width + sx) * 3
        val oo = (iy * ow + ix) * 3
        out(oo) = img.pixels(so)
        out(oo + 1) = img.pixels(so + 1)
        out(oo + 2) = img.pixels(so + 2)
        ix += 1
      }
      iy += 1
    }
    Image(ow, oh, out)
  }
}
