package graft.ext

/** A FOURTH real raster codec for the multimodal path — 8-bit truecolor PNG,
  * pure-JVM like [[Ppm]]/[[Bmp]]/[[Gif]] (the DEFLATE layer is
  * `java.util.zip.Inflater`/`Deflater`, part of the JDK — no libraries).
  * PNG completes the trap taxonomy the codec family covers: PPM is a raw
  * dump, BMP is layout traps, GIF is dictionary entropy coding; PNG adds
  * the three remaining classes production image decoders deal with, each
  * observable by q208's closed-form oracle:
  *
  *  - **Predictive per-scanline filters** (None/Sub/Up/Average/Paeth): the
  *    encoder cycles through ALL FIVE across rows, so reconstruction must
  *    get the bytes-per-pixel offset, the unsigned modular arithmetic, the
  *    Average floor, and Paeth's a-then-b-then-c tie order right — a
  *    single mis-reconstructed byte propagates through every later row
  *    (filters chain on the RECONSTRUCTED prior row) and lands in the
  *    channel means;
  *  - **Chunk framing**: big-endian lengths/dims, per-chunk CRC32
  *    (validated — a corrupt chunk is a loud parse error, not garbage
  *    pixels), and IDAT SPLITTING: the zlib stream is deliberately cut
  *    into multiple IDAT chunks (real encoders emit 8–64 KB IDATs), so a
  *    decoder that inflates chunks independently instead of concatenating
  *    first fails;
  *  - **Adam7 interlace** (odd ids in q208's corpus): seven passes, each
  *    an INDEPENDENTLY FILTERED sub-image with its own scanline geometry
  *    — wrong pass placement scrambles row order, which whole-image means
  *    cannot see, so the top-half statistic is again the witness column
  *    (the [[Gif]] lesson); empty passes (a pass whose sub-grid is 0-wide
  *    or 0-tall for small images) must contribute NO bytes at all.
  *
  * Pixel model (q208's synthetic corpus): r(x,y) = x + y, g(x,y) = x,
  * b(x,y) = y — none wraps for q208's sizes (max value w+h−2 = 84 at the
  * 46×40 grid corner, far under 256), so
  * mean_r = (w−1)/2 + (h−1)/2, mean_g = (w−1)/2, mean_b = (h−1)/2, and
  * the interlace witness top_r (mean red over the top ⌊h/2⌋ logical rows)
  * = (w−1)/2 + (⌊h/2⌋−1)/2.
  *
  * The encoder is a real PNG writer (per-row filter selection, real
  * DEFLATE via Deflater, chunked IDATs, CRCs), cross-checked against the
  * decoder by roundtrip property tests over arbitrary pixel content plus
  * the arithmetic oracle.
  */
object Png {

  /** Logical image: row-major, top-down, RGB — the [[Bmp.Image]] layout. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  private val Signature =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
  private val Bpp = 3 // 8-bit RGB

  /** Adam7 pass grid: (x0, y0, dx, dy) in storage order — the PNG spec's
    * 8×8 tile stencil. Passes 4 and 6 start at y = 0 (they fill COLUMNS
    * between earlier passes), a classic transcription trap: a grid that
    * staggers every pass in y covers only a fraction of the pixels, which
    * the placement-sum property test below would catch even though a
    * same-grid encoder/decoder pair round-trips on it. */
  private[graft] val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Pass sub-image dims for an image of (w, h); (0, _) / (_, 0) passes are
    * EMPTY and contribute no scanlines (not even filter bytes). */
  private[graft] def passDims(w: Int, h: Int, pass: (Int, Int, Int, Int)): (Int, Int) = {
    val (x0, y0, dx, dy) = pass
    (math.max(0, (w - x0 + dx - 1) / dx), math.max(0, (h - y0 + dy - 1) / dy))
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter one scanline in place of a fresh buffer: `raw` is the
    * reconstructed row, `prior` the reconstructed previous row of the SAME
    * pass (zeros at the pass top). Returns the filtered bytes. */
  private def filterRow(fType: Int, raw: Array[Byte], prior: Array[Byte]): Array[Byte] = {
    val n = raw.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = raw(i) & 0xff
      val a = if (i >= Bpp) raw(i - Bpp) & 0xff else 0
      val b = prior(i) & 0xff
      val c = if (i >= Bpp) prior(i - Bpp) & 0xff else 0
      val pred = fType match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 => paeth(a, b, c)
      }
      out(i) = ((x - pred) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Reconstruct one scanline: inverse of [[filterRow]], writing into
    * `raw` (which the NEXT row reads as its prior). */
  private def unfilterRow(fType: Int, filtered: Array[Byte], at: Int, n: Int,
                          raw: Array[Byte], prior: Array[Byte],
                          fail: String => Nothing): Unit = {
    var i = 0
    while (i < n) {
      val f = filtered(at + i) & 0xff
      val a = if (i >= Bpp) raw(i - Bpp) & 0xff else 0
      val b = prior(i) & 0xff
      val c = if (i >= Bpp) prior(i - Bpp) & 0xff else 0
      val pred = fType match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 => paeth(a, b, c)
        case t => fail(s"bad filter type $t")
      }
      raw(i) = ((f + pred) & 0xff).toByte
      i += 1
    }
  }

  /** The pass list a layout uses: Adam7, or the whole image as one pass. */
  private def passesOf(interlaced: Boolean): Seq[(Int, Int, Int, Int)] =
    if (interlaced) Adam7 else Seq((0, 0, 1, 1))

  /** Deterministic PNG of the given size (pixel model in the object
    * scaladoc); `interlaced` stores the Adam7 layout. */
  def encode(width: Int, height: Int, interlaced: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    val rgb = new Array[Byte](width * height * 3)
    var k = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        rgb(k) = (x + y).toByte; rgb(k + 1) = x.toByte; rgb(k + 2) = y.toByte
        k += 3; x += 1
      }
      y += 1
    }
    encodeWithPixels(width, height, interlaced, rgb)
  }

  /** PNG encode of an arbitrary LOGICAL (top-down row-major) RGB buffer —
    * the property-test seam: arbitrary content exercises every filter's
    * modular arithmetic and defeats trivially-predictable rows. The filter
    * type cycles (pass + row) mod 5, so every encode uses ALL FIVE filter
    * reconstructions on decode. */
  private[graft] def encodeWithPixels(width: Int, height: Int,
                                      interlaced: Boolean,
                                      rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(rgb.length == width * height * 3, "pixel buffer size")
    // ---- filtered scanline stream, pass by pass ----
    val stream = new java.io.ByteArrayOutputStream()
    val passes = passesOf(interlaced)
    var pi = 0
    while (pi < passes.length) {
      val pass @ (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = passDims(width, height, pass)
      if (pw > 0 && ph > 0) {
        val rowLen = pw * Bpp
        var prior = new Array[Byte](rowLen) // zeros above the pass top
        var j = 0
        while (j < ph) {
          val raw = new Array[Byte](rowLen)
          var i = 0
          while (i < pw) {
            val src = ((y0 + j * dy) * width + (x0 + i * dx)) * 3
            raw(i * 3) = rgb(src); raw(i * 3 + 1) = rgb(src + 1); raw(i * 3 + 2) = rgb(src + 2)
            i += 1
          }
          val fType = (pi + j) % 5
          stream.write(fType)
          stream.write(filterRow(fType, raw, prior))
          prior = raw
          j += 1
        }
      }
      pi += 1
    }
    // ---- zlib-compress, then chunk ----
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(stream.toByteArray)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val zbuf = new Array[Byte](4096)
    while (!deflater.finished()) {
      val n = deflater.deflate(zbuf)
      zout.write(zbuf, 0, n)
    }
    deflater.end()
    val z = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val t = typ.getBytes("US-ASCII")
      out.write(t)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    def putBE(at: Int, v: Int): Unit = {
      ihdr(at) = (v >>> 24).toByte; ihdr(at + 1) = (v >>> 16).toByte
      ihdr(at + 2) = (v >>> 8).toByte; ihdr(at + 3) = v.toByte
    }
    putBE(0, width); putBE(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    ihdr(10) = 0 // compression: deflate
    ihdr(11) = 0 // filter method: adaptive (the only one)
    ihdr(12) = if (interlaced) 1 else 0
    chunk("IHDR", ihdr)
    // Split the zlib stream across multiple IDATs (real encoders do; a
    // decoder that inflates per-chunk instead of concatenating fails).
    val IdatMax = 896
    var at = 0
    while (at < z.length) {
      val n = math.min(IdatMax, z.length - at)
      chunk("IDAT", java.util.Arrays.copyOfRange(z, at, at + n))
      at += n
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse one 8-bit truecolor PNG (interlace 0 or 1) into the logical
    * top-down RGB shape: chunk walk with CRC validation, IDAT
    * concatenation, inflate, per-pass unfilter, Adam7 placement.
    * Malformed input throws — the same containment contract as
    * [[Ppm.decode]]/[[Bmp.decode]]/[[Gif.decode]]. */
  def decode(bytes: Array[Byte]): Image = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PNG parse error: $msg")
    if (bytes.length < Signature.length + 12 + 13) fail("shorter than the fixed headers")
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) fail("bad signature"); i += 1
    }
    def be(at: Int): Int =
      ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
        ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)

    var p = Signature.length
    var w = 0; var h = 0; var interlaced = false
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      if (p + 8 > bytes.length) fail("truncated chunk header")
      val len = be(p)
      // bound via subtraction: `p + 12 + len` could overflow Int on a
      // hostile length and slip past a direct comparison
      if (len < 0 || len > bytes.length - 12 - p) fail("chunk past end of file")
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, p + 4, 4 + len)
      if (crc.getValue.toInt != be(p + 8 + len)) fail(s"bad CRC on $typ")
      typ match {
        case "IHDR" =>
          if (sawIhdr) fail("duplicate IHDR")
          if (len != 13) fail(s"IHDR length $len")
          w = be(p + 8); h = be(p + 12)
          if (w <= 0 || h <= 0) fail(s"bad dims $w x $h")
          // keeps every later size product (pass geometry, pixel buffer)
          // inside positive Int/Long range on hostile headers
          if (w > (1 << 24) || h > (1 << 24)) fail(s"unreasonable dims $w x $h")
          if ((bytes(p + 16) & 0xff) != 8) fail("unsupported bit depth (8 only)")
          if ((bytes(p + 17) & 0xff) != 2) fail("unsupported color type (truecolor RGB only)")
          if ((bytes(p + 18) & 0xff) != 0) fail("unsupported compression method")
          if ((bytes(p + 19) & 0xff) != 0) fail("unsupported filter method")
          val il = bytes(p + 20) & 0xff
          if (il > 1) fail(s"unsupported interlace method $il")
          interlaced = il == 1
          sawIhdr = true
        case "IDAT" =>
          if (!sawIhdr) fail("IDAT before IHDR")
          idat.write(bytes, p + 8, len)
        case "IEND" =>
          if (!sawIhdr) fail("IEND before IHDR")
          sawIend = true
        case other =>
          // ancillary chunks (lowercase first letter) are skippable; an
          // unknown CRITICAL chunk is not
          if ((other.charAt(0) & 0x20) == 0) fail(s"unknown critical chunk $other")
      }
      p += 12 + len
    }

    // ---- inflate to the exact expected filtered-stream size ----
    val passes = passesOf(interlaced)
    var expected = 0L
    for (pass <- passes) {
      val (pw, ph) = passDims(w, h, pass)
      if (pw > 0 && ph > 0) expected += ph.toLong * (1L + pw.toLong * Bpp)
    }
    if (expected > Int.MaxValue - 8) fail("image too large")
    val filtered = new Array[Byte](expected.toInt)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < filtered.length && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, filtered.length - got)
        if (n == 0 && inflater.needsDictionary()) fail("preset zlib dictionary unsupported")
        if (n == 0 && inflater.needsInput()) fail("zlib stream truncated")
        got += n
      }
      if (got != filtered.length) fail(s"inflated $got of ${filtered.length} bytes")
      // anything left over means the stream disagrees with the geometry
      val probe = new Array[Byte](1)
      if (!inflater.finished() && inflater.inflate(probe) > 0)
        fail("zlib stream longer than the scanline geometry")
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"bad zlib data: ${e.getMessage}")
    } finally inflater.end()

    // ---- per-pass unfilter + placement ----
    val px = new Array[Byte](w * h * 3)
    var at = 0
    var pi = 0
    while (pi < passes.length) {
      val pass @ (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = passDims(w, h, pass)
      if (pw > 0 && ph > 0) {
        val rowLen = pw * Bpp
        var prior = new Array[Byte](rowLen)
        var raw = new Array[Byte](rowLen)
        var j = 0
        while (j < ph) {
          val fType = filtered(at) & 0xff
          at += 1
          unfilterRow(fType, filtered, at, rowLen, raw, prior, fail)
          at += rowLen
          var i2 = 0
          while (i2 < pw) {
            val dst = ((y0 + j * dy) * w + (x0 + i2 * dx)) * 3
            px(dst) = raw(i2 * 3); px(dst + 1) = raw(i2 * 3 + 1); px(dst + 2) = raw(i2 * 3 + 2)
            i2 += 1
          }
          val t = prior; prior = raw; raw = t
          j += 1
        }
      }
      pi += 1
    }
    Image(w, h, px)
  }

  /** Per-channel means over the decoded pixels (unsigned bytes). */
  def channelMeans(img: Image): (Double, Double, Double) =
    Raster.channelMeans(img.pixels)

  /** Mean red over the TOP ⌊h/2⌋ logical rows — the Adam7 witness:
    * whole-image means are placement-invariant, so this is the statistic
    * that breaks if pass geometry puts rows in the wrong place. */
  def topHalfRedMean(img: Image): Double =
    Raster.topRowsChannelMean(img.pixels, img.width, img.height / 2, 0)
}
