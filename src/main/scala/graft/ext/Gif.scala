package graft.ext

/** A third REAL raster codec for the multimodal path — GIF87a with genuine
  * LZW decompression, pure-JVM like [[Ppm]] and [[Bmp]]. Where PPM is a raw
  * byte dump and BMP's traps are layout-level (flip/BGR/stride/offset), GIF
  * is the first format in the trio whose pixel array is ENTROPY-CODED: the
  * decoder must run variable-width LZW (9→12-bit codes, clear/EOI codes,
  * the KwKwK self-reference case, code-width growth in lockstep with the
  * dictionary) over a sub-block-chunked byte stream, and optionally undo
  * the 4-pass interlace row order. Each trap is observable by q207's
  * closed-form oracle:
  *
  *  - a mis-stepped code width or off-by-one dictionary desyncs the stream
  *    within a few codes — every downstream pixel (and so every mean) is
  *    wrong;
  *  - the KwKwK case (code == next table entry) appears whenever a run
  *    repeats immediately, which the diagonal pixel ramp guarantees;
  *  - interlaced files (id odd in q207's corpus) store rows in 8/8/4/2
  *    passes — whole-image means are row-order-invariant, so the top-half
  *    statistic is the column that breaks if deinterlacing is skipped.
  *
  * Pixel model (q207's synthetic corpus): index(x, y) = x + y (never wraps:
  * w + h ≤ 255 enforced at encode), global palette entry i =
  * (r = i, g = i + 85, b = i + 170) — all without wrap for the q207 sizes,
  * though blue's margin is exactly ONE (max index 84 at the 46×40 grid
  * corner vs the i + 170 wrap at 86 — re-check before widening the grid),
  * so mean_r = (w−1)/2 + (h−1)/2, mean_g = mean_r + 85, mean_b =
  * mean_r + 170, and the interlace witness top_r (mean red over the top
  * ⌊h/2⌋ logical rows) = (w−1)/2 + (⌊h/2⌋−1)/2.
  *
  * The encoder is a real LZW compressor (dictionary build, width growth,
  * table-full clear), not the fixed-width "uncompressed GIF" trick — the
  * decoder is therefore exercised on real dictionary references, and the
  * two are cross-checked by roundtrip property tests plus the arithmetic
  * oracle.
  */
object Gif {

  /** Logical image: row-major, top-down, RGB — the [[Bmp.Image]] layout. */
  final case class Image(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3,
      s"pixel buffer ${pixels.length} != $width x $height x 3")
  }

  private val Header = "GIF87a".getBytes("US-ASCII")
  private val MinCodeSize = 8 // 256-entry palette → 9-bit initial codes
  private val ClearCode = 1 << MinCodeSize
  private val EoiCode = ClearCode + 1
  private val MaxCode = 4096

  private def paletteR(i: Int): Int = i
  private def paletteG(i: Int): Int = (i + 85) & 0xff
  private def paletteB(i: Int): Int = (i + 170) & 0xff

  /** GIF87a interlace storage order: pass 1 rows 0,8,16…, pass 2 rows
    * 4,12,…, pass 3 rows 2,6,…, pass 4 rows 1,3,5,… Returns the logical
    * row index of each stored row, in storage order. */
  private[graft] def interlaceRows(height: Int): Array[Int] = {
    val out = new Array[Int](height)
    var k = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < height) { out(k) = y; k += 1; y += step }
    }
    out
  }

  /** LSB-first bit packer emitting 255-byte-max GIF sub-blocks. */
  private final class BitPacker {
    private val bytes = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code << nBits
      nBits += width
      while (nBits >= 8) {
        bytes.write(cur & 0xff)
        cur >>>= 8
        nBits -= 8
      }
    }
    def subBlocks(): Array[Byte] = {
      if (nBits > 0) { bytes.write(cur & 0xff); cur = 0; nBits = 0 }
      val raw = bytes.toByteArray
      val out = new java.io.ByteArrayOutputStream(raw.length + raw.length / 255 + 2)
      var i = 0
      while (i < raw.length) {
        val n = math.min(255, raw.length - i)
        out.write(n)
        out.write(raw, i, n)
        i += n
      }
      out.write(0) // block terminator
      out.toByteArray
    }
  }

  /** Real LZW compression of the index stream (variable width, dictionary
    * keyed (prefixCode, byte), clear-and-reset when the table fills). */
  private def lzwEncode(indices: Array[Byte]): Array[Byte] = {
    val packer = new BitPacker
    var codeSize = MinCodeSize + 1
    var next = EoiCode + 1
    // (prefixCode << 8 | byte) -> code; cleared on reset
    var table = new java.util.HashMap[Integer, Integer](4096)
    def reset(): Unit = { table = new java.util.HashMap(4096); codeSize = MinCodeSize + 1; next = EoiCode + 1 }
    packer.put(ClearCode, codeSize)
    var prefix = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((prefix << 8) | k)
      val hit = table.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        packer.put(prefix, codeSize)
        table.put(key, Integer.valueOf(next))
        next += 1
        // the decoder bumps width when ITS table (one entry behind ours)
        // reaches 2^w — that is exactly next − 1 here
        if (next - 1 == (1 << codeSize) && codeSize < 12) codeSize += 1
        if (next == MaxCode) { packer.put(ClearCode, codeSize); reset() }
        prefix = k
      }
      i += 1
    }
    packer.put(prefix, codeSize)
    packer.put(EoiCode, codeSize)
    packer.subBlocks()
  }

  /** Deterministic GIF87a of the given size (pixel model in the object
    * scaladoc); `interlaced` stores rows in the 4-pass order. */
  def encode(width: Int, height: Int, interlaced: Boolean): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(width + height <= 255, s"pixel model wraps at $width x $height")
    val logical = new Array[Byte](width * height)
    var k = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { logical(k) = (x + y).toByte; k += 1; x += 1 }
      y += 1
    }
    encodeWithIndices(width, height, interlaced, logical)
  }

  /** GIF87a encode of an arbitrary LOGICAL (top-down row-major) palette
    * index stream — the property-test seam: random noise defeats LZW
    * matching, so a large-enough image drives the dictionary through every
    * width step and the table-full clear. */
  private[graft] def encodeWithIndices(width: Int, height: Int,
                                     interlaced: Boolean,
                                     logical: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, "empty image")
    require(logical.length == width * height, "index buffer size")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Header)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    u16(width); u16(height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0) // background color index
    out.write(0) // no aspect ratio
    var i = 0
    while (i < 256) {
      out.write(paletteR(i)); out.write(paletteG(i)); out.write(paletteB(i))
      i += 1
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(if (interlaced) 0x40 else 0x00)
    // reorder the logical rows into STORAGE row order
    val indices = new Array[Byte](width * height)
    val rows = if (interlaced) interlaceRows(height)
               else Array.tabulate(height)(identity)
    var r = 0
    while (r < rows.length) {
      System.arraycopy(logical, rows(r) * width, indices, r * width, width)
      r += 1
    }
    out.write(MinCodeSize)
    out.write(lzwEncode(indices))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse one GIF87a (256-entry global palette, single image, no
    * extensions) into the logical top-down RGB shape: LZW decode,
    * deinterlace if flagged, palette-map. Malformed input throws — the
    * same containment contract as [[Ppm.decode]]/[[Bmp.decode]]. */
  def decode(bytes: Array[Byte]): Image = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"GIF parse error: $msg")
    // + 2: the min-code-size byte and the first sub-block length live
    // right after the 10-byte image descriptor — a file cut exactly there
    // must be a parse error, not a raw ArrayIndexOutOfBoundsException
    if (bytes.length < 13 + 768 + 10 + 2) fail("shorter than the fixed headers")
    var i = 0
    while (i < 6) { if (bytes(i) != Header(i)) fail("not GIF87a"); i += 1 }
    def u16(at: Int): Int = (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
    val packed = bytes(10) & 0xff
    if ((packed & 0x80) == 0) fail("no global color table")
    val gctSize = 2 << (packed & 0x07)
    if (gctSize != 256) fail(s"unsupported palette size $gctSize (256 only)")
    val gctAt = 13
    var p = gctAt + 3 * 256
    if ((bytes(p) & 0xff) != 0x2c)
      fail(f"expected image descriptor, got 0x${bytes(p) & 0xff}%02x")
    val w = u16(p + 5)
    val h = u16(p + 7)
    if (u16(p + 1) != 0 || u16(p + 3) != 0) fail("nonzero image offset")
    if (w <= 0 || h <= 0) fail(s"bad dims $w x $h")
    val idPacked = bytes(p + 9) & 0xff
    if ((idPacked & 0x80) != 0) fail("local color table unsupported")
    val interlaced = (idPacked & 0x40) != 0
    p += 10
    val minCode = bytes(p) & 0xff
    if (minCode != MinCodeSize) fail(s"unsupported min code size $minCode")
    p += 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var blockLen = bytes(p) & 0xff
    while (blockLen != 0) {
      if (p + 1 + blockLen > bytes.length) fail("sub-block past end of file")
      data.write(bytes, p + 1, blockLen)
      p += 1 + blockLen
      if (p >= bytes.length) fail("missing block terminator")
      blockLen = bytes(p) & 0xff
    }
    if (p + 1 >= bytes.length || (bytes(p + 1) & 0xff) != 0x3b)
      fail("missing trailer")
    val stream = data.toByteArray

    // ---- LZW decode ----
    val nPixels = w * h
    val indices = new Array[Byte](nPixels)
    var written = 0
    // dictionary as (prefix link, last byte); roots are implicit
    val prefixOf = new Array[Int](MaxCode)
    val lastOf = new Array[Byte](MaxCode)
    val buf = new Array[Byte](MaxCode) // expansion scratch (max string len)
    var codeSize = MinCodeSize + 1
    var next = EoiCode + 1
    var prev = -1
    var bitPos = 0
    val totalBits = stream.length * 8
    def readCode(): Int = {
      if (bitPos + codeSize > totalBits) fail("code stream exhausted")
      var v = 0
      var got = 0
      var bp = bitPos
      while (got < codeSize) {
        val byte = stream(bp >> 3) & 0xff
        val avail = 8 - (bp & 7)
        val take = math.min(avail, codeSize - got)
        v |= ((byte >> (bp & 7)) & ((1 << take) - 1)) << got
        got += take
        bp += take
      }
      bitPos = bp
      v
    }
    def emit(code: Int, extra: Int): Int = {
      // expand `code`, plus `extra` (≥0: the KwKwK first byte) — returns
      // the FIRST byte of the expansion
      var len = 0
      var c = code
      while (c >= ClearCode + 2) {
        if (c >= next) fail(s"dangling code $c")
        buf(len) = lastOf(c); len += 1
        c = prefixOf(c)
        if (len > MaxCode - 1) fail("corrupt dictionary cycle")
      }
      val first = c // a root
      if (written + len + 1 + (if (extra >= 0) 1 else 0) > nPixels)
        fail("more pixels than width x height")
      indices(written) = first.toByte; written += 1
      var j = len - 1
      while (j >= 0) { indices(written) = buf(j); written += 1; j -= 1 }
      if (extra >= 0) { indices(written) = extra.toByte; written += 1 }
      first
    }
    var done = false
    while (!done) {
      val code = readCode()
      if (code == ClearCode) {
        codeSize = MinCodeSize + 1; next = EoiCode + 1; prev = -1
      } else if (code == EoiCode) {
        done = true
      } else if (prev < 0) {
        if (code >= ClearCode) fail(s"first code $code is not a root")
        emit(code, -1)
        prev = code
      } else {
        if (code > next) fail(s"code $code beyond table $next")
        var firstByte = 0
        if (code == next) {
          // KwKwK: prev's expansion followed by its own first byte
          val f = firstOf(prev, prefixOf)
          firstByte = emit(prev, f)
        } else {
          firstByte = emit(code, -1)
        }
        if (next < MaxCode) {
          prefixOf(next) = prev
          lastOf(next) = firstByte.toByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (written != nPixels) fail(s"decoded $written of $nPixels pixels")

    // ---- deinterlace + palette map ----
    val px = new Array[Byte](nPixels * 3)
    val rows = if (interlaced) interlaceRows(h)
               else Array.tabulate(h)(identity)
    var r = 0
    while (r < h) {
      val y = rows(r)
      var s = r * w
      var d = y * w * 3
      var x = 0
      while (x < w) {
        val idx = indices(s) & 0xff
        // ALL THREE channels come from the file's actual global color
        // table — a decoder must honor the palette it was handed, not the
        // synthetic ramp this repo's encoder happens to write (the two
        // agree on the q207 corpus, which is why a formula-for-red slip
        // here was invisible to every round-trip test)
        px(d) = bytes(gctAt + 3 * idx)
        px(d + 1) = bytes(gctAt + 3 * idx + 1)
        px(d + 2) = bytes(gctAt + 3 * idx + 2)
        s += 1
        d += 3
        x += 1
      }
      r += 1
    }
    Image(w, h, px)
  }

  /** First byte of a code's expansion (root chase through the links). */
  private def firstOf(code: Int, prefixOf: Array[Int]): Int = {
    var c = code
    while (c >= ClearCode + 2) c = prefixOf(c)
    c
  }

  /** Per-channel means over the decoded pixels (unsigned bytes). */
  def channelMeans(img: Image): (Double, Double, Double) =
    Raster.channelMeans(img.pixels)

  /** Mean red over the TOP ⌊h/2⌋ logical rows — the interlace witness:
    * whole-image means are row-order-invariant, so this is the statistic
    * that breaks if the 4-pass deinterlace is skipped. */
  def topHalfRedMean(img: Image): Double =
    Raster.topRowsChannelMean(img.pixels, img.width, img.height / 2, 0)
}
