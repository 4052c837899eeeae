package graft

import graft.ext.Png

/** The real PNG codec behind q208: chunk framing + CRC validation,
  * multi-IDAT zlib reassembly, all five predictive scanline filters,
  * Adam7 interlace geometry (incl. empty passes), malformed-input
  * containment, and the closed forms the oracle computes. */
class PngSpec extends SparkSpec {

  test("encode/decode round-trip: filtered + deflated scanlines come back as the logical RGB image") {
    for (il <- Seq(false, true)) {
      val img = Png.decode(Png.encode(7, 6, interlaced = il))
      assert(img.width == 7 && img.height == 6)
      for (y <- 0 until 6; x <- 0 until 7) {
        val o = (y * 7 + x) * 3
        assert((img.pixels(o) & 0xff) == x + y, s"r at ($x,$y) il=$il")
        assert((img.pixels(o + 1) & 0xff) == x, s"g at ($x,$y) il=$il")
        assert((img.pixels(o + 2) & 0xff) == y, s"b at ($x,$y) il=$il")
      }
    }
  }

  test("Adam7 storage decodes to the SAME logical image; pass geometry matches the spec grid") {
    val plain = Png.decode(Png.encode(20, 17, interlaced = false))
    val inter = Png.decode(Png.encode(20, 17, interlaced = true))
    assert(plain.pixels.toSeq == inter.pixels.toSeq,
      "interlace must be a pure storage-order concern")
    val topR = Png.topHalfRedMean(inter)
    assert(topR == (20 - 1) / 2.0 + (17 / 2 - 1) / 2.0, s"top_r $topR")
    // spec pass dims for 20 x 17: ceil arithmetic per (x0, y0, dx, dy)
    assert(Png.Adam7.map(Png.passDims(20, 17, _)) ==
      Seq((3, 3), (2, 3), (5, 2), (5, 5), (10, 4), (10, 9), (20, 8)))
    // every pixel is placed exactly once: pass areas sum to w*h
    assert(Png.Adam7.map(Png.passDims(20, 17, _)).map { case (a, b) => a * b }.sum == 20 * 17)
  }

  test("closed-form channel means hold across the q208 size grid") {
    for (id <- Seq(0L, 1L, 7L, 30L, 24L, 1999L)) {
      val w = (16 + id % 31).toInt
      val h = (16 + id % 25).toInt
      val img = Png.decode(Png.encode(w, h, interlaced = id % 2 == 1))
      val (r, g, b) = Png.channelMeans(img)
      assert(r == (w + h - 2) / 2.0, s"mean_r $r at $w x $h")
      assert(g == (w - 1) / 2.0 && b == (h - 1) / 2.0, s"ramp means at $w x $h")
      assert(Png.topHalfRedMean(img) == (w - 1) / 2.0 + (h / 2 - 1) / 2.0)
    }
  }

  test("empty Adam7 passes contribute no bytes: tiny images round-trip interlaced") {
    // for w or h < 5, several of the seven passes have a 0-wide or 0-tall
    // sub-grid; a decoder that still consumes a filter byte for them
    // desyncs the stream immediately
    for ((w, h) <- Seq((1, 1), (1, 2), (2, 1), (3, 2), (4, 4), (5, 3), (8, 1), (1, 8))) {
      val img = Png.decode(Png.encode(w, h, interlaced = true))
      assert(img.width == w && img.height == h, s"dims at $w x $h")
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert((img.pixels(o) & 0xff) == x + y, s"r at ($x,$y) of $w x $h")
      }
    }
  }

  test("all five filter types survive arbitrary content (the filter-arithmetic seam)") {
    // random bytes defeat prediction, so Sub/Up/Average/Paeth all produce
    // non-trivial residuals whose unsigned modular reconstruction must be
    // exact; h >= 5 guarantees every filter type appears at least once
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 3) {
      val (w, h) = (41, 23)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val img = Png.decode(Png.encodeWithPixels(w, h, trial % 2 == 1, rgb))
      assert(img.pixels.toSeq == rgb.toSeq, s"trial $trial: pixel mismatch")
    }
  }

  test("multi-IDAT: incompressible content splits the zlib stream and the decoder reassembles it") {
    val rnd = new scala.util.Random(7L)
    val (w, h) = (60, 40)
    val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
    val bytes = Png.encodeWithPixels(w, h, interlaced = false, rgb)
    // count IDAT chunks by walking the frame
    def be(at: Int): Int =
      ((bytes(at) & 0xff) << 24) | ((bytes(at + 1) & 0xff) << 16) |
        ((bytes(at + 2) & 0xff) << 8) | (bytes(at + 3) & 0xff)
    var p = 8
    var idats = 0
    var total = 8
    while (p < bytes.length) {
      val len = be(p)
      if (new String(bytes, p + 4, 4, "US-ASCII") == "IDAT") idats += 1
      total += 12 + len
      p += 12 + len
    }
    assert(idats >= 2, s"expected a split zlib stream, got $idats IDAT chunks")
    assert(total == bytes.length, "chunk framing accounts for every byte")
    assert(Png.decode(bytes).pixels.toSeq == rgb.toSeq)
  }

  test("ancillary chunks are skipped; unknown critical chunks and bad CRCs are loud") {
    val good = Png.encode(10, 10, interlaced = false)
    def withChunkAfterIhdr(typ: String): Array[Byte] = {
      val data = "graft".getBytes("US-ASCII")
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      val extra = new java.io.ByteArrayOutputStream()
      def be(v: Int): Unit = {
        extra.write(v >>> 24); extra.write((v >>> 16) & 0xff)
        extra.write((v >>> 8) & 0xff); extra.write(v & 0xff)
      }
      be(data.length); extra.write(t); extra.write(data); be(crc.getValue.toInt)
      val at = 8 + 12 + 13 // right after IHDR
      good.take(at) ++ extra.toByteArray ++ good.drop(at)
    }
    // lowercase first letter = ancillary = skippable
    assert(Png.decode(withChunkAfterIhdr("tEXt")).width == 10)
    // uppercase first letter = critical = must fail
    intercept[Exception](Png.decode(withChunkAfterIhdr("TEXT")))
    def bad(mutate: Array[Byte] => Unit): Unit = {
      val b = good.clone()
      mutate(b)
      intercept[Exception](Png.decode(b))
    }
    bad(b => b(0) = 'X')                         // bad signature
    bad { b =>                                   // hostile chunk length (Int-overflow bait)
      b(8 + 25) = 0x7f.toByte; b(8 + 25 + 1) = 0xff.toByte
      b(8 + 25 + 2) = 0xff.toByte; b(8 + 25 + 3) = 0xff.toByte
    }
    bad(b => b(8 + 12 + 13 + 12 + 10) = (b(8 + 12 + 13 + 12 + 10) ^ 1).toByte) // IDAT data bit flip -> bad CRC
    bad(b => b(8 + 8 + 9) = 3)                   // palette color type unsupported
    intercept[Exception](Png.decode(good.take(good.length - 4))) // truncated IEND
    intercept[Exception](Png.decode(good.take(40)))              // truncated IDAT
  }

  test("geometry lies are loud: a height edit with a fixed-up CRC fails the inflate accounting") {
    val good = Png.encode(12, 9, interlaced = false)
    val b = good.clone()
    // IHDR data starts at 16; height is bytes 20-23 (big-endian)
    b(8 + 8 + 7) = 10 // height 9 -> 10
    val crc = new java.util.zip.CRC32()
    crc.update(b, 8 + 4, 4 + 13)
    val v = crc.getValue.toInt
    b(8 + 8 + 13) = (v >>> 24).toByte
    b(8 + 8 + 13 + 1) = (v >>> 16).toByte
    b(8 + 8 + 13 + 2) = (v >>> 8).toByte
    b(8 + 8 + 13 + 3) = v.toByte
    val e = intercept[IllegalArgumentException](Png.decode(b))
    assert(e.getMessage.contains("inflated") || e.getMessage.contains("truncated"),
      s"wrong failure: ${e.getMessage}")
  }

  test("hostile IHDR dims fail the sanity bound, not an allocation") {
    val good = Png.encode(5, 5, interlaced = false)
    val b = good.clone()
    // width := 2^24 + 1 (big-endian bytes 16..19), CRC fixed up so the
    // parse reaches the dims check rather than dying on the checksum
    b(16) = 1; b(17) = 0; b(18) = 0; b(19) = 1
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 17)
    val v = crc.getValue.toInt
    b(29) = (v >>> 24).toByte; b(30) = (v >>> 16).toByte
    b(31) = (v >>> 8).toByte; b(32) = v.toByte
    val e = intercept[IllegalArgumentException](Png.decode(b))
    assert(e.getMessage.contains("unreasonable dims"), e.getMessage)
  }
}
