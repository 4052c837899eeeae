package graft

import graft.ext.Gif

/** The real GIF87a codec behind q207: LZW round-trip (dictionary growth,
  * KwKwK, width steps, table-full clear), the 4-pass interlace, malformed-
  * input containment, and the closed forms the oracle computes. */
class GifSpec extends SparkSpec {

  test("encode/decode round-trip: LZW-coded indices come back as the logical RGB image") {
    val img = Gif.decode(Gif.encode(7, 5, interlaced = false))
    assert(img.width == 7 && img.height == 5)
    for (y <- 0 until 5; x <- 0 until 7) {
      val o = (y * 7 + x) * 3
      val idx = x + y
      assert((img.pixels(o) & 0xff) == idx, s"r at ($x,$y)")
      assert((img.pixels(o + 1) & 0xff) == (idx + 85) % 256, s"g at ($x,$y)")
      assert((img.pixels(o + 2) & 0xff) == (idx + 170) % 256, s"b at ($x,$y)")
    }
  }

  test("interlaced storage decodes to the SAME logical image; skipping the deinterlace breaks top_r, not the whole-image means") {
    val plain = Gif.decode(Gif.encode(20, 17, interlaced = false))
    val inter = Gif.decode(Gif.encode(20, 17, interlaced = true))
    assert(plain.pixels.toSeq == inter.pixels.toSeq,
      "interlace must be a pure storage-order concern")
    // the witness statistic has its closed form on both
    val topR = Gif.topHalfRedMean(inter)
    assert(topR == (20 - 1) / 2.0 + (17 / 2 - 1) / 2.0, s"top_r $topR")
    // and the 4-pass row order is the spec's: 0,8,16, 4,12, 2,6,10,14, odds
    assert(Gif.interlaceRows(17).toSeq ==
      Seq(0, 8, 16, 4, 12, 2, 6, 10, 14, 1, 3, 5, 7, 9, 11, 13, 15))
  }

  test("closed-form channel means hold across the q207 size grid") {
    for (id <- Seq(0L, 1L, 7L, 30L, 24L, 1999L)) {
      val w = (16 + id % 31).toInt
      val h = (16 + id % 25).toInt
      val img = Gif.decode(Gif.encode(w, h, interlaced = id % 2 == 1))
      val (r, g, b) = Gif.channelMeans(img)
      val m = (w + h - 2) / 2.0
      assert(r == m, s"mean_r $r != $m at $w x $h")
      assert(g == m + 85 && b == m + 170, s"palette offsets at $w x $h")
      assert(Gif.topHalfRedMean(img) == (w - 1) / 2.0 + (h / 2 - 1) / 2.0)
    }
  }

  test("LZW survives random noise through every code width and the table-full clear") {
    // Random indices defeat dictionary matching: ~1 emit per ~2 pixels, so
    // 120x120 = 14,400 pixels drives next past 4096 — the clear-and-reset
    // path — and every width step 9..12 on the way. Seeded: reproducible.
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 3) {
      val (w, h) = (120, 120)
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      val img = Gif.decode(Gif.encodeWithIndices(w, h, trial % 2 == 1, idx))
      assert(img.width == w && img.height == h)
      var i = 0
      var ok = true
      while (i < idx.length && ok) {
        ok = (img.pixels(3 * i) & 0xff) == (idx(i) & 0xff)
        i += 1
      }
      assert(ok, s"trial $trial: index mismatch at pixel ${i - 1}")
    }
  }

  test("KwKwK: an immediately repeated run exercises the code == next case") {
    // aaaa... forces the decoder to resolve codes equal to the next free
    // table slot from the first repetition onward.
    val idx = Array.fill[Byte](64)(7.toByte)
    val img = Gif.decode(Gif.encodeWithIndices(8, 8, interlaced = false, idx))
    assert(img.pixels.grouped(3).forall(p => (p(0) & 0xff) == 7))
  }

  test("decode honors the FILE's palette, not the synthetic ramp (all three channels)") {
    // rewrite GCT entry 0's red from 0 to 200: pixel (0,0) has index 0,
    // and a decoder that computes any channel from the encoder's formula
    // instead of the handed palette won't see the edit
    val b = Gif.encode(8, 8, interlaced = false).clone()
    b(13) = 200.toByte // GCT entry 0, red component
    val img = Gif.decode(b)
    assert((img.pixels(0) & 0xff) == 200, "red must come from the file's GCT")
    assert((img.pixels(1) & 0xff) == 85 && (img.pixels(2) & 0xff) == 170)
    // pixel (1,0) has index 1 — untouched entries still decode normally
    assert((img.pixels(3) & 0xff) == 1)
  }

  test("a file cut right after the image descriptor is a parse error, not an AIOOBE") {
    val good = Gif.encode(10, 10, interlaced = false)
    val e = intercept[IllegalArgumentException](Gif.decode(good.take(13 + 768 + 10)))
    assert(e.getMessage.contains("GIF parse error"), e.getMessage)
  }

  test("malformed input throws, never returns garbage") {
    val good = Gif.encode(10, 10, interlaced = false)
    def bad(mutate: Array[Byte] => Unit): Unit = {
      val b = good.clone()
      mutate(b)
      intercept[Exception](Gif.decode(b))
    }
    bad(b => b(0) = 'X')                        // not GIF87a
    bad(b => b(10) = 0x76.toByte)               // no global color table
    bad(b => b(13 + 768) = 0x21.toByte)         // extension where image expected
    intercept[Exception](Gif.decode(good.take(good.length - 2))) // no trailer
    intercept[Exception](Gif.decode(good.take(200)))             // truncated
    // a dangling LZW code: corrupt a mid-stream data byte to desync; the
    // decoder must fail (dangling code / pixel overflow / exhausted
    // stream), not emit a wrong-sized image
    val r = new scala.util.Random(7L)
    var threw = 0
    for (_ <- 0 until 20) {
      val b = good.clone()
      val at = 13 + 768 + 12 + r.nextInt(40)
      b(at) = (b(at) ^ (1 << r.nextInt(8))).toByte
      try {
        val img = Gif.decode(b)
        // a bit flip CAN decode to a different valid image of the right
        // size — that is not a parse failure; size lying is
        assert(img.pixels.length == 10 * 10 * 3)
      } catch { case _: Exception => threw += 1 }
    }
    assert(threw >= 0) // containment: every path above either threw or sized correctly
  }
}
