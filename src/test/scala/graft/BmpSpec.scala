package graft

import graft.ext.Bmp

/** The real BMP codec behind q206: round-trip, the four classic decode
  * traps (bottom-up rows, BGR order, row padding, header-declared pixel
  * offset), malformed-input containment, and the closed forms the oracle
  * computes. */
class BmpSpec extends SparkSpec {

  test("encode/decode round-trip: bottom-up BGR padded rows come back as logical top-down RGB") {
    // width 5: stride 16 vs 15 raw bytes — padding in play on every row
    val img = Bmp.decode(Bmp.encode(5, 4))
    assert(img.width == 5 && img.height == 4)
    for (y <- 0 until 4; x <- 0 until 5) {
      val o = (y * 5 + x) * 3
      assert((img.pixels(o) & 0xff) == x % 256, s"r at ($x,$y)")
      assert((img.pixels(o + 1) & 0xff) == y % 256, s"g at ($x,$y)")
      assert((img.pixels(o + 2) & 0xff) == (x + y) % 256, s"b at ($x,$y)")
    }
    // all four pad residues round-trip (3w mod 4 = 0..3)
    for (w <- 4 to 7) {
      val i2 = Bmp.decode(Bmp.encode(w, 2))
      assert(i2.width == w && (i2.pixels(3) & 0xff) == 1, s"w=$w second pixel r")
    }
  }

  test("top-down (negative biHeight) storage decodes to the same logical image") {
    val bottomUp = Bmp.encode(6, 4)
    val reference = Bmp.decode(bottomUp)
    // rebuild the same file with rows stored top-down and biHeight = -4
    val stride = ((3 * 6 + 3) / 4) * 4
    val topDown = bottomUp.clone()
    def u32(at: Int, v: Int): Unit = {
      topDown(at) = (v & 0xff).toByte
      topDown(at + 1) = ((v >>> 8) & 0xff).toByte
      topDown(at + 2) = ((v >>> 16) & 0xff).toByte
      topDown(at + 3) = ((v >>> 24) & 0xff).toByte
    }
    u32(22, -4)
    for (row <- 0 until 4)
      System.arraycopy(bottomUp, 54 + (4 - 1 - row) * stride,
        topDown, 54 + row * stride, stride)
    val img = Bmp.decode(topDown)
    assert(img.pixels.toSeq == reference.pixels.toSeq,
      "negative-height decode must produce the identical logical image")
  }

  test("bfOffBits beyond 54 is honored: gap bytes between headers and pixels are skipped") {
    val plain = Bmp.encode(3, 2)
    val gap = 12
    val padded = new Array[Byte](plain.length + gap)
    System.arraycopy(plain, 0, padded, 0, 54)
    java.util.Arrays.fill(padded, 54, 54 + gap, 0x7f.toByte) // junk a naive decoder reads as pixels
    System.arraycopy(plain, 54, padded, 54 + gap, plain.length - 54)
    def u32(at: Int, v: Int): Unit = {
      padded(at) = (v & 0xff).toByte
      padded(at + 1) = ((v >>> 8) & 0xff).toByte
      padded(at + 2) = ((v >>> 16) & 0xff).toByte
      padded(at + 3) = ((v >>> 24) & 0xff).toByte
    }
    u32(2, padded.length)
    u32(10, 54 + gap)
    assert(Bmp.decode(padded).pixels.toSeq == Bmp.decode(plain).pixels.toSeq)
  }

  test("malformed inputs throw instead of decoding garbage") {
    val good = Bmp.encode(4, 4)
    def patched(at: Int, v: Int): Array[Byte] = {
      val b = good.clone()
      b(at) = (v & 0xff).toByte
      b(at + 1) = ((v >>> 8) & 0xff).toByte
      b
    }
    intercept[IllegalArgumentException](Bmp.decode("XX".getBytes ++ good.drop(2)))
    intercept[IllegalArgumentException](Bmp.decode(good.dropRight(1))) // truncated pixels
    intercept[IllegalArgumentException](Bmp.decode(patched(28, 32))) // 32 bpp
    intercept[IllegalArgumentException](Bmp.decode(patched(30, 1))) // RLE8 compression
    intercept[IllegalArgumentException](Bmp.decode(patched(26, 3))) // planes != 1
    intercept[IllegalArgumentException](Bmp.decode(good.take(40))) // shorter than headers
    // offset pointing past the buffer must not wrap into a bogus read
    val badOff = good.clone()
    badOff(10) = 0xff.toByte; badOff(11) = 0xff.toByte
    badOff(12) = 0xff.toByte; badOff(13) = 0x7f.toByte
    intercept[IllegalArgumentException](Bmp.decode(badOff))
  }

  test("the top-half green mean is the row-order witness the whole-image means are not") {
    val img = Bmp.decode(Bmp.encode(10, 8))
    // logical top half rows 0..3: mean g = (0+1+2+3)/4
    assert(Bmp.topHalfGreenMean(img) == 1.5)
    // a vertically mirrored image has IDENTICAL whole-image means but a
    // different top half — the statistic q206 reports to catch a missed
    // bottom-up flip
    val mirrored = Bmp.Image(10, 8,
      (0 until 8).reverse.flatMap(y =>
        img.pixels.slice(y * 30, (y + 1) * 30)).toArray)
    assert(Bmp.channelMeans(mirrored) == Bmp.channelMeans(img))
    assert(Bmp.topHalfGreenMean(mirrored) == 5.5)
  }

  test("q206 decode output equals the closed forms the oracle computes") {
    import org.apache.spark.sql.functions._
    val out = graft.ext.Multimodal.q206BmpDecode(spark, sf0001)
    val bad = out.filter(
      col("mean_r") =!= (col("width") - 1) / 2.0 ||
        col("mean_g") =!= (col("height") - 1) / 2.0 ||
        col("mean_b") =!= (col("width") + col("height") - 2) / 2.0 ||
        col("top_g") =!= (floor(col("height") / 2) - 1) / 2.0 ||
        col("n_bytes") =!= lit(54) + col("height") *
          (floor((lit(3) * col("width") + 3) / 4) * 4))
    assert(out.count() > 0 && bad.isEmpty, s"closed-form mismatches: ${bad.count()}")
  }
}
