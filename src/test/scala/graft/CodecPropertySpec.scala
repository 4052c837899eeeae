package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.ext.{Bmp, Gif, Png, Ppm, Wav, Y4m}

/** Property tests for the codec-free trio: encode→decode is the identity
  * and the scan statistics match their closed forms at EVERY dimension in
  * range — not just the sizes the oracles sample. */
class CodecPropertySpec extends SparkSpec {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, s"$name: $r")
  }

  test("property: PPM round-trip + closed-form means for all small dimensions") {
    val dims = for { w <- Gen.choose(1, 60); h <- Gen.choose(1, 60) } yield (w, h)
    check(Prop.forAll(dims) { case (w, h) =>
      val img = Ppm.decode(Ppm.encode(w, h))
      val (r, g, b) = Ppm.channelMeans(img)
      img.width == w && img.height == h &&
        r == (w - 1) / 2.0 && g == (h - 1) / 2.0 &&
        (w + h > 257 || b == (w + h - 2) / 2.0) // wrap starts past 257
    }, "ppm")
  }

  test("property: PPM nearest-neighbor resize matches the index map at any target size") {
    val cfg = for {
      w <- Gen.choose(2, 40); h <- Gen.choose(2, 40)
      ow <- Gen.choose(1, 50); oh <- Gen.choose(1, 50)
    } yield (w, h, ow, oh)
    check(Prop.forAll(cfg) { case (w, h, ow, oh) =>
      val rz = Ppm.resizeNearest(Ppm.decode(Ppm.encode(w, h)), ow, oh)
      (0 until oh).forall { iy =>
        (0 until ow).forall { ix =>
          val (sx, sy) = (ix * w / ow, iy * h / oh)
          val o = (iy * ow + ix) * 3
          (rz.pixels(o) & 0xff) == sx % 256 &&
            (rz.pixels(o + 1) & 0xff) == sy % 256 &&
            (rz.pixels(o + 2) & 0xff) == (sx + sy) % 256
        }
      }
    }, "ppm-resize")
  }

  test("property: GIF round-trip + closed-form means for all small dimensions, both interlace modes") {
    val dims = for {
      w <- Gen.choose(1, 60); h <- Gen.choose(1, 60)
      il <- Gen.oneOf(true, false)
    } yield (w, h, il)
    check(Prop.forAll(dims) { case (w, h, il) =>
      val img = Gif.decode(Gif.encode(w, h, il))
      val (r, g, b) = Gif.channelMeans(img)
      val m = (w + h - 2) / 2.0
      img.width == w && img.height == h &&
        r == m &&
        (w + h > 172 || g == m + 85) && // palette green wraps past idx 170
        (w + h > 87 || b == m + 170) && // palette blue wraps past idx 85
        (h < 2 || Gif.topHalfRedMean(img) == (w - 1) / 2.0 + (h / 2 - 1) / 2.0)
    }, "gif")
  }

  test("property: WAV round-trip + sawtooth closed forms for all sample counts") {
    check(Prop.forAll(Gen.choose(1, 2500)) { n =>
      val a = Wav.decode(Wav.encode(n))
      val (nn, dur, mean, rms, peak) = Wav.stats(a)
      val c = n / 200L; val r = n % 200L
      val s1 = -100L * c + r * (r - 1) / 2 - 100 * r
      val s2 = 666700L * c + r * (r - 1) * (2 * r - 1) / 6 - 100 * r * (r - 1) + 10000 * r
      nn == n && a.sampleRate == 8000 &&
        dur == n.toDouble / 8000 &&
        mean == s1.toDouble / n &&
        rms == math.sqrt(s2.toDouble / n) &&
        peak == 100 // sample k = 0 is always present
    }, "wav")
  }

  test("property: BMP round-trip + closed forms at every size, pad residue, and row order") {
    val dims = for { w <- Gen.choose(1, 60); h <- Gen.choose(1, 60) } yield (w, h)
    check(Prop.forAll(dims) { case (w, h) =>
      val img = Bmp.decode(Bmp.encode(w, h))
      val (r, g, b) = Bmp.channelMeans(img)
      val stride = ((3 * w + 3) / 4) * 4
      // every pixel recovered through the bottom-up BGR padded storage
      val pixelsOk = (0 until h).forall { y =>
        (0 until w).forall { x =>
          val o = (y * w + x) * 3
          (img.pixels(o) & 0xff) == x % 256 &&
            (img.pixels(o + 1) & 0xff) == y % 256 &&
            (img.pixels(o + 2) & 0xff) == (x + y) % 256
        }
      }
      img.width == w && img.height == h && pixelsOk &&
        Bmp.encode(w, h).length == 54 + h * stride &&
        r == (w - 1) / 2.0 && g == (h - 1) / 2.0 &&
        (w + h > 257 || b == (w + h - 2) / 2.0) &&
        // the row-order witness: top ⌊h/2⌋ rows' green mean (h >= 2)
        (h < 2 || Bmp.topHalfGreenMean(img) == (h / 2 - 1) / 2.0)
    }, "bmp")
  }

  test("property: PNG round-trip + closed-form means at every size, both interlace modes") {
    val dims = for {
      w <- Gen.choose(1, 60); h <- Gen.choose(1, 60)
      il <- Gen.oneOf(true, false)
    } yield (w, h, il)
    check(Prop.forAll(dims) { case (w, h, il) =>
      val img = Png.decode(Png.encode(w, h, il))
      val (r, g, b) = Png.channelMeans(img)
      img.width == w && img.height == h &&
        r == (w + h - 2) / 2.0 && // x+y <= 118, never wraps in range
        g == (w - 1) / 2.0 && b == (h - 1) / 2.0 &&
        (h < 2 || Png.topHalfRedMean(img) == (w - 1) / 2.0 + (h / 2 - 1) / 2.0)
    }, "png")
  }

  test("property: Adam7 places every pixel exactly once at every size") {
    val dims = for { w <- Gen.choose(1, 40); h <- Gen.choose(1, 40) } yield (w, h)
    check(Prop.forAll(dims) { case (w, h) =>
      val hits = new Array[Int](w * h)
      for (pass @ (x0, y0, dx, dy) <- Png.Adam7) {
        val (pw, ph) = Png.passDims(w, h, pass)
        for (j <- 0 until ph; i <- 0 until pw)
          hits((y0 + j * dy) * w + (x0 + i * dx)) += 1
      }
      hits.forall(_ == 1)
    }, "adam7-coverage")
  }

  test("property: y4m round-trip + per-frame luma closed forms for all small streams") {
    val cfg = for {
      w <- Gen.choose(1, 30).map(_ * 2); h <- Gen.choose(1, 24).map(_ * 2)
      f <- Gen.choose(1, 8)
    } yield (w, h, f)
    check(Prop.forAll(cfg) { case (w, h, nf) =>
      val v = Y4m.decode(Y4m.encode(w, h, nf))
      v.width == w && v.height == h && v.frames.length == nf &&
        v.frames.indices.forall { f =>
          // no wrap: w <= 60, h <= 48, f < 8 keeps x+y+10f < 256
          Y4m.lumaMean(v.frames(f)) == (w - 1) / 2.0 + (h - 1) / 2.0 + 10.0 * f
        }
    }, "y4m")
  }
}
