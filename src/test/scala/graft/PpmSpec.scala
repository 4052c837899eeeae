package graft

import graft.ext.Ppm

/** The real P6 codec behind q140: golden decode, header edge cases,
  * malformed-input containment, and resample correctness. */
class PpmSpec extends SparkSpec {

  test("encode/decode round-trip: header parsed, every pixel byte recovered") {
    val img = Ppm.decode(Ppm.encode(5, 3))
    assert(img.width == 5 && img.height == 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val o = (y * 5 + x) * 3
      assert((img.pixels(o) & 0xff) == x % 256)
      assert((img.pixels(o + 1) & 0xff) == y % 256)
      assert((img.pixels(o + 2) & 0xff) == (x + y) % 256)
    }
  }

  test("golden decode of a hand-built P6 with comments and odd whitespace") {
    val header = "P6\n# a comment line\n2 # trailing comment\n\t1\r\n255\n"
    val pixels = Array[Byte](10, 20, 30, 40, 50, 60)
    val img = Ppm.decode(header.getBytes("US-ASCII") ++ pixels)
    assert(img.width == 2 && img.height == 1)
    assert(img.pixels.toSeq == pixels.toSeq)
    val (r, g, b) = Ppm.channelMeans(img)
    assert(r == 25.0 && g == 35.0 && b == 45.0)
  }

  test("malformed inputs throw instead of decoding garbage") {
    val good = Ppm.encode(4, 4)
    intercept[IllegalArgumentException](Ppm.decode("P5\n1 1\n255\n ".getBytes ++ Array[Byte](0)))
    intercept[IllegalArgumentException](Ppm.decode(good.dropRight(1))) // truncated pixels
    intercept[IllegalArgumentException](Ppm.decode(good ++ Array[Byte](9))) // trailing junk
    intercept[IllegalArgumentException](Ppm.decode("P6\n2 2\n65535\n ".getBytes ++ new Array[Byte](12)))
    // dimension product overflowing Int must not alias a zero-byte payload
    intercept[IllegalArgumentException](
      Ppm.decode("P6\n16777216 16777216\n255\n ".getBytes))
    intercept[IllegalArgumentException](Ppm.decode("P6\n0 5\n255\n ".getBytes))
  }

  test("nearest-neighbor resize maps (ix, iy) to (floor(ix*w/ow), floor(iy*h/oh))") {
    val img = Ppm.decode(Ppm.encode(7, 5))
    val rz = Ppm.resizeNearest(img, 3, 2)
    assert(rz.width == 3 && rz.height == 2)
    for (iy <- 0 until 2; ix <- 0 until 3) {
      val sx = ix * 7 / 3
      val sy = iy * 5 / 2
      val o = (iy * 3 + ix) * 3
      assert((rz.pixels(o) & 0xff) == sx % 256, s"r at ($ix,$iy)")
      assert((rz.pixels(o + 1) & 0xff) == sy % 256, s"g at ($ix,$iy)")
      assert((rz.pixels(o + 2) & 0xff) == (sx + sy) % 256, s"b at ($ix,$iy)")
    }
  }

  test("q140 decode means equal the closed forms the oracle computes") {
    import org.apache.spark.sql.functions._
    val out = graft.ext.Multimodal.q140PpmDecode(spark, sf0001)
    val bad = out.filter(
      col("mean_r") =!= (col("width") - 1) / 2.0 ||
      col("mean_g") =!= (col("height") - 1) / 2.0 ||
      col("mean_b") =!= (col("width") + col("height") - 2) / 2.0)
    assert(bad.isEmpty, "pixel-scan means must match the closed forms")
    assert(out.count() == 500) // every sf0.001 doc encodes one image
  }

  test("q161: binaryFile ingest globs only media files and reports true on-disk lengths") {
    import org.apache.spark.sql.functions._
    val root = graft.sources.Staged.ppmFilesDir(spark, sf0001)
    // The staged corpus really contains a non-media file the glob must skip.
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "MANIFEST.txt")))
    val out = graft.ext.Multimodal.q161BinaryFileIngest(spark, sf0001)
    assert(out.count() == 64, "exactly the 64 .ppm files, manifest excluded")
    // file_len comes from the binaryFile source's metadata — cross-check
    // every row against the actual on-disk size.
    out.select("media_id", "file_len").collect().foreach { r =>
      val actual = java.nio.file.Files.size(
        java.nio.file.Paths.get(root, f"img_${r.getLong(0)}%04d.ppm"))
      assert(r.getLong(1) == actual,
        s"media ${r.getLong(0)}: reported ${r.getLong(1)} vs on-disk $actual")
    }
    val bad = out.filter(col("mean_r") =!= (col("width") - 1) / 2.0)
    assert(bad.isEmpty, "decode means must match the closed forms")
  }
}
