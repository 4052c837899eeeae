package graft

import graft.ext.Y4m

/** The real y4m container behind q142: round-trip, frame demux, header
  * tolerance, malformed-input containment, and closed-form stat parity. */
class Y4mSpec extends SparkSpec {

  test("encode/decode round-trip: dimensions, frame count, every luma byte") {
    val v = Y4m.decode(Y4m.encode(6, 4, 3))
    assert(v.width == 6 && v.height == 4 && v.frames.length == 3)
    for (f <- 0 until 3; y <- 0 until 4; x <- 0 until 6)
      assert((v.frames(f).luma(y * 6 + x) & 0xff) == x + y + 10 * f,
        s"luma at f=$f ($x,$y)")
  }

  test("FRAME parameter strings and C420 variants are accepted") {
    val base = Y4m.encode(4, 2, 1)
    val txt = new String(base, "ISO-8859-1")
    val tweaked = txt
      .replace("C420\n", "C420mpeg2\n")
      .replace("FRAME\n", "FRAME Xtag\n")
    val v = Y4m.decode(tweaked.getBytes("ISO-8859-1"))
    assert(v.width == 4 && v.frames.length == 1)
    assert((v.frames(0).luma(1) & 0xff) == 1)
  }

  test("malformed inputs throw instead of decoding garbage") {
    val good = Y4m.encode(4, 2, 2)
    intercept[IllegalArgumentException](Y4m.decode("MPEG4".getBytes ++ good))
    intercept[IllegalArgumentException](Y4m.decode(good.dropRight(3))) // truncated planes
    val noDims = "YUV4MPEG2 F25:1\nFRAME\n".getBytes("US-ASCII")
    intercept[IllegalArgumentException](Y4m.decode(noDims))
    val badCs = new String(good, "ISO-8859-1").replace("C420\n", "C444\n")
    intercept[IllegalArgumentException](Y4m.decode(badCs.getBytes("ISO-8859-1")))
    // unbounded header dims would overflow the plane sizes — rejected
    intercept[IllegalArgumentException](
      Y4m.decode("YUV4MPEG2 W65536 H65536 C420\nFRAME\n".getBytes("US-ASCII")))
  }

  test("q142 sampled-frame luma means equal the closed forms") {
    import org.apache.spark.sql.functions._
    val out = graft.ext.Multimodal.q142VideoFrames(spark, sf0001)
    val bad = out.filter(
      col("luma_mean") =!=
        (col("width") - 1) / 2.0 + (col("height") - 1) / 2.0 + col("frame_idx") * 10)
    assert(bad.isEmpty, "frame demux must land on exact plane boundaries")
    // stride-2 sampling: frame indices are even and below n_frames
    assert(out.filter(col("frame_idx") % 2 =!= 0 ||
      col("frame_idx") >= col("n_frames")).isEmpty)
  }
}
