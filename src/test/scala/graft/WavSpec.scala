package graft

import graft.ext.Wav

/** The real RIFF/PCM16 codec behind q141: round-trip, chunk-walking with
  * unknown chunks, malformed-input containment, and stat parity with the
  * closed forms the oracle computes. */
class WavSpec extends SparkSpec {

  test("encode/decode round-trip recovers rate and every sample") {
    val a = Wav.decode(Wav.encode(450))
    assert(a.sampleRate == 8000 && a.samples.length == 450)
    for (k <- 0 until 450)
      assert(a.samples(k) == ((k % 200) - 100).toShort, s"sample $k")
  }

  test("chunk walker skips unknown chunks (LIST metadata) to reach fmt/data") {
    val base = Wav.encode(100)
    // splice an odd-sized LIST chunk between WAVE magic and fmt
    val listBody = "INFOIARTgraft".getBytes("US-ASCII") // 13 bytes, odd
    val chunk = java.nio.ByteBuffer.allocate(8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody).put(0.toByte)
    val spliced = base.take(12) ++ chunk.array() ++ base.drop(12)
    val a = Wav.decode(spliced)
    assert(a.sampleRate == 8000 && a.samples.length == 100)
    assert(a.samples(5) == ((5 % 200) - 100).toShort)
  }

  test("odd-sized FINAL chunk without its pad byte decodes (skip clamps to EOF)") {
    // Real writers omit the word-alignment pad byte when an odd-sized
    // metadata chunk is last in the file. The aligned skip used to set
    // the buffer position past its limit there — a raw
    // IllegalArgumentException instead of a parse (or a clean success).
    val base = Wav.encode(64)
    val listBody = "INFOIARTgraftxx".getBytes("US-ASCII") // 15 bytes, odd
    val chunk = java.nio.ByteBuffer.allocate(8 + listBody.length) // NO pad
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    val a = Wav.decode(base ++ chunk.array())
    assert(a.sampleRate == 8000 && a.samples.length == 64)
    assert(a.samples(7) == ((7 % 200) - 100).toShort)
  }

  test("malformed inputs throw instead of decoding garbage") {
    val good = Wav.encode(64)
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](Wav.decode(good.dropRight(7))) // data chunk overrun
    // stereo is rejected (channels short lives at offset 22)
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Wav.decode(stereo))
    // a zero-sample data chunk parses structurally but must be rejected
    // (stats over zero samples would be silent NaNs)
    val empty = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    empty.put(good, 0, 40).putInt(0)
    intercept[IllegalArgumentException](Wav.decode(empty.array()))
  }

  test("q141 decoded stats equal the sawtooth closed forms") {
    import org.apache.spark.sql.functions._
    val out = graft.ext.Multimodal.q141WavDecode(spark, sf0001)
    val checked = out
      .withColumn("c", floor(col("n_samples") / 200))
      .withColumn("r", col("n_samples") % 200)
      .withColumn("s1",
        col("c") * -100 + (col("r") * (col("r") - 1)) / 2 - col("r") * 100)
      .filter(col("mean_amp") =!= round(col("s1") / col("n_samples").cast("double"), 6)
        || col("peak") =!= 100)
    assert(checked.isEmpty, "decoded means/peak must match the closed forms")
    assert(out.count() == 500)
  }
}
