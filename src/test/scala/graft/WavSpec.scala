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

  test("mu-law expansion matches the ITU table at the anchor codes and is odd-symmetric") {
    // anchors from the G.711 tables: code 0xFF = +0 (quiet), 0x7F = -0,
    // code 0x80 = +32124 (max), 0x00 = -32124
    assert(Wav.mulawExpand(0xff) == 0)
    assert(Wav.mulawExpand(0x7f) == 0)
    assert(Wav.mulawExpand(0x80) == 32124)
    assert(Wav.mulawExpand(0x00) == -32124)
    // sign symmetry: flipping bit 7 of the code negates the sample
    for (c <- 0 until 128)
      assert(Wav.mulawExpand(c) == -Wav.mulawExpand(c | 0x80), s"code $c")
    // monotone within the positive half: smaller code = larger magnitude
    // (codes are complemented), strictly until the two zero codes meet
    for (c <- 0x80 until 0xff)
      assert(Wav.mulawExpand(c) > Wav.mulawExpand(c + 1), s"code $c order")
  }

  test("mu-law WAV round-trip: fact/WAVEFORMATEX grammar parses and every code expands") {
    val a = Wav.decode(Wav.encodeMulaw(600))
    assert(a.sampleRate == 8000 && a.samples.length == 600)
    for (k <- 0 until 600)
      assert(a.samples(k) == Wav.mulawExpand((7 * k) % 256).toShort, s"sample $k")
  }

  test("a lying fact chunk is a loud parse error, not silent truncation") {
    val good = Wav.encodeMulaw(100)
    // fact payload lives right after fmt: 12 + (8 + 18) + 8 = 46
    val b = good.clone()
    b(46) = 99
    val e = intercept[IllegalArgumentException](Wav.decode(b))
    assert(e.getMessage.contains("fact declares"), e.getMessage)
    // and a MISSING fact chunk is equally loud for non-PCM (the chunk is
    // required by the WAV spec and the docs claim enforcement)
    val noFact = good.take(38) ++ good.drop(50) // excise the 12-byte fact chunk
    val e2 = intercept[IllegalArgumentException](Wav.decode(noFact))
    assert(e2.getMessage.contains("missing its fact chunk"), e2.getMessage)
    // and a PCM16 file with a mu-law tag (or vice versa) fails on bit depth
    val cross = Wav.encode(64).clone()
    cross(20) = 7 // format tag PCM -> mu-law, but bits/sample still 16
    intercept[IllegalArgumentException](Wav.decode(cross))
  }

  test("q209 decoded stats equal the expansion recomputed in-test over the same code stream") {
    val out = graft.ext.Multimodal.q209MulawDecode(spark, sf0001).collect()
    assert(out.length == 500)
    for (row <- out.take(50)) {
      val id = row.getLong(0)
      val n = (800 + 3 * (id % 555)).toInt
      var sum = 0L; var sumSq = 0L
      for (k <- 0 until n) {
        val l = Wav.mulawExpand((7 * k) % 256)
        sum += l; sumSq += l.toLong * l
      }
      def r6(v: Double) = math.rint(v * 1e6) / 1e6
      assert(row.getInt(1) == n)
      assert(row.getDouble(4) == r6(sum.toDouble / n), s"mean at id $id")
      assert(row.getDouble(5) == r6(math.sqrt(sumSq.toDouble / n)), s"rms at id $id")
      assert(row.getInt(6) == 32124, s"peak at id $id")
    }
  }
}
