package graft.ext

/** A REAL audio codec for the multimodal path — RIFF/WAVE PCM16 mono, the
  * audio analog of [[Ppm]]: fully decodable with zero codec libraries
  * (chunk-walking header parse + little-endian samples). Together they make
  * the multimodal batch-decode plumbing carry genuine decoders for both
  * raster and waveform media; [[Multimodal.fakeDecode]] stays only for
  * formats that need real codec libraries (JPEG/MP4/MP3).
  *
  * Encoder sample model (q141's synthetic corpus): a 200-sample sawtooth
  * s_k = (k mod 200) − 100 at 8 kHz. Chosen so every reported statistic
  * has a CLOSED FORM in the sample count n that a SQL oracle can compute
  * without decoding: with C = ⌊n/200⌋ full cycles and r = n mod 200
  * remainder samples,
  *   Σs  = −100·C + r(r−1)/2 − 100r
  *   Σs² = 666700·C + r(r−1)(2r−1)/6 − 100r(r−1) + 10000r
  * and peak |s| = 100 (k = 0 is always present). A misparsed chunk size,
  * byte-order mistake, or off-by-one in the sample walk breaks the
  * identities — the oracle checks the actual decode, not a tautology.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  /** Deterministic PCM16 mono WAV with `n` sawtooth samples at 8 kHz. */
  def encode(n: Int): Array[Byte] = {
    require(n > 0, "empty audio")
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var k = 0
    while (k < n) { buf.putShort(((k % 200) - 100).toShort); k += 1 }
    buf.array()
  }

  /** Parse one WAV: RIFF/WAVE magic, then WALK the chunk list (skipping
    * unknown chunks — LIST/INFO metadata is routine in real files) to find
    * `fmt ` (must be PCM16 mono) and `data`. Malformed input throws. */
  def decode(bytes: Array[Byte]): Audio = {
    def fail(msg: String) = throw new IllegalArgumentException(s"WAV parse error: $msg")
    if (bytes.length < 12) fail("too short for RIFF header")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4)
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "RIFF") fail("not RIFF")
    buf.getInt() // declared riff size; trust the actual buffer bounds instead
    buf.get(magic)
    if (new String(magic, "US-ASCII") != "WAVE") fail("not WAVE")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8) {
      buf.get(magic)
      val id = new String(magic, "US-ASCII")
      val size = buf.getInt()
      if (size < 0 || size > buf.remaining()) fail(s"chunk $id overruns file")
      // Word-alignment padding: an ODD-sized final chunk legitimately omits
      // its pad byte at EOF (real writers do this), but a skip of
      // size + (size & 1) would then set position past the limit and throw
      // a raw IllegalArgumentException instead of the descriptive parse
      // error the quarantine contract promises. Clamp the skip to the
      // buffer's end.
      def skipAligned(from: Int): Unit =
        buf.position(math.min(from + size + (size & 1), buf.limit()))
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too small")
          val start = buf.position()
          val fmt = buf.getShort()
          val channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort()
          val bits = buf.getShort()
          if (fmt != 1) fail(s"unsupported codec $fmt (PCM only)")
          if (channels != 1) fail(s"unsupported channel count $channels")
          if (bits != 16) fail(s"unsupported bit depth $bits")
          skipAligned(start) // chunks are word-aligned
        case "data" =>
          if (size % 2 != 0) fail("odd PCM16 data size")
          if (size == 0) fail("empty data chunk")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ => // unknown chunk (LIST, fact, ...): skip, word-aligned
          skipAligned(buf.position())
      }
    }
    if (sampleRate < 0) fail("missing fmt chunk")
    if (samples == null) fail("missing data chunk")
    Audio(sampleRate, samples)
  }

  /** (n, duration seconds, mean amplitude, RMS, peak |amplitude|) from the
    * actual sample walk. */
  def stats(a: Audio): (Int, Double, Double, Double, Int) = {
    var sum = 0L; var sumSq = 0L; var peak = 0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i).toInt
      sum += s; sumSq += s.toLong * s
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    val n = a.samples.length
    (n, n.toDouble / a.sampleRate, sum.toDouble / n,
      math.sqrt(sumSq.toDouble / n), peak)
  }
}
