package graft.ext

/** REAL audio codecs for the multimodal path — RIFF/WAVE mono carrying
  * either linear PCM16 (q141) or ITU-T G.711 µ-law companded 8-bit codes
  * (q209), fully decodable with zero codec libraries (chunk-walking header
  * parse + little-endian samples / logarithmic expansion). Together with
  * the raster family they make the multimodal batch-decode plumbing carry
  * genuine decoders for both raster and waveform media;
  * [[Multimodal.fakeDecode]] stays only for formats that need real codec
  * libraries (JPEG/MP4/MP3).
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

  /** ITU-T G.711 µ-law expansion, the SECOND real audio codec behind the
    * WAV container (q209): 8-bit logarithmic code → 14-bit-magnitude
    * linear sample. The expansion is the classic complement / segment /
    * mantissa form whose closed expression
    *   mag = (8·man + 0x84) · 2^exp − 0x84
    * a SQL oracle can compute byte-for-byte — so q209 checks the actual
    * companding arithmetic, not a tautology. Max magnitude 32124. */
  def mulawExpand(code: Int): Int = {
    val u = ~code & 0xff
    val exp = (u >> 4) & 0x07
    val man = u & 0x0f
    val mag = (((man << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

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

  /** Deterministic G.711 µ-law mono WAV with `n` code bytes at 8 kHz:
    * code_k = (7k) mod 256 — gcd(7, 256) = 1, so every 256-sample cycle
    * visits ALL 256 µ-law codes (both sign halves, every segment, every
    * mantissa), and k = 0 carries code 0 = −32124, the negative peak.
    * Non-PCM WAV grammar done properly: fmt is the 18-byte WAVEFORMATEX
    * shape (format tag 7, 8 bits/sample, cbSize = 0) and a `fact` chunk
    * declares the sample count — both real-file traps a PCM-only parser
    * never sees. */
  def encodeMulaw(n: Int): Array[Byte] = {
    require(n > 0, "empty audio")
    val buf = java.nio.ByteBuffer.allocate(12 + (8 + 18) + (8 + 4) + 8 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + (8 + 18) + (8 + 4) + 8 + n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(7)            // WAVE_FORMAT_MULAW
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000)           // byte rate (1 byte/sample)
      .putShort(1)            // block align
      .putShort(8)            // bits per sample
      .putShort(0)            // cbSize (WAVEFORMATEX tail)
    buf.put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    var k = 0
    while (k < n) { buf.put(((7 * k) % 256).toByte); k += 1 }
    // n odd ⇒ the data chunk's pad byte is legitimately omitted at EOF
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
    var fmtTag = -1
    var bits = -1
    var factSamples = -1
    var dataAt = -1
    var dataSize = -1
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
          fmtTag = buf.getShort()
          val channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort()
          bits = buf.getShort()
          if (channels != 1) fail(s"unsupported channel count $channels")
          skipAligned(start) // chunks are word-aligned
        case "data" =>
          if (size == 0) fail("empty data chunk")
          // record and convert AFTER the walk: real files may order fmt
          // and data either way, and the sample width depends on fmt
          dataAt = buf.position()
          dataSize = size
          skipAligned(buf.position())
        case "fact" =>
          if (size < 4) fail("fact chunk too small")
          val start = buf.position()
          factSamples = buf.getInt()
          skipAligned(start)
        case _ => // unknown chunk (LIST, INFO metadata, ...): skip, word-aligned
          skipAligned(buf.position())
      }
    }
    if (sampleRate < 0) fail("missing fmt chunk")
    if (dataAt < 0) fail("missing data chunk")
    val samples = fmtTag match {
      case 1 => // integer PCM
        if (bits != 16) fail(s"unsupported PCM bit depth $bits")
        if (dataSize % 2 != 0) fail("odd PCM16 data size")
        val out = new Array[Short](dataSize / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((bytes(dataAt + 2 * i) & 0xff) |
            (bytes(dataAt + 2 * i + 1) << 8)).toShort
          i += 1
        }
        out
      case 7 => // G.711 µ-law: 8-bit codes, logarithmic expansion
        if (bits != 8) fail(s"unsupported mu-law bit depth $bits")
        // the fact chunk is REQUIRED for non-PCM formats — enforced, so
        // the documented parser trap is real: a missing count and a lying
        // count are both loud
        if (factSamples < 0) fail("non-PCM format missing its fact chunk")
        if (factSamples != dataSize)
          fail(s"fact declares $factSamples samples, data has $dataSize")
        val out = new Array[Short](dataSize)
        var i = 0
        while (i < out.length) {
          out(i) = mulawExpand(bytes(dataAt + i) & 0xff).toShort
          i += 1
        }
        out
      case t => fail(s"unsupported codec $t (PCM and mu-law only)")
    }
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
