package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.{columnOf, expressionOf, AbstractDataType}

/** Native Catalyst expressions for the similarity/dedup hot paths.
  *
  * The composable higher-order-function formulations (64 `transform`s for a
  * MinHash signature, 24 `aggregate`s for an LSH signature) generate code far
  * past the JVM's method-size sweet spot and degrade to interpreted eval —
  * a 10-100× per-row penalty that dominates at 100 TB. Each expression here
  * is one tight static-kernel loop, wired into whole-stage codegen via
  * `defineCodeGen` (the generated code is a single static call).
  */
object Kernels {

  /** Cosine similarity over float arrays, double accumulation in index
    * order — bit-identical to the sequential-fold HOF formulation on
    * equal-length inputs. Mismatched lengths FAIL LOUDLY: a silent
    * prefix-cosine would rank a truncated/corrupt embedding with a
    * plausible score (the HOF form surfaces the same rows as nulls). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"cosine over mismatched vector lengths: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  /** L2-normalize a float array to doubles (zero-norm input → all zeros),
    * accumulating in index order — bit-identical to the HOF formulation
    * (`transform` + `sqrt(aggregate(x*x))`), which nests the norm aggregate
    * inside the per-element lambda and so re-evaluates it per element. */
  def normalizeF(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    val out = new Array[Double](n)
    if (nrm != 0.0) {
      i = 0
      while (i < n) {
        out(i) = a.getFloat(i).toDouble / nrm
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Morton (Z-order) interleave of two 32-bit values: bit i of `a` lands at
    * position 2i, of `b` at 2i+1. Locality in the z-curve preserves locality
    * in BOTH dimensions — the basis of multi-column file clustering. */
  def mortonInterleave(a: Long, b: Long): Long = {
    def spread(x: Long): Long = {
      var v = x & 0xffffffffL
      v = (v | (v << 16)) & 0x0000ffff0000ffffL
      v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
      v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    spread(a) | (spread(b) << 1)
  }

  /** Cosine over double arrays (normalized vectors, centroids). Mismatched
    * lengths fail loudly — see [[cosineF]]. */
  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"cosine over mismatched vector lengths: $n vs ${b.numElements()}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  private def coeffs(numHashes: Int, seed: Long): Array[Long] = {
    var x = seed
    Array.fill(numHashes) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33) | 1L
    }
  }

  // 128, not 64: with 4-row bands this yields 32 bands, the operating
  // point the near-dup completeness premises state (miss < 1e-8 for a
  // J >= 0.8 qualifying pair; 16 bands measured 2.2e-4 — a once-per-~150
  // -runs flaky oracle mismatch). Seeds are an LCG prefix, so the first 64
  // slots are bit-identical to the old signature.
  val MinHashCount = 128
  private val MinHashSeeds = coeffs(MinHashCount, 42L)

  /** MinHash signature over pre-hashed (31-bit) shingles: one pass over the
    * shingles, updating all permutation minima.
    *
    * Each "permutation" is xxhash64 of the shingle hash under a distinct
    * seed — a full-avalanche mix, NOT a linear (h·a + b) mod p map. The
    * linear form over a 31-bit domain is badly non-min-wise: with 31-bit
    * coefficients the product almost never wraps the 2⁶¹−1 modulus, the
    * map stays order-preserving on most of the domain, and all 64 minima
    * collapse onto the same few small-hash shingles — measured as LSH
    * banding MISSING J ≈ 0.96 near-dup pairs that an ideal family would
    * catch with probability 1 − 10⁻¹⁴. */
  def minhashSig(hashed: ArrayData): ArrayData = {
    val out = Array.fill(MinHashCount)(Long.MaxValue)
    val n = hashed.numElements()
    var i = 0
    while (i < n) {
      val h = hashed.getLong(i)
      var j = 0
      while (j < MinHashCount) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(h, MinHashSeeds(j))
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(out, 0L)
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over per-token hashes: majority vote per bit. */
  def simhash64(hashes: ArrayData): Long = {
    val ones = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 64) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (ones(j) * 2 > n) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Deterministic ±1 hyperplanes shared with all executors (same LCG seed
    * as the HOF formulation — data-independent). planes(t*ppt+p)(dim). */
  def planeMatrix(numTables: Int, planesPerTable: Int, dims: Int): Array[Array[Double]] = {
    var x = 0x5DEECE66DL
    Array.fill(numTables * planesPerTable)(Array.fill(dims) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 40) & 1L) == 1L) 1.0 else -1.0
    })
  }

  private val LshTables = 6
  private val LshPlanes = 4
  private val LshDims = 64
  private val Planes = planeMatrix(LshTables, LshPlanes, LshDims)

  /** Jaccard similarity of two SORTED-ascending distinct long arrays via a
    * two-pointer merge: zero per-row allocation, pure long compares. The
    * `array_intersect`/`array_union` formulation materializes two result
    * arrays per pair only to take their sizes — measured 3.2 s vs <1 s for
    * the 125k-pair q121 hash verify at sf0.1. PRECONDITION: both inputs
    * sorted ascending with distinct elements (`sort_array` over a set-
    * valued column); unsorted input silently undercounts the overlap.
    * Two empty sets score 0.0 (matches the verify paths' zero-token rule,
    * q143's CASE guard and the oracle's `len(toks) > 0` filter). */
  def jaccardSortedLongs(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** All k md5-u32 MinHash components of a span digest in ONE call:
    * component j is bit-identical to q185's engine-neutral SQL form
    * `conv(substring(md5(concat(j, '_', h)), 1, 8), 16, 10)` — the first
    * four MD5 bytes of "j_&lt;h&gt;" as an unsigned 32-bit value — but computed
    * without the k-way row explode, the 32-hex digest string, the
    * substring, or the base-16 string parse that form spends ~80% of its
    * time on. One row per span flows into the elementwise-min aggregate
    * ([[VecSumAggregator.VecMin]]) instead of k. */
  def md5U32Components(h: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    require(k > 0, s"component count must be positive, got $k")
    val md = md5Local.get()
    val hb = h.getBytes
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      md.reset()
      md.update(java.lang.Integer.toString(j)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      md.update('_'.toByte)
      md.update(hb)
      val d = md.digest()
      out(j) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 31-bit hashes of word k-shingles, computed straight off the
    * UTF-8 bytes: tokenize on whitespace, FNV-1a per token, combine k token
    * hashes per window. No shingle strings are ever materialized — the
    * string-building HOF formulation spends ~2 ms/doc on allocation alone. */
  def shingleHashes(s: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    // k <= 0 would make every window hash to the constant FNV offset basis
    // — every document fingerprints identically, all pairs flag as dups
    // with no error anywhere (the RollingHashMin width guard, applied here).
    require(k > 0, s"shingle width must be positive, got $k")
    val bytes = s.getBytes
    val n = bytes.length
    // per-token FNV-1a 64-bit hashes
    var tokenHashes = new Array[Long](math.max(8, n / 4))
    var nTokens = 0
    var i = 0
    while (i < n) {
      while (i < n && (bytes(i) & 0xff) <= ' ') i += 1
      if (i < n) {
        var h = 0xcbf29ce484222325L
        while (i < n && (bytes(i) & 0xff) > ' ') {
          h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
          i += 1
        }
        if (nTokens == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTokens * 2)
        tokenHashes(nTokens) = h
        nTokens += 1
      }
    }
    val windows = math.max(nTokens - k + 1, if (nTokens == 0) 0 else 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w < windows) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k && w + j < nTokens) {
        h = (h ^ tokenHashes(w + j)) * 0x100000001b3L
        j += 1
      }
      seen.add(h & 0x7fffffffL)
      w += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  // Plane matrices per (numTables, planesPerTable) config — computed once per
  // JVM (executor), deterministic (same LCG seed), so no broadcast needed.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Array[Double]]]()

  /** Configurable multi-table hyperplane signatures: array of `numTables`
    * ints, `planesPerTable` code bits each (≤ 24), table index folded into
    * bits 24+. Longer codes shrink bucket occupancy geometrically — the lever
    * that keeps all-pairs candidate generation linear in corpus size: expected
    * background collisions ≈ tables · N² / 2^(planes+1), so code length is
    * chosen per corpus size (16 bits ⇒ 65 536 buckets/table). */
  def lshSignaturesCfg(emb: ArrayData, numTables: Int, planesPerTable: Int): ArrayData = {
    val key: java.lang.Long = (numTables.toLong << 32) | planesPerTable.toLong
    var planes = planeCache.get(key)
    if (planes == null) {
      planes = planeMatrix(numTables, planesPerTable, LshDims)
      planeCache.putIfAbsent(key, planes)
      planes = planeCache.get(key)
    }
    lshProject(emb, planes, numTables, planesPerTable, tableShift = 24)
  }

  /** Shared hyperplane-projection core of both LSH signature kernels: a
    * vector LONGER than the plane width would be SILENTLY truncated (its
    * upper dimensions never influencing any bucket bit) — rejected instead;
    * a shorter vector projects onto the leading plane coordinates, which is
    * the same random-hyperplane family restricted to that subspace. */
  private def lshProject(emb: ArrayData, planes: Array[Array[Double]],
                         numTables: Int, planesPerTable: Int,
                         tableShift: Int): ArrayData = {
    val n = emb.numElements()
    require(n <= LshDims,
      s"embedding has $n dims; LSH planes cover at most $LshDims")
    val out = new Array[Int](numTables)
    var t = 0
    while (t < numTables) {
      var sig = t << tableShift
      var p = 0
      while (p < planesPerTable) {
        val plane = planes(t * planesPerTable + p)
        var proj = 0.0
        var i = 0
        while (i < n) { proj += emb.getFloat(i).toDouble * plane(i); i += 1 }
        if (proj > 0) sig |= (1 << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization encode: for each of `m` contiguous sub-vectors of
    * the (normalized, double) embedding, the index of the nearest of `k`
    * sub-codebook centroids. `codebook` is flattened [(m·k + k)·subDim].
    * Output is one byte per subspace — 8 bytes for a 64-dim vector, a 32×
    * compression over the raw floats. */
  def pqEncode(a: ArrayData, codebook: Array[Double],
               m: Int, k: Int, subDim: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val off = (mi * k + ki) * subDim
        var d2 = 0.0
        var di = 0
        while (di < subDim) {
          val x = a.getDouble(mi * subDim + di) - codebook(off + di)
          d2 += x * x
          di += 1
        }
        if (d2 < bestD) { bestD = d2; best = ki }
        ki += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Coarse-quantizer assignment: index of the L2-nearest of `k` full-dim
    * centroids (flattened [k·dim]). The IVF cell id. */
  def argminCentroid(a: ArrayData, cents: Array[Double], k: Int, dim: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var ki = 0
    while (ki < k) {
      val off = ki * dim
      var d2 = 0.0
      var d = 0
      while (d < dim) {
        val x = a.getDouble(d) - cents(off + d)
        d2 += x * x
        d += 1
      }
      if (d2 < bestD) { bestD = d2; best = ki }
      ki += 1
    }
    best
  }

  /** PQ-encode the RESIDUAL of a vector against its coarse cell centroid
    * (classic IVFPQ, Jégou et al. 2011 §IV): the residual is subtracted
    * inline — never materialized as a column. */
  def pqEncodeResidual(a: ArrayData, cell: Int, coarse: Array[Double],
                       codebook: Array[Double], m: Int, k: Int, subDim: Int): Array[Byte] = {
    val dim = m * subDim
    val cOff = cell * dim
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val off = (mi * k + ki) * subDim
        var d2 = 0.0
        var di = 0
        while (di < subDim) {
          val idx = mi * subDim + di
          val x = (a.getDouble(idx) - coarse(cOff + idx)) - codebook(off + di)
          d2 += x * x
          di += 1
        }
        if (d2 < bestD) { bestD = d2; best = ki }
        ki += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Asymmetric-distance (ADC) score: sum of per-subspace lookup-table
    * entries selected by the candidate's code bytes. The table holds
    * dot(query_sub(m), centroid(m, k)) for every (m, k), so the sum
    * approximates dot(query, candidate) — cosine, on normalized vectors. */
  def pqAdcScore(code: Array[Byte], tbl: ArrayData, k: Int): Double = {
    var s = 0.0
    var mi = 0
    while (mi < code.length) {
      s += tbl.getDouble(mi * k + (code(mi) & 0xff))
      mi += 1
    }
    s
  }

  /** Multi-table hyperplane signatures of a float embedding: array of
    * NumTables ints, table index folded into bits 16+. Same projection core
    * as [[lshSignaturesCfg]] (the fixed Planes ARE planeMatrix(6, 4, 64),
    * so this is the cfg form at its defaults with the legacy 16-bit table
    * shift — bucket keys unchanged). */
  def lshSignatures(emb: ArrayData): ArrayData =
    lshProject(emb, Planes, LshTables, LshPlanes, tableShift = 16)

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Distinct word k-shingle STRINGS over a pre-split token array, one
    * pass — the exact-strings sibling of [[shingleHashes]] (which hashes;
    * the decontamination/Jaccard paths need the strings for exact set
    * counts). Replaces the composable
    * `array_distinct(transform(sequence(...), concat_ws over k gets))`
    * form, whose per-element lambda runs INTERPRETED (q86 measured 40× at
    * the 64× octave from exactly this). Semantics preserved bit-for-bit:
    * windows = max(n-k, 0)+1 (degenerate short docs produce ONE truncated
    * shingle — out-of-range slots were null and concat_ws skipped them;
    * here the window just ends at n); null tokens are skipped like
    * concat_ws does; first-occurrence order, matching array_distinct. */
  def wordShingles(toks: ArrayData, k: Int): ArrayData = {
    // k > 0 is validated ONCE at WordShingles construction (k is a
    // plan-time constant) — no per-row branch in the shingling hot loop.
    val n = toks.numElements()
    val windows = math.max(n - k, 0) + 1
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](
      math.min(windows * 2, 1 << 17))
    var i = 0
    while (i < windows) {
      val end = math.min(i + k, n)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
      var j = i
      while (j < end) {
        // explicit null check: getUTF8String on a null slot is undefined
        // for UnsafeArrayData; concatWs then skips the null like the
        // composable concat_ws did
        parts(j - i) = if (toks.isNullAt(j)) null else toks.getUTF8String(j)
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(
      new Array[AnyRef](seen.size)).asInstanceOf[Array[Any]])
  }

  /** BPE-ish token-count estimate — {n_pieces, bpe_estimate} — in ONE byte
    * pass over ALREADY-LOWERCASED text (q52's hot loop; lowering stays
    * upstream where it is codegen'd and Unicode-correct). Reproduces the
    * GPT-style pre-tokenizer regex `[a-z]+|[0-9]+|[^a-z0-9 ]` exactly:
    * letter runs and digit runs are one piece charged ceil(len/4) subword
    * tokens; any OTHER character (one CODE POINT — continuation bytes are
    * consumed with their lead byte, matching the regex's per-character
    * semantics) is its own piece charged 1. The composable form
    * (`regexp_extract_all` + an `aggregate` HOF whose lambda runs
    * interpreted per piece) measured 25.3× at the 64× octave. */
  def bpeEstimate(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var pieces = 0
    var est = 0L
    while (i < n) {
      val b = bytes(i)
      if (b == ' ') i += 1
      else if (b >= 'a' && b <= 'z') {
        var len = 0
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') { i += 1; len += 1 }
        pieces += 1; est += (len + 3) / 4
      } else if (b >= '0' && b <= '9') {
        var len = 0
        while (i < n && bytes(i) >= '0' && bytes(i) <= '9') { i += 1; len += 1 }
        pieces += 1; est += (len + 3) / 4
      } else {
        i += 1
        while (i < n && (bytes(i) & 0xC0) == 0x80) i += 1
        pieces += 1; est += 1L
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](pieces, est))
  }

  /** Word-trigram repetition stats — {n_grams, n_distinct} — in ONE pass
    * over the words array (q204's hot loop). The composable form
    * (`transform` over an index `sequence` building every gram string,
    * then `size` + `array_distinct`) materializes the gram array and walks
    * it again for the distinct pass; at the 64× octave that op measured
    * 42.8× vs 64× data — honest compute, but twice the necessary work.
    * Here each gram is built once (exact UTF8String equality — identical
    * to the `concat_ws(' ')` semantics the DuckDB oracle states, and
    * injective because `split(\\s+)` words contain no spaces) and counted
    * in a single hash-set pass. Null/absent grams cannot occur (split
    * never yields null elements). */
  def trigramStats(ws: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = ws.numElements() - 2
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0))
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.min(n * 2, 1 << 17))
    // explicit null checks, same as wordShingles: the function is on the
    // SQL surface (trigram_stats), so arbitrary arrays with null elements
    // reach it, and getUTF8String on a null slot is undefined for
    // UnsafeArrayData; concatWs then skips the null (concat_ws semantics)
    def word(j: Int): org.apache.spark.unsafe.types.UTF8String =
      if (ws.isNullAt(j)) null else ws.getUTF8String(j)
    var i = 0
    while (i < n) {
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space,
        word(i), word(i + 1), word(i + 2)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, seen.size))
  }

  /** Per-term token counts + total token count over ALREADY-LOWERCASED
    * text in ONE byte pass (q114/q125's hot loop; lowering stays upstream
    * where it is codegen'd and Unicode-correct, the bpeEstimate device).
    * A token is a maximal [a-z] byte run — exactly the non-empty segments
    * of `split(text, '[^a-z]+')`: the regex class is ASCII-only, and UTF-8
    * continuation bytes (≥ 0x80) can never read as a-z, so byte-level run
    * scanning splits identically on any input. Output: dl = token count,
    * cnt(i) = occurrences equal to terms(i) (exact byte equality ≡ string
    * equality on the token). Replaces the explode-three-ways form whose
    * every branch re-tokenized the corpus (4 scans + a dl join → 2 scans,
    * no join). */
  def termCounts(s: org.apache.spark.unsafe.types.UTF8String,
                 terms: Array[Array[Byte]]): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    val cnt = new Array[Long](terms.length)
    var dl = 0L
    var i = 0
    while (i < n) {
      if (bytes(i) >= 'a' && bytes(i) <= 'z') {
        val start = i
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
        dl += 1
        val len = i - start
        var t = 0
        while (t < terms.length) {
          val tb = terms(t)
          if (tb.length == len) {
            var j = 0
            while (j < len && tb(j) == bytes(start + j)) j += 1
            if (j == len) cnt(t) += 1
          }
          t += 1
        }
      } else i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dl, new GenericArrayData(cnt)))
  }

  /** [[sortedLongPairs]] with the pair PACKED into one long —
    * (a << 32) | b for 0 ≤ a ≤ b < 2³² (checked; callers guard the range
    * from their own stats, see q122). Downstream the pair-count
    * aggregation keys on ONE 8-byte long instead of a 2-long struct —
    * no per-pair row allocation in the expansion, half the agg key bytes
    * (guide §2.3 "narrower types") — and unpacking is two bit ops after
    * the count filter has discarded the mass. */
  def packedLongPairs(xs: ArrayData): ArrayData = {
    val a = xs.toLongArray()
    java.util.Arrays.sort(a)
    val n = a.length
    if (n > 0 && (a(0) < 0L || a(n - 1) > 0xFFFFFFFFL))
      throw new IllegalArgumentException(
        s"packed_long_pairs needs values in [0, 2^32), got [${a(0)}, ${a(n - 1)}]")
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val hi = a(i) << 32
      var j = i + 1
      while (j < n) {
        out(k) = hi | a(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All unordered value-ordered pairs of a long array (see
    * [[SortedLongPairs]]): sort once, emit (a(i), a(j)) structs for i < j.
    * Output size n(n−1)/2 — callers bound n (basket size). */
  def sortedLongPairs(xs: ArrayData): ArrayData = {
    val a = xs.toLongArray()
    java.util.Arrays.sort(a)
    val n = a.length
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a(i), a(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All unordered pairs of a long-array, value-ordered within each pair —
  * q122's basket pair expansion as ONE scan-local kernel pass: the array
  * is sorted once and every (a(i), a(j)) with i < j is emitted as a
  * struct, so `a < b` pair orientation holds by construction. Replaces
  * the basket self-join (distinct shuffle + join re-shuffle on the order
  * key); output mass is the same Σ b(b−1)/2, bounded by basket size. A
  * nested-`transform` HOF form would run its per-element lambdas
  * interpreted — the q86-class penalty this file exists to avoid. */
case class SortedLongPairs(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  // Raw long-slot reads (see MinHashSig): pin the element type so narrower
  // integrals auto-cast at analysis instead of misreading slots.
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("part_a", LongType, nullable = false),
      StructField("part_b", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.sortedLongPairs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.sortedLongPairs($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Packed variant of [[SortedLongPairs]] (see [[Kernels.packedLongPairs]]):
  * array<long> in [0, 2³²) → array<long> of (a << 32) | b pair keys. */
case class PackedLongPairs(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.packedLongPairs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.packedLongPairs($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class CosineSimF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def foldable: Boolean = left.foldable && right.foldable
  // The kernel is picked from the LEFT child's element width, so a mixed
  // float/double pair would read the other side's memory at the wrong
  // stride — silently-wrong similarity scores on the registered SQL
  // surface (`cosine_sim(double_arr, float_arr)`). Reject the mix at
  // analysis instead.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "cosine_sim needs both sides ARRAY<FLOAT> or both ARRAY<DOUBLE>, " +
            s"got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  private def kernel: String = left.dataType match {
    case ArrayType(FloatType, _) => "cosineF"
    case _ => "cosineD"
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    if (kernel == "cosineF")
      Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      Kernels.cosineD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.$kernel($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class JaccardSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // See MinHashSig: raw long-slot reads on both sides need the inputs pinned.
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def foldable: Boolean = left.foldable && right.foldable
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccardSortedLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaccardSortedLongs($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class MinHashSig(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  // Same hazard NormalizeL2F documents, for the 8-byte direction: the
  // kernel walks raw LONG slots, so an ARRAY<INT> argument on the
  // registered SQL surface (`minhash_sig(array(1,2,3))`) would be read at
  // the wrong stride — garbage signatures, no error. Pinning the input
  // type makes narrower integrals auto-cast at analysis.
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def foldable: Boolean = left.foldable && right.foldable
  override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.mortonInterleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.mortonInterleave($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class NormalizeL2F(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  // The kernel reads raw float slots (Kernels.normalizeF getFloat); pinning
  // the input type makes a widened fixture auto-cast at analysis instead of
  // silently mis-reading 8-byte slots. Same guard on both LSH signature
  // expressions; CosineSimF dispatches by type instead.
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.normalizeF(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.normalizeF($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class SimHash64(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  // See MinHashSig: raw long-slot reads need the input pinned.
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Kernels.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.shingleHashes(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class Md5U32Components(child: Expression, k: Int) extends UnaryExpression {
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.md5U32Components(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.md5U32Components($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class LshSigsCfg(child: Expression, numTables: Int, planesPerTable: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  require(planesPerTable >= 1 && planesPerTable <= 24, "planesPerTable must be in [1, 24]")
  // table index is folded into the bucket key as (t << 24); more than 255
  // tables would wrap and silently share keyspace across tables.
  require(numTables >= 1 && numTables <= 255, "numTables must be in [1, 255]")
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.lshSignaturesCfg(v.asInstanceOf[ArrayData], numTables, planesPerTable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.lshSignaturesCfg($c, $numTables, $planesPerTable)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** PQ encode with a run-trained codebook. The codebook is embedded as a
  * generated-code reference object (`addReferenceObj`), so the kernel call
  * stays inside whole-stage codegen with zero per-row overhead — the same
  * shape ML model broadcasts compile to. */
case class PqEncode(child: Expression, codebook: Array[Double],
                    m: Int, k: Int, subDim: Int) extends UnaryExpression {
  require(k >= 1 && k <= 256, "k must fit one code byte")
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    Kernels.pqEncode(v.asInstanceOf[ArrayData], codebook, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.pqEncode($c, $ref, $m, $k, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** IVF coarse-cell assignment with the trained centroids as a codegen
  * reference object. */
case class ArgminCentroid(child: Expression, cents: Array[Double],
                          k: Int, dim: Int) extends UnaryExpression {
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    Kernels.argminCentroid(v.asInstanceOf[ArrayData], cents, k, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("coarseCentroids", cents, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Kernels.argminCentroid($c, $ref, $k, $dim)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Residual PQ encode against the row's coarse cell (IVFPQ). */
case class PqEncodeResidual(left: Expression, right: Expression,
                            coarse: Array[Double], codebook: Array[Double],
                            m: Int, k: Int, subDim: Int) extends BinaryExpression {
  require(k >= 1 && k <= 256, "k must fit one code byte")
  override def foldable: Boolean = left.foldable && right.foldable
  override def dataType: DataType = BinaryType
  override def nullSafeEval(emb: Any, cell: Any): Any =
    Kernels.pqEncodeResidual(emb.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      coarse, codebook, m, k, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarseCentroids", coarse, "double[]")
    val bRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, (e, c) =>
      s"graft.functions.Kernels.pqEncodeResidual($e, $c, $cRef, $bRef, $m, $k, $subDim)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** ADC lookup-table scoring of a PQ code against a per-query table column. */
case class PqAdcScore(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def foldable: Boolean = left.foldable && right.foldable
  override def dataType: DataType = DoubleType
  override def nullSafeEval(code: Any, tbl: Any): Any =
    Kernels.pqAdcScore(code.asInstanceOf[Array[Byte]], tbl.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, t) => s"graft.functions.Kernels.pqAdcScore($c, $t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class LshSigs(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def foldable: Boolean = child.foldable
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Kernels.lshSignatures(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.lshSignatures($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass BPE-ish token estimate (see [[Kernels.bpeEstimate]]):
  * lowercased string → struct(n_pieces int, bpe_estimate bigint). */
case class BpeEstimate(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("bpe_estimate", LongType, nullable = false)))
  override def nullSafeEval(a: Any): Any =
    Kernels.bpeEstimate(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.bpeEstimate($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass distinct word k-shingle strings (see [[Kernels.wordShingles]]):
  * array<string> words → array<string> shingles. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  require(k > 0, s"shingle width must be positive, got $k")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    Kernels.wordShingles(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.wordShingles($c, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass word-trigram repetition stats (see [[Kernels.trigramStats]]):
  * array<string> words → struct(n_grams int, n_distinct int). */
case class TrigramStats(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))
  override def nullSafeEval(a: Any): Any =
    Kernels.trigramStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.trigramStats($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** One-pass per-term token counts over lowercased text (see
  * [[Kernels.termCounts]]): string → struct(dl bigint, cnt array<bigint>),
  * cnt aligned with the plan-time `terms`. */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  require(terms.nonEmpty, "termCounts needs at least one term")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("cnt", ArrayType(LongType, containsNull = false),
      nullable = false)))
  @transient private lazy val termBytes: Array[Array[Byte]] =
    terms.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override def nullSafeEval(a: Any): Any =
    Kernels.termCounts(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], termBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termBytes", termBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.termCounts($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Broadcast-bloom membership probe over a STRING column — the incremental
  * dedup prefilter (`ext/Dedup.dedupAgainstHashes`) as a native expression.
  * The boxed-UDF form it replaces deserialized every row's UTF8String into a
  * java.lang.String before hashing; at 100 TB the prefilter IS the batch
  * scan, so it must stay inside whole-stage codegen at scan speed. Null
  * input → false, not null ("a null hash cannot be in history" — the same
  * contract the UDF form implemented), so the output is non-nullable and
  * downstream NOT-filters need no three-valued-logic care.
  *
  * Probe semantics match the build exactly: `stat.bloomFilter` on a string
  * column inserts via the sketch's String path (UTF-8 bytes), and
  * `mightContainBinary(utf8.getBytes)` is byte-identical to
  * `mightContain(String)` without materializing the String. The filter
  * rides a Broadcast (one copy per executor, resolved once per codegen
  * instance), never the serialized plan. */
case class BloomMightContainUtf8(
    child: Expression,
    bloomBc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  @transient private lazy val bf = bloomBc.value
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    v != null && bf.mightContainBinary(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      "org.apache.spark.broadcast.Broadcast")
    // Resolve the broadcast once per codegen instance, not per row: value()
    // re-checks the block manager on every call.
    val bloomField = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "graftBloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = !${childGen.isNull} &&
          $bloomField.mightContainBinary(${childGen.value}.getBytes());
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-API entry points for the native kernels. */
object NativeKernels {
  def bloomMightContainUtf8(
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      hash: Column): Column =
    columnOf(BloomMightContainUtf8(expressionOf(hash), bc))
  def cosineSim(a: Column, b: Column): Column =
    columnOf(CosineSimF(expressionOf(a), expressionOf(b)))
  def minhashSig(hashed: Column): Column =
    columnOf(MinHashSig(expressionOf(hashed)))
  def jaccardSortedLongs(a: Column, b: Column): Column =
    columnOf(JaccardSortedLongs(expressionOf(a), expressionOf(b)))
  def simhash64(hashes: Column): Column =
    columnOf(SimHash64(expressionOf(hashes)))
  def normalizeL2(emb: Column): Column =
    columnOf(NormalizeL2F(expressionOf(emb)))
  def mortonInterleave(a: Column, b: Column): Column =
    columnOf(MortonInterleave(expressionOf(a), expressionOf(b)))
  def lshSigs(emb: Column): Column =
    columnOf(LshSigs(expressionOf(emb)))
  def lshSigsCfg(emb: Column, numTables: Int, planesPerTable: Int): Column =
    columnOf(LshSigsCfg(expressionOf(emb), numTables, planesPerTable))
  def shingleHashes(text: Column, k: Int): Column =
    columnOf(ShingleHashes(expressionOf(text), k))
  def trigramStats(words: Column): Column =
    columnOf(TrigramStats(expressionOf(words)))
  def wordShingles(words: Column, k: Int): Column =
    columnOf(WordShingles(expressionOf(words), k))
  def bpeEstimate(loweredText: Column): Column =
    columnOf(BpeEstimate(expressionOf(loweredText)))
  def md5U32Components(h: Column, k: Int): Column =
    columnOf(Md5U32Components(expressionOf(h), k))
  def sortedLongPairs(xs: Column): Column =
    columnOf(SortedLongPairs(expressionOf(xs)))
  def termCounts(loweredText: Column, terms: Seq[String]): Column =
    columnOf(TermCounts(expressionOf(loweredText), terms))
  def packedLongPairs(xs: Column): Column =
    columnOf(PackedLongPairs(expressionOf(xs)))
  def pqEncode(emb: Column, codebook: Array[Double], m: Int, k: Int, subDim: Int): Column =
    columnOf(PqEncode(expressionOf(emb), codebook, m, k, subDim))
  def pqAdcScore(code: Column, tbl: Column, k: Int): Column =
    columnOf(PqAdcScore(expressionOf(code), expressionOf(tbl), k))
  def argminCentroid(emb: Column, cents: Array[Double], k: Int, dim: Int): Column =
    columnOf(ArgminCentroid(expressionOf(emb), cents, k, dim))
  def pqEncodeResidual(emb: Column, cell: Column, coarse: Array[Double],
                       codebook: Array[Double], m: Int, k: Int, subDim: Int): Column =
    columnOf(PqEncodeResidual(expressionOf(emb), expressionOf(cell),
      coarse, codebook, m, k, subDim))
}
