package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Two paths, as a large-scale pipeline needs both:
  *  - brute-force cosine top-k: exact baseline. The query set is broadcast
  *    (it is small by construction), so the corpus is scanned once with no
  *    shuffle of the big side — at 100 TB this is scan-bound, which is the
  *    best an exact search can do.
  *  - LSH-bucketed ANN (random hyperplanes): candidates only from matching
  *    signature buckets; corpus shuffles once on the bucket key. Recall vs
  *    the exact baseline is asserted in tests.
  */
object Similarity {

  // Tuned for weak neighbor structure (driver embeddings are near-random,
  // top-5 cosine ≈ 0.3): short 4-bit codes, many tables. At cos θ≈0.3 this
  // gives ≈55% recall while probing ~35% of the corpus; stronger cluster
  // structure (real embeddings) shifts the tradeoff sharply in LSH's favor.
  // Short codes are ONLY for the query-vs-corpus path (q38), where candidate
  // volume is nQueries·probeFraction·N — linear in N.
  val NumTables = 6
  val PlanesPerTable = 4

  // The all-pairs near-dup path (q39) uses LONG codes: at cos ≥ 0.99 a bit
  // agrees with p = 1 − θ/π ≈ 0.955, so a 16-bit code still matches with
  // p ≈ 0.48 per table (≈ 98% over 6 tables; exact copies always collide),
  // while background collisions among unrelated vectors drop to
  // ≈ tables·N²/2^17 — the lever that keeps candidate pairs linear in N
  // instead of Θ(N²/2^5). Scale rule: grow NearDupPlanes with log2(N) to
  // hold expected bucket occupancy constant.
  val NearDupTables = 6
  val NearDupPlanes = 16

  /** Deterministic ±1 hyperplanes (seeded LCG — data-independent, identical
    * on every executor without broadcast variables). */
  private def planes: Seq[Seq[Seq[Double]]] = {
    var x = 0x5DEECE66DL
    Seq.fill(NumTables)(Seq.fill(PlanesPerTable)(Seq.fill(64) {
      x = x * 6364136223846793005L + 1442695040888963407L
      if (((x >>> 40) & 1L) == 1L) 1.0 else -1.0
    }))
  }

  /** Multi-table random-hyperplane signatures: an array of NumTables bucket
    * keys (table index folded in). Candidates = union over tables — the
    * standard recall lever for hyperplane LSH. Native kernel expression
    * (24 plane projections in one pass); [[lshSignaturesHof]] is the
    * composable reference formulation. */
  def lshSignatures(emb: Column): Column =
    graft.functions.NativeKernels.lshSigs(emb)

  /** Long-code signatures for the all-pairs near-dup path — see
    * [[NearDupPlanes]]. */
  def nearDupSignatures(emb: Column): Column =
    graft.functions.NativeKernels.lshSigsCfg(emb, NearDupTables, NearDupPlanes)

  /** Reference HOF formulation of [[lshSignatures]] (same planes/seed). */
  def lshSignaturesHof(emb: Column): Column = {
    val e = VectorOps.toDoubleArr(emb)
    array(planes.zipWithIndex.map { case (tablePlanes, t) =>
      tablePlanes.zipWithIndex.map { case (p, i) =>
        when(VectorOps.dot(e, typedLit(p)) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce((a: Column, b: Column) => a.bitwiseOR(b))
        .bitwiseOR(lit(t << 16))
    }: _*)
  }

  /** Exact cosine top-k: first `nQueries` vectors against the whole corpus.
    * Query side broadcast; per-query ranking via window. */
  def q37TopKBruteForce(spark: SparkSession, dir: String,
                        nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val corpus = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id".asc)
    corpus.join(broadcast(queries), $"neighbor_id" =!= $"query_id")
      .withColumn("cos", round(VectorOps.cosine($"qe", $"ne"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** ANN via hyperplane-LSH buckets: candidates share the full signature;
    * top-k within candidates. Scale path — no cross join anywhere. */
  def q38AnnLsh(spark: SparkSession, dir: String,
                nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val sigs = emb.select($"vec_id", explode(lshSignatures($"embedding")).as("sig"))
    // Candidate id pairs via bucket join (ids only), dedup across tables,
    // then fetch vectors and score once per candidate.
    val cand = sigs
      .join(broadcast(sigs.filter($"vec_id" < nQueries)
        .select($"sig", $"vec_id".as("query_id"))), Seq("sig"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id")).distinct()
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id".asc)
    cand
      .join(broadcast(emb.filter($"vec_id" < nQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))), "query_id")
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne")), "neighbor_id")
      .withColumn("cos", round(VectorOps.cosine($"qe", $"ne"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** Exact cosine top-k via the typed bounded-heap [[graft.functions.TopKAggregator]]
    * instead of a ranking window: partial top-k on every partition before the
    * shuffle — same result as q37, shuffle volume k·partitions instead of
    * every scored candidate. */
  def q47TopKAggregated(spark: SparkSession, dir: String,
                        nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    import graft.functions.TopKAggregator.{Scored, TopK}
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val scored = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne"))
      .join(broadcast(queries), $"neighbor_id" =!= $"query_id")
      .select($"query_id",
        struct($"neighbor_id".as("id"),
          round(VectorOps.cosine($"qe", $"ne"), 6).as("score")).as("scored"))
      .as[(Long, Scored)]
    scored.groupByKey(_._1).mapValues(_._2)
      .agg(new TopK(k).toColumn)
      .flatMap { case (q, items) =>
        items.zipWithIndex.map { case (s, i) => (q, i + 1, s.id, s.score) }
      }
      .toDF("query_id", "rank", "neighbor_id", "cos")
      .orderBy($"query_id", $"rank")
  }

  /** q170: contrastive hard-negative mining — for each query vector, the
    * k nearest neighbors whose LABEL DIFFERS from the query's (the
    * DPR/contrastive-training data-prep step: negatives that look maximally
    * like positives). Same bounded-heap shape as q47 — the label
    * constraint rides the broadcast-join predicate, so mismatched-label
    * pairs are dropped before scoring and the shuffle still moves only
    * k rows per (query × partition). The neighbor's label is re-attached
    * afterwards by joining the k×nQueries-bounded result back to the
    * corpus (broadcast probe side), not by widening the scored stream.
    */
  def q170HardNegatives(spark: SparkSession, dir: String,
                        nQueries: Int = 8, k: Int = 5): DataFrame = {
    import spark.implicits._
    import graft.functions.TopKAggregator.{Scored, TopK}
    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        $"label".as("qlabel"))
    val scored = emb
      .select($"vec_id".as("neighbor_id"), $"embedding".as("ne"), $"label")
      .join(broadcast(queries),
        $"neighbor_id" =!= $"query_id" && $"label" =!= $"qlabel")
      .select($"query_id",
        struct($"neighbor_id".as("id"),
          round(VectorOps.cosine($"qe", $"ne"), 6).as("score")).as("scored"))
      .as[(Long, Scored)]
    val top = scored.groupByKey(_._1).mapValues(_._2)
      .agg(new TopK(k).toColumn)
      .flatMap { case (q, items) =>
        items.zipWithIndex.map { case (s, i) => (q, i + 1, s.id, s.score) }
      }
      .toDF("query_id", "rank", "neighbor_id", "cos")
    emb.select($"vec_id".as("neighbor_id"), $"label".as("neighbor_label"))
      .join(broadcast(top), Seq("neighbor_id"))
      .select($"query_id", $"rank", $"neighbor_id", $"neighbor_label", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** q173: Johnson–Lindenstrauss random projection (64 → 16 dims) with a
    * distance-preservation audit — the embedding-compression sketch that
    * cuts ANN index memory 4× while approximately preserving pairwise
    * distances (Achlioptas-style ±1 Rademacher matrix). The matrix entry
    * sign(i,j) is derived from md5("i_j") first-hex-digit parity — a pure
    * function both engines (and any future reader of the sketch) compute
    * identically, so there is NO RNG state to ship. The audit reports, for
    * 40 deterministic (2k, 2k+1) vector pairs, the original distance and
    * the ratio of projected to d'-scaled original squared distance (JL
    * says ≈1).
    *
    * Cross-engine exactness: vectors quantize to 1e-6 fixed point once;
    * projections and both squared distances are exact integer sums (the
    * q166 discipline), and each output is one correctly-rounded division.
    * Scale shape: projection is scan-local arithmetic against the literal
    * 16×64 matrix (inlined in the task binary — model state); the audit
    * pairs are id-bounded, so both join sides broadcast.
    */
  /** md5("i_j")-parity Rademacher sign — the pure-function JL matrix
    * entry shared by q173/q174 and their oracles. */
  private def jlSign(i: Int, j: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_${j}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if ("13579bdf".contains(hex.head)) -1L else 1L
  }

  private def jlSigns(dOut: Int, d: Int = 64): Array[Array[Long]] =
    Array.tabulate(dOut, d)((j, i) => jlSign(i, j))

  private val JlFp = 1000000L

  /** 1e-6 fixed-point quantization of the embedding array. */
  private def jlQuant(emb: Column): Column =
    transform(emb, x => round(x.cast("double") * JlFp).cast("long"))

  /** Projection of a quantized vector through the literal sign matrix —
    * exact integer arithmetic, scan-local. */
  private def jlProject(xfp: Column, signs: Array[Array[Long]]): Column =
    array(signs.indices.map { j =>
      aggregate(zip_with(xfp, typedlit(signs(j).toSeq), (a, b) => a * b),
        lit(0L), (acc, v) => acc + v)
    }: _*)

  /** Exact integer squared L2 distance between two long-array columns. */
  private def jlSqDist(u: Column, v: Column): Column =
    aggregate(zip_with(u, v, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, w) => acc + w)

  def q173JlProjection(spark: SparkSession, dir: String,
                       dOut: Int = 16, nPairs: Int = 40): DataFrame = {
    import spark.implicits._
    val Fp = JlFp
    val signs = jlSigns(dOut)
    val pts = Tables.embeddings(spark, dir)
      .filter($"vec_id" < 2L * nPairs)
      .select($"vec_id", jlQuant($"embedding").as("xfp"))
      .select($"vec_id", $"xfp", jlProject($"xfp", signs).as("proj"))
    val a = pts.filter($"vec_id" % 2 === 0)
      .select(expr("vec_id div 2").as("pair_id"), $"vec_id".as("vec_a"),
        $"xfp".as("xa"), $"proj".as("pa"))
    val b = pts.filter($"vec_id" % 2 === 1)
      .select(expr("vec_id div 2").as("pair_id"), $"vec_id".as("vec_b"),
        $"xfp".as("xb"), $"proj".as("pb"))
    def sq(u: Column, v: Column): Column = jlSqDist(u, v)
    a.join(broadcast(b), Seq("pair_id"))
      .select($"pair_id", $"vec_a", $"vec_b",
        round(sq($"xa", $"xb").cast("double") / lit(Fp.toDouble * Fp), 6)
          .as("orig_dist_sq"),
        round(sq($"pa", $"pb").cast("double") / (lit(dOut.toLong) * sq($"xa", $"xb")), 6)
          .as("jl_ratio"))
      .orderBy($"pair_id")
  }

  /** q174: ANN through the JL sketch — the search path that makes q173's
    * projection useful: score the corpus against each query in the
    * 16-dim projected space (exact integer distances, scan-local literal
    * matrix), keep a `shortlist`-sized candidate set per query via the
    * bounded-heap aggregator, then re-rank ONLY the shortlist with exact
    * full-dimension cosine. A 4× narrower scan side and a re-rank bounded
    * by shortlist×nQueries — the standard sketch-then-refine ANN shape,
    * here with every stage deterministic so the whole pipeline is
    * oracle-checked (not just recall-floored like q38/q42).
    */
  def q174AnnJl(spark: SparkSession, dir: String, nQueries: Int = 8,
                k: Int = 5, dOut: Int = 16, shortlist: Int = 50): DataFrame = {
    import spark.implicits._
    import graft.functions.TopKAggregator.{Scored, TopK}
    val signs = jlSigns(dOut)
    val emb = Tables.embeddings(spark, dir)
    val pts = emb.select($"vec_id", jlQuant($"embedding").as("xfp"))
      .select($"vec_id", jlProject($"xfp", signs).as("proj"))
    val qs = pts.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"proj".as("qproj"))
    // Stage 1: projected-space shortlist. Scores are NEGATED integer
    // distances (exact in double far below 2^53), so the descending
    // bounded heap keeps the closest candidates; ties break on id.
    val cand = pts
      .join(broadcast(qs), $"vec_id" =!= $"query_id")
      .select($"query_id",
        struct($"vec_id".as("id"),
          (-jlSqDist($"proj", $"qproj")).cast("double").as("score"))
          .as("scored"))
      .as[(Long, Scored)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopK(shortlist).toColumn)
      .flatMap { case (q, items) => items.map(s => (q, s.id)) }
      .toDF("query_id", "neighbor_id")
    // Stage 2: exact re-rank of the bounded shortlist.
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id".asc)
    cand
      .join(broadcast(emb.filter($"vec_id" < nQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qe"))), "query_id")
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne")),
        "neighbor_id")
      .withColumn("cos", round(VectorOps.cosine($"qe", $"ne"), 6))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** IVF centroid training, split out so the trained model can be staged as
    * a write-once index artifact ([[graft.sources.Staged.ivfModel]] — the
    * composite recall audit q149 reads it; q42 itself keeps training inline
    * so the suite still times the full build). Deterministic (seeded sample,
    * seeded random init), so the staged and inline models are identical. */
  /** The sample fraction [[trainIvfModel]] draws at, from the optimizer's
    * size estimate of the corpus scan (no count() job; estRowBytes is
    * deliberately low so the row-count estimate errs high and the fraction
    * low — the post-draw clamp redraws on a shortfall). Exposed so the
    * partition-independence spec can prove its corpus actually engages the
    * fraction < 1 sampling path. */
  private[graft] def ivfTrainFraction(corpus: DataFrame, nCells: Int = 16): Double = {
    val maxTrainRows = math.max(nCells * 1000, 16 * 1024)
    val estRowBytes = 200L
    val estRows = math.max(1L,
      (corpus.queryExecution.optimizedPlan.stats.sizeInBytes / estRowBytes).toLong)
    math.min(1.0, 2.0 * maxTrainRows / estRows)
  }

  def trainIvfModel(corpus: DataFrame, nCells: Int = 16)
      : org.apache.spark.ml.clustering.KMeansModel = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val featurized = corpus.withColumn("norm_e", normalizeArr($"embedding"))
      .withColumn("features", array_to_vector($"norm_e"))
    // Train on a BOUNDED sample: centroid quality needs only ~1000 points per
    // cell, so the trainer's input is capped regardless of corpus size. The
    // sample fraction comes from the optimizer's size estimate of the scan —
    // no dedicated count() job, so the full corpus is scanned exactly twice:
    // once (partially, short-circuited by the limit) to draw the training
    // sample, once by the assignment pass below. Only the bounded sample is
    // cached (k-means runs several jobs over it); 2× oversampling before the
    // exact limit absorbs the row-size estimate's error.
    val maxTrainRows = math.max(nCells * 1000, 16 * 1024)
    def draw(fraction: Double) = {
      // Deterministic content-keyed draw, NOT sample(): per-partition RNG
      // seeding makes sample() depend on scan partitioning, so for corpora
      // large enough that fraction < 1 the trained centroids would vary
      // with session conf (maxPartitionBytes, file layout) — breaking the
      // "trained model is a pure value of the corpus" contract behind
      // Staged.ivfModel. A hash filter on the key admits exactly the same
      // rows under ANY partitioning (pinned by AnnStagedModelSpec's
      // above-the-cap partition-independence test).
      // Threshold floor of 1: a bare (fraction * 1e6).toLong truncates to
      // ZERO once fraction < 1e-6 (estimated corpus > ~6.5 TB — inside the
      // design envelope), admitting no rows and burning a full corpus scan
      // to draw an empty set; with ceil+floor the draw degrades to "admit
      // ~1 in a million" instead of cliffing, and the sorted limit still
      // caps the yield.
      val sampled =
        if (fraction >= 1.0) featurized
        else featurized.filter(
          pmod(xxhash64($"vec_id", lit(7)), lit(1000000L)) <
            math.max(1L, math.ceil(fraction * 1e6).toLong))
      // orderBy before the limit (the Pq.collectBoundedSample discipline):
      // a bare limit takes whichever sampled rows arrive first, which
      // depends on scan partitioning — i.e. on session conf — so the
      // "trained model is a pure value of the corpus" contract behind
      // Staged.ivfModel would silently break across sessions with
      // different maxPartitionBytes. Sorted limit plans as
      // TakeOrderedAndProject (per-partition top-k, never a global sort);
      // repartition restores trainer parallelism (≤ maxTrainRows rows —
      // a trivial shuffle).
      sampled.orderBy($"vec_id").limit(maxTrainRows)
        .select($"features").repartition(8).cache()
    }
    val fraction = ivfTrainFraction(corpus, nCells)
    // Clamp AFTER the draw: the size-based row estimate can undershoot when
    // actual bytes/row exceed ~2× estRowBytes (wider embeddings, page
    // overhead), which would silently train on too few points. count() here
    // materializes the cache the trainer needs anyway, so the check is free;
    // on a shortfall, redraw once with a fraction scaled by the observed
    // yield (then accept — a second miss means the corpus itself is small).
    val trainSet = {
      val first = draw(fraction)
      val n = first.count()
      if (n >= maxTrainRows || fraction >= 1.0) first
      else {
        first.unpersist(blocking = false)
        val scaled = math.min(1.0, fraction * (2.0 * maxTrainRows / math.max(n, 1L)))
        draw(scaled)
      }
    }
    // Random init (seeded): k-means|| costs several extra distributed passes
    // per init step, and IVF centroids only need to partition space roughly —
    // Lloyd iterations from a random seed are the standard IVF training.
    val model = new KMeans().setK(nCells).setSeed(7L).setMaxIter(4)
      .setInitMode("random")
      .fit(trainSet)
    trainSet.unpersist(blocking = false) // fit is eager; the sample is done
    model
  }

  /** IVF (inverted-file) ANN: k-means centroids partition the corpus; a
    * query probes only its nProbe nearest cells. Vectors are L2-normalized
    * first so euclidean cells align with cosine neighborhoods. At 100 TB the
    * assignment table is the index (bucketed by cell); training samples a
    * fraction — centroid count, not corpus size, bounds the driver state.
    * `model` supplies pre-trained centroids (the staged index artifact);
    * None trains inline — identical results either way (seeded training). */
  def q42AnnIvf(spark: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5,
                nCells: Int = 16, nProbe: Int = 4,
                model: Option[org.apache.spark.ml.clustering.KMeansModel] = None)
      : DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.functions.array_to_vector

    val base = Tables.embeddings(spark, dir)
    val emb = base.withColumn("norm_e", normalizeArr($"embedding"))
    val featurized = emb.withColumn("features", array_to_vector($"norm_e"))
    val m = model.getOrElse(trainIvfModel(base, nCells))
    // Assignment = one narrow pass over the corpus (model broadcast by ML).
    val assigned = m.transform(featurized)
      .select($"vec_id", $"embedding", $"prediction".as("cell"))
    val centers = m.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cell", "center")
    // query → nProbe nearest cells (tiny cross join: nQueries × nCells)
    val probeW = Window.partitionBy($"query_id").orderBy($"center_dist".asc, $"cell".asc)
    val probes = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"norm_e".as("qn"), $"embedding".as("qe"))
      .crossJoin(broadcast(centers))
      .withColumn("center_dist", -VectorOps.cosine($"qn", $"center"))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter($"probe_rank" <= nProbe)
      .select($"query_id", $"qe", $"cell")
    val rankW = Window.partitionBy($"query_id").orderBy($"cos".desc, $"vec_id".asc)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", round(VectorOps.cosine($"qe", $"embedding"), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"vec_id".as("neighbor_id"), $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** L2-normalize a float array to a double array. Native kernel: the HOF
    * form ([[normalizeArrHof]]) nests the norm aggregate inside the
    * per-element lambda, re-evaluating it per element outside codegen —
    * measured ~3× the whole q42 runtime on its own. */
  def normalizeArr(a: Column): Column =
    graft.functions.NativeKernels.normalizeL2(a)

  /** Reference HOF formulation of [[normalizeArr]] (equivalence tests). */
  def normalizeArrHof(a: Column): Column = {
    val ad = VectorOps.toDoubleArr(a)
    val n = VectorOps.norm(ad)
    transform(ad, x => when(n === 0.0, lit(0.0)).otherwise(x / n))
  }

  /** LSH candidate id pairs for the all-pairs near-dup path: distinct
    * (left_id, right_id) sharing at least one long-code bucket. Cheap
    * distinct on two longs — the embedding arrays are never shuffled. Long
    * 16-bit codes (not q38's 4-bit ones) keep this self-join's output linear
    * in corpus size (expected ≈ true-pairs + tables·N²/2¹⁷ background); the
    * linearity is asserted in ExtSpec at two corpus sizes. */
  def nearDupCandidates(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sigs = corpus.select($"vec_id",
      explode(nearDupSignatures($"embedding")).as("sig"))
    sigs.select($"sig", $"vec_id".as("left_id"))
      .join(sigs.select($"sig", $"vec_id".as("right_id")), Seq("sig"))
      .filter($"left_id" < $"right_id")
      .select($"left_id", $"right_id").distinct()
  }

  /** Exact-verify LSH candidates: fetch both vectors per distinct pair, keep
    * cosine ≥ `minCos`. */
  def nearDupPairs(corpus: DataFrame, minCos: Double = 0.99): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = corpus.select($"vec_id", $"embedding")
    nearDupCandidates(corpus)
      .join(emb.select($"vec_id".as("left_id"), $"embedding".as("le")), "left_id")
      .join(emb.select($"vec_id".as("right_id"), $"embedding".as("re")), "right_id")
      .withColumn("cos", round(VectorOps.cosine($"le", $"re"), 6))
      .filter($"cos" >= minCos)
      .select($"left_id", $"right_id", $"cos")
      .orderBy($"left_id", $"right_id")
  }

  /** Batch ids sit above every other planted range (same device as
    * [[graft.ext.Dedup.BatchIdOffset]] on the documents side). */
  val BatchVecIdOffset = 3000000L

  /** The deterministic q151 ingest batch, derived from `embeddings` by id
    * arithmetic so the DuckDB oracle can restate it: 10 exact copies of the
    * first vectors (cos 1.0 — LSH recall provably 1, identical vectors
    * share every bucket) and 10 genuinely-new vectors (negated embeddings:
    * cosine −1 to their originals, and |cos| bounded by the corpus's ~0.6
    * natural maximum against everything else — measured dead zone: no
    * batch×corpus pair lands in [0.8, 0.99) at either oracle SF). */
  def incrementalEmbeddingBatch(emb: DataFrame): DataFrame = {
    val copies = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + BatchVecIdOffset).as("vec_id"), col("embedding"))
    val fresh = emb.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select((col("vec_id") + BatchVecIdOffset).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    copies.unionByName(fresh)
  }

  /** Materialize the corpus's exploded long-code LSH signature rows
    * (vec_id, sig) as a catalog table — the write-once index an ingest
    * maintains so no near-dup probe ever re-hashes the corpus. */
  def writeEmbeddingSigTable(corpus: DataFrame, table: String): Unit = {
    val spark = corpus.sparkSession
    // Dedup.dropForRewrite also clears a stale spark-warehouse LOCATION a
    // previous session left behind (DROP alone misses it and saveAsTable
    // then refuses with LOCATION_ALREADY_EXISTS — seen in the first bench
    // run of q151).
    Dedup.dropForRewrite(spark, table)
    corpus
      .select(col("vec_id"), explode(nearDupSignatures(col("embedding"))).as("sig"))
      .write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Incremental embedding near-dup against history — the third leg of the
    * no-corpus-rescan ingest family (exact: q112/q139; shingle near-dup:
    * q150; this: vector near-dup). Batch signature rows BROADCAST onto the
    * materialized signature table's stream (scan→broadcast-join, no
    * corpus-side exchange — plan-guarded), candidate (batch_id, history_id)
    * pairs are result-bounded, and the exact cosine verify fetches only
    * candidate history vectors by id. The LSH-signature kernel runs on the
    * batch alone; the corpus was hashed once, at table-write time. */
  def newEmbeddingNearDupsAgainstSigTable(spark: SparkSession, table: String,
                                          batch: DataFrame, history: DataFrame,
                                          minCos: Double = 0.99): DataFrame = {
    import spark.implicits._
    val bSigs = batch.select($"vec_id".as("batch_id"),
      explode(nearDupSignatures($"embedding")).as("sig"))
    val cand = spark.table(table).join(broadcast(bSigs), Seq("sig"))
      .select($"batch_id", $"vec_id".as("history_id")).distinct()
    cand
      .join(broadcast(batch.select($"vec_id".as("batch_id"),
        $"embedding".as("be"))), "batch_id")
      .join(history.select($"vec_id".as("history_id"),
        $"embedding".as("he")), "history_id")
      .withColumn("cos", round(VectorOps.cosine($"be", $"he"), 6))
      .filter($"cos" >= minCos)
      .select($"batch_id", $"history_id", $"cos")
      .orderBy($"batch_id", $"history_id")
  }

  /** q151: [[newEmbeddingNearDupsAgainstSigTable]] on the deterministic
    * batch against the staged per-corpus signature table (history = the
    * plain embeddings table). */
  def q151IncrementalEmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val table = graft.sources.Staged.embeddingSigTable(spark, dir)
    newEmbeddingNearDupsAgainstSigTable(spark, table,
      incrementalEmbeddingBatch(emb), emb)
  }

  /** Embedding near-dup detection: plant exact copies of the first 10
    * vectors, find pairs with cosine ≥ 0.99 via LSH buckets + exact verify
    * ([[nearDupCandidates]] → [[nearDupPairs]]). */
  def q39EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
    val corpus = base.unionByName(
        base.filter($"vec_id" < 10).withColumn("vec_id", $"vec_id" + 100000L))
    nearDupPairs(corpus)
  }

  /** Recall-floor COMPANION ORACLE for the ANN quartet q38/q42/q98/q99
    * (VERDICT r09 #4 pattern, completing it for the sketch/ANN family).
    * The ANN result sets stay `no_oracle` — DuckDB can't reproduce LSH
    * buckets or trained quantizers — but the property that makes each of
    * them AN ANSWER is SQL-statable: recall@5 against the exact brute-force
    * top-5 (q37) must clear a per-method floor. Every method is seeded and
    * trains on deterministic samples, so the realized recall is a pure
    * function of the fixture; the floors are MEASURED-MINUS-MARGIN
    * (round 16, VERDICT r15 #3 — the original 1.75×-headroom floors would
    * have let a 2× recall regression pass CORRECTNESS): realized values at
    * both oracle SFs are LSH 0.53–0.58, IVF 0.45–0.68, PQ 0.98–1.0,
    * IVFPQ 0.55–0.65 (graft.tools.AnnRecallProbe), floors sit ~10–25%
    * under the realized MINIMUM, so any genuine recall regression bites
    * while fixture-regeneration jitter does not — re-run the probe after
    * any regeneration and re-derive. All-DataFrame: hits counted by a LEFT SEMI
    * join of exact pairs against ANN pairs — 40-row sides, nothing
    * collected. DuckDB states the method domain, the data-derived query
    * count, and the required TRUEs. */
  def q149AnnRecallFloors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Eager localCheckpoint, not cache(): `exact` feeds eight sub-plans
    // (each method row uses it twice), but this function returns a lazy
    // frame, so a cache() would linger registered on the session forever
    // (the ADVICE-r11 anti-pattern). The checkpoint materializes 40 rows
    // eagerly and its blocks are reference-tracked — freed once the
    // returned frame is garbage.
    val exact = q37TopKBruteForce(spark, dir)
      .select($"query_id", $"neighbor_id").localCheckpoint()
    def row(method: String, ann: DataFrame, floor: Double): DataFrame = {
      // Both sides are k·nQueries rows, but the estimator can't see that
      // through the ranking pipelines — hint the ANN side so the hit count
      // is a broadcast semi-join, not a shuffle of two 40-row sets.
      val hits = exact.join(broadcast(ann.select($"query_id", $"neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      exact.agg(countDistinct($"query_id").as("n_queries"),
          count(lit(1)).as("total"))
        .crossJoin(hits.agg(count(lit(1)).as("hits")))
        .select(lit(method).as("method"), $"n_queries",
          ($"hits" >= $"total" * floor).as("recall_ge_floor"))
    }
    // Staged index artifacts (graft.sources.Staged — the q182/q186
    // staged-artifact convention): the audit is about RECALL, not about
    // re-timing four trainers; the builder queries q42/q98/q99 still train
    // inline, and the deterministic trainers make staged ≡ inline
    // (pinned by AnnStagedModelSpec), so this row set is unchanged.
    val staged = graft.sources.Staged
    row("ivf", q42AnnIvf(spark, dir,
        model = Some(staged.ivfModel(spark, dir))), 0.35)
      .unionByName(row("ivfpq", IvfPq.q99AnnIvfPq(spark, dir,
        trained = Some(staged.ivfpqQuantizers(spark, dir))), 0.45))
      .unionByName(row("lsh", q38AnnLsh(spark, dir), 0.4))
      .unionByName(row("pq", Pq.q98AnnPq(spark, dir,
        trained = Some(staged.pqCodebook(spark, dir))), 0.8))
      .orderBy($"method")
  }
}
