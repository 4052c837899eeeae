package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.NativeKernels
import graft.sources.Tables

/** Product-quantization (PQ) ANN — the memory-compression path for
  * similarity search at 100 TB (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011).
  *
  * The corpus is stored as `m` one-byte sub-codebook indices per vector —
  * 8 bytes against 256 bytes of raw float64[64], a 32× compression — and a
  * query is scored against codes only, via an `m × k` lookup table of
  * dot(query_sub, centroid) partial products ("asymmetric distance", ADC).
  * The raw embeddings are touched exactly twice, both narrow scans: once
  * (sample-bounded) for training, once to encode. Search scans the code
  * table, never the vectors.
  *
  * Scale posture:
  *  - codebook state is m·k·subDim doubles (8 KB here) — driver/broadcast
  *    trivial at any corpus size;
  *  - training input is a BOUNDED sample (≤ `MaxTrainRows` rows regardless
  *    of corpus size), the same sample-bounding discipline as the IVF
  *    trainer ([[Similarity.q42AnnIvf]]); the Lloyd iterations run on the
  *    driver over ~2 MB — centroid count, not corpus size, is the state;
  *  - the ADC scan is embarrassingly parallel over code-table partitions and
  *    composes with IVF (probe cells first, ADC within cells — "IVFPQ") when
  *    even the code table is too large to scan per query;
  *  - search is the standard two-stage pipeline: ADC prunes to the top-R in
  *    the compressed domain, then ONLY those R vectors per query are fetched
  *    for exact cosine re-ranking — raw-vector I/O is bounded by R·queries,
  *    independent of corpus size.
  *
  * Encode and score are native codegen kernels ([[graft.functions.PqEncode]]
  * with the trained codebook attached as a generated-code reference object,
  * [[graft.functions.PqAdcScore]] for the table lookup sum).
  *
  * Approximate scores ⇒ no SQL oracle (like q38/q42); PqSpec asserts
  * planted-copy top-1 recall, recall@5 against the exact brute force,
  * determinism, and the 8-byte code width.
  */
object Pq {

  val M = 8          // subspaces
  val K = 256        // centroids per subspace — one byte per code
  val Dims = 64
  val SubDim = Dims / M
  val MaxTrainRows = 4096
  val LloydIters = 8
  val RerankDepth = 64 // ADC-top-R candidates re-scored exactly

  /** Driver-side Lloyd over the bounded sample: per subspace, k centroids
    * initialized from evenly-spaced sample rows (deterministic — no RNG),
    * refined `iters` rounds; an emptied cluster keeps its previous centroid.
    * Returns the flattened [(mi·k + ki)·subDim] codebook. */
  def trainCodebooks(samples: Array[Array[Double]], m: Int = M, k: Int = K,
                     subDim: Int = SubDim, iters: Int = LloydIters): Array[Double] = {
    require(samples.nonEmpty, "PQ training needs a non-empty sample")
    val n = samples.length
    val flat = new Array[Double](m * k * subDim)
    for (mi <- 0 until m) {
      val cents = Array.tabulate(k) { ki =>
        val row = samples(((ki.toLong * n) / k).toInt % n)
        Array.tabulate(subDim)(d => row(mi * subDim + d))
      }
      val assign = new Array[Int](n)
      for (_ <- 0 until iters) {
        var i = 0
        while (i < n) {
          var best = 0; var bestD = Double.MaxValue
          var ki = 0
          while (ki < k) {
            var d2 = 0.0; var d = 0
            while (d < subDim) {
              val x = samples(i)(mi * subDim + d) - cents(ki)(d)
              d2 += x * x; d += 1
            }
            if (d2 < bestD) { bestD = d2; best = ki }
            ki += 1
          }
          assign(i) = best
          i += 1
        }
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        i = 0
        while (i < n) {
          val a = assign(i); counts(a) += 1
          var d = 0
          while (d < subDim) { sums(a)(d) += samples(i)(mi * subDim + d); d += 1 }
          i += 1
        }
        var ki = 0
        while (ki < k) {
          if (counts(ki) > 0) {
            var d = 0
            while (d < subDim) { cents(ki)(d) = sums(ki)(d) / counts(ki); d += 1 }
          }
          ki += 1
        }
      }
      for (ki <- 0 until k; d <- 0 until subDim)
        flat((mi * k + ki) * subDim + d) = cents(ki)(d)
    }
    flat
  }

  /** ADC lookup table for one query: tbl[mi·k + ki] = dot(q_sub(mi), c(mi,ki)). */
  def adcTable(q: Array[Double], codebook: Array[Double], m: Int = M, k: Int = K,
               subDim: Int = SubDim): Array[Double] = {
    val tbl = new Array[Double](m * k)
    for (mi <- 0 until m; ki <- 0 until k) {
      var s = 0.0
      var d = 0
      while (d < subDim) {
        s += q(mi * subDim + d) * codebook((mi * k + ki) * subDim + d)
        d += 1
      }
      tbl(mi * k + ki) = s
    }
    tbl
  }

  /** PQ ANN over an arbitrary corpus frame (`vec_id`, `embedding`): train on
    * a bounded sample, encode the corpus once, ADC-score the first
    * `nQueries` vectors against the code table, then exactly re-rank the
    * ADC top-`rerank` candidates — the standard two-stage PQ pipeline
    * (coarse compressed-domain prune, exact refine on a bounded set). Only
    * `rerank` raw vectors per query are ever fetched. */
  /** Bounded deterministic training sample of normalized vectors — the
    * estimate-then-draw discipline of q42; the orderBy before the limit pins
    * WHICH sample rows survive, so trained codebooks — and every downstream
    * code — are run-deterministic. ≤ [[MaxTrainRows]] rows (~2 MB) at any
    * corpus size.
    *
    * The pre-limit draw is a deterministic xxhash64(vec_id) filter, NOT
    * sample() — the same fix trainIvfModel got in round 13: sample()'s
    * per-partition RNG seeding admits different rows under different scan
    * partitioning, so for corpora past the sampling cap the trained
    * PQ/IVFPQ codebooks (and SemDedup's coarse clustering) would depend
    * on session conf, breaking the "staged artifact ≡ inline training"
    * contract. A content-keyed draw admits the same rows under ANY
    * partitioning. Shortfall handling mirrors trainIvfModel (the size
    * estimate can err low): one scaled redraw, then a full sorted-limit
    * draw as the always-correct floor — which also covers stats-less
    * plans whose Long.MaxValue size sentinel drives fraction to ~0. */
  private[graft] def collectBoundedSample(corpus: DataFrame, emb: DataFrame): Array[Array[Double]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val estRowBytes = 200L
    val estRows = math.max(1L,
      (corpus.queryExecution.optimizedPlan.stats.sizeInBytes / estRowBytes).toLong)
    def draw(fraction: Double): Array[Array[Double]] = {
      val sampled = if (fraction >= 1.0) emb
        else emb.filter(
          pmod(xxhash64($"vec_id", lit(11)), lit(1000000L)) <
            math.max(1L, math.ceil(fraction * 1e6).toLong))
      sampled.orderBy($"vec_id").limit(MaxTrainRows)
        .select($"norm_e").collect()
        .map(_.getSeq[Double](0).toArray)
    }
    val fraction = math.min(1.0, 2.0 * MaxTrainRows / estRows)
    val first = draw(fraction)
    if (first.length >= MaxTrainRows || fraction >= 1.0) first
    else {
      val scaled = math.min(1.0,
        fraction * (2.0 * MaxTrainRows / math.max(first.length, 1)))
      val second = draw(scaled)
      if (second.length >= MaxTrainRows) second else draw(1.0)
    }
  }

  /** Stage 2 shared by the PQ and IVFPQ paths: exact cosine re-rank of a
    * bounded candidate set — only `rerank`·queries raw vectors are fetched
    * regardless of corpus size. */
  private[ext] def exactRerank(corpus: DataFrame, candidates: DataFrame,
                               nQueries: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val queryVecs = corpus.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val rankW = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    candidates
      .join(broadcast(queryVecs), "query_id")
      .join(corpus.select($"vec_id".as("neighbor_id"), $"embedding".as("ne")),
        "neighbor_id")
      .withColumn("cos", round(graft.functions.VectorOps.cosine($"qe", $"ne"), 6))
      .withColumn("rank", row_number().over(rankW))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cos")
      .orderBy($"query_id", $"rank")
  }

  /** Train the PQ codebook from the corpus's bounded deterministic sample —
    * split out so the trained artifact can be staged as write-once index
    * state ([[graft.sources.Staged.pqCodebook]]; q98 keeps training inline
    * so the suite still times the full build). */
  def trainedCodebook(corpus: DataFrame,
                      sample: Option[Array[Array[Double]]] = None): Array[Double] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def collect() = {
      val emb = corpus.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
      collectBoundedSample(corpus, emb)
    }
    // `sample` short-circuits the draw with a PRE-collected bounded sample:
    // the PQ and IVFPQ trainers draw the IDENTICAL sample (same seed, same
    // sorted limit), so Staged collects it once per corpus and feeds both —
    // the codebook is bit-identical either way (AnnStagedModelSpec).
    trainCodebooks(sample.getOrElse(collect()))
  }

  def annPq(corpus: DataFrame, nQueries: Int = 8, k: Int = 5,
            rerank: Int = RerankDepth,
            trained: Option[Array[Double]] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = corpus.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
    val codebook = trained.getOrElse(
      trainCodebooks(collectBoundedSample(corpus, emb)))
    val codes = emb.select($"vec_id",
      NativeKernels.pqEncode($"norm_e", codebook, M, K, SubDim).as("code"))
    val queryTables = emb.filter($"vec_id" < nQueries)
      .select($"vec_id", $"norm_e").collect()            // bounded: nQueries rows
      .map(r => (r.getLong(0), adcTable(r.getSeq[Double](1).toArray, codebook).toSeq))
      .toSeq.toDF("query_id", "tbl")
    // Stage 1: compressed-domain prune — scan codes only, keep ADC top-R.
    val adcW = Window.partitionBy($"query_id").orderBy($"adc".desc, $"vec_id".asc)
    val candidates = codes.crossJoin(broadcast(queryTables))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adc", NativeKernels.pqAdcScore($"code", $"tbl", K))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter($"adc_rank" <= rerank)
      .select($"query_id", $"vec_id".as("neighbor_id"))
    exactRerank(corpus, candidates, nQueries, k)
  }

  /** q98: PQ ANN over the embeddings table. `trained` = a staged codebook
    * (None trains inline; identical results — deterministic trainer). */
  def q98AnnPq(spark: SparkSession, dir: String,
               trained: Option[Array[Double]] = None): DataFrame =
    annPq(Tables.embeddings(spark, dir), trained = trained)
}
