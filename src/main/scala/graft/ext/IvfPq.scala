package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.NativeKernels
import graft.sources.Tables

/** IVFPQ — the composed index (Jégou et al. 2011 §IV, the faiss `IVFx,PQy`
  * default for billion-scale search): an IVF coarse quantizer partitions the
  * corpus into cells, and each vector stores only the PQ code of its
  * RESIDUAL against its cell centroid. Search probes the `nProbe` cells
  * nearest the query and ADC-scores codes within them:
  *
  *   score(x) ≈ dot(q, c_cell)  +  adc(q, residual_code)
  *
  * (exact decomposition of dot(q, c + r); only the residual is quantized).
  *
  * Why the composition matters at 100 TB: flat PQ still scans every code for
  * every query; IVF restriction cuts the scanned fraction to ~nProbe/nCells
  * while residual encoding — residuals are smaller and better centered than
  * raw vectors — recovers most of the quantization error the coarse split
  * introduces. The index table is (cell, 8-byte code) per vector, bucketable
  * by cell; both quantizers train on ONE bounded sample; the per-query state
  * is nProbe probe rows + one 8 KB ADC table.
  *
  * All hot-path work is native-kernel codegen: [[graft.functions.ArgminCentroid]]
  * (cell assignment), [[graft.functions.PqEncodeResidual]] (residual
  * subtracted inline during encode — never materialized), and the shared
  * [[graft.functions.PqAdcScore]]. Driver state: 16 coarse centroids + the
  * shared PQ codebook. Approximate candidates ⇒ no SQL oracle (like
  * q38/q42/q98); PqSpec asserts planted-copy retrieval, recall vs exact,
  * pruning, and determinism.
  */
object IvfPq {

  val NCells = 16
  val NProbe = 4

  /** Train both IVFPQ quantizers — (coarse centroids, residual PQ codebook)
    * — from ONE bounded sample: coarse on the raw sample (trainCodebooks
    * degenerates to full-dim k-means at m=1), then the PQ codebook on the
    * sample's residuals. Split out so the pair can be staged as write-once
    * index state ([[graft.sources.Staged.ivfpqQuantizers]]; q99 keeps
    * training inline so the suite still times the full build). */
  def trainQuantizers(corpus: DataFrame,
                      sample: Option[Array[Array[Double]]] = None)
      : (Array[Double], Array[Double]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // `sample` = the pre-collected bounded draw (see Pq.trainedCodebook):
    // Staged shares ONE collect across the PQ and IVFPQ trainers.
    val train = sample.getOrElse {
      val emb = corpus.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
      Pq.collectBoundedSample(corpus, emb)
    }
    val coarse = Pq.trainCodebooks(train, m = 1, k = NCells, subDim = Pq.Dims)
    val residuals = train.map { v =>
      val cell = assignDriver(v, coarse)
      Array.tabulate(Pq.Dims)(d => v(d) - coarse(cell * Pq.Dims + d))
    }
    (coarse, Pq.trainCodebooks(residuals))
  }

  /** IVFPQ ANN over a (`vec_id`, `embedding`) corpus. `trained` = staged
    * quantizers (None trains inline; identical results — deterministic). */
  def annIvfPq(corpus: DataFrame, nQueries: Int = 8, k: Int = 5,
               nProbe: Int = NProbe, rerank: Int = Pq.RerankDepth,
               trained: Option[(Array[Double], Array[Double])] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = corpus.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
    val (coarse, codebook) = trained.getOrElse(trainQuantizers(corpus))
    // The index: (cell, residual code) — 9 bytes of index state per vector.
    val codes = emb
      .withColumn("cell", NativeKernels.argminCentroid($"norm_e", coarse, NCells, Pq.Dims))
      .select($"vec_id", $"cell",
        NativeKernels.pqEncodeResidual($"norm_e", $"cell", coarse, codebook,
          Pq.M, Pq.K, Pq.SubDim).as("code"))
    // Per-query probe rows: the nProbe cells with the largest dot(q, c_cell),
    // each carrying that scalar and the query's shared residual ADC table.
    val probes = emb.filter($"vec_id" < nQueries)
      .select($"vec_id", $"norm_e").collect()
      .flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getSeq[Double](1).toArray
        val tbl = Pq.adcTable(q, codebook).toSeq
        val cellDots = Array.tabulate(NCells) { c =>
          var s = 0.0
          var d = 0
          while (d < Pq.Dims) { s += q(d) * coarse(c * Pq.Dims + d); d += 1 }
          (c, s)
        }
        cellDots.sortBy { case (c, s) => (-s, c) }.take(nProbe)
          .map { case (c, s) => (qid, c, s, tbl) }
      }.toSeq.toDF("query_id", "cell", "cell_dot", "tbl")
    // Stage 1: ADC within probed cells only (cell equi-join prunes the scan).
    val adcW = Window.partitionBy($"query_id").orderBy($"adc".desc, $"vec_id".asc)
    val candidates = codes.join(broadcast(probes), "cell")
      .filter($"vec_id" =!= $"query_id")
      .withColumn("adc", $"cell_dot" + NativeKernels.pqAdcScore($"code", $"tbl", Pq.K))
      .withColumn("adc_rank", row_number().over(adcW))
      .filter($"adc_rank" <= rerank)
      .select($"query_id", $"vec_id".as("neighbor_id"))
    // Stage 2: exact re-rank of the bounded candidate set.
    Pq.exactRerank(corpus, candidates, nQueries, k)
  }

  /** The candidate pool the cell restriction admits (pre-ADC) — exposed so
    * tests can assert the probe actually prunes. */
  private[graft] def probedCandidates(corpus: DataFrame, nQueries: Int = 8,
                                      nProbe: Int = NProbe): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = corpus.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
    val train = Pq.collectBoundedSample(corpus, emb)
    val coarse = Pq.trainCodebooks(train, m = 1, k = NCells, subDim = Pq.Dims)
    val cells = emb.withColumn("cell",
      NativeKernels.argminCentroid($"norm_e", coarse, NCells, Pq.Dims))
    val probes = emb.filter($"vec_id" < nQueries)
      .select($"vec_id", $"norm_e").collect()
      .flatMap { r =>
        val qid = r.getLong(0)
        val q = r.getSeq[Double](1).toArray
        Array.tabulate(NCells) { c =>
          var s = 0.0
          var d = 0
          while (d < Pq.Dims) { s += q(d) * coarse(c * Pq.Dims + d); d += 1 }
          (c, s)
        }.sortBy { case (c, s) => (-s, c) }.take(nProbe).map { case (c, _) => (qid, c) }
      }.toSeq.toDF("query_id", "cell")
    cells.join(broadcast(probes), "cell").select($"query_id", $"vec_id")
  }

  private def assignDriver(v: Array[Double], coarse: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < NCells) {
      var d2 = 0.0
      var d = 0
      while (d < Pq.Dims) {
        val x = v(d) - coarse(c * Pq.Dims + d)
        d2 += x * x
        d += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** q99: IVFPQ ANN over the embeddings table. `trained` = staged
    * quantizers (None trains inline; identical results — deterministic). */
  def q99AnnIvfPq(spark: SparkSession, dir: String,
                  trained: Option[(Array[Double], Array[Double])] = None): DataFrame =
    annIvfPq(Tables.embeddings(spark, dir), trained = trained)
}
