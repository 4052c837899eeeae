package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{NativeKernels, VectorOps}
import graft.sources.Tables

/** SemDeDup — semantic deduplication by k-means clustering + within-cluster
  * cosine pruning (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication", arXiv:2303.09540).
  *
  * The published recipe, re-expressed Spark-first:
  *  1. cluster the embedding corpus with k-means (the same bounded-sample
  *     trainer the IVF index uses — [[Pq.trainCodebooks]] at m=1);
  *  2. assign every vector to its nearest centroid (codegen'd
  *     [[graft.functions.ArgminCentroid]] kernel — one scan, no shuffle);
  *  3. within each cluster only, compare all pairs; where cosine ≥ ε keep
  *     the better-ranked vector and drop the other.
  *
  * Why this shape holds at 100 TB: the cluster assignment turns the
  * quadratic all-pairs problem into Σ n_c² work over cells that the
  * cluster count keeps bounded — the scale rule is nCells ∝ N / targetCell
  * (SemDeDup's own configuration: 50k clusters for LAION-440M ≈ 9k vectors
  * per cell), so per-cell pair work is a constant and total work is linear
  * in N. The pair generation is a self-equi-join on `cell` — Spark shuffles
  * both sides on the cell key once (or broadcasts, at test scale) and never
  * forms a cross product. Driver state is the centroid array (nCells·64
  * doubles), exactly the IVF coarse-quantizer footprint.
  *
  * Keep/drop policy (deterministic): vectors in a near-dup pair are ranked
  * by (cosine-to-own-centroid DESC, vec_id ASC) — "keep the most central,
  * then the oldest". Within one cell, ranking by dot-to-centroid is the
  * same order as Euclidean distance to the centroid (|x| = 1 after L2
  * normalization, |c| fixed per cell), so this is the paper's
  * distance-to-centroid rule with a total tie-break. A dropped vector
  * reports its best-ranked qualifying neighbor as `kept_id`.
  *
  * Oracle strategy (the q144/q145 planted-copy pattern): exact copies of
  * the first 25 vectors are planted at `vec_id + 2e6`. An exact copy lands
  * in its original's cell by construction (identical vector ⇒ identical
  * argmin), ties on centrality, and loses the id tie-break — so the planted
  * copy set is exactly the expected drop list, SQL-statable in DuckDB. The
  * natural corpus has no cosine ≥ 0.99 pair (the q39 dead-zone analysis),
  * so no extra rows appear.
  */
object SemDedup {

  /** Cluster count floor at test scale. */
  val NCells = 16

  /** Target vectors per cell — the knob the scale rule divides by. */
  val TargetCell = 256

  /** The scale rule made executable: nCells = max(16, N/256), so per-cell
    * pair work stays ~TargetCell²/2 and total work linear in N. (At true
    * 100 TB scale the k-means itself would train hierarchically /
    * mini-batch rather than from one 4096-row sample; the assignment and
    * pairing SHAPE — one codegen'd argmin scan, one cell-key equi-join —
    * is what carries over unchanged.) */
  def cellsFor(n: Long): Int =
    // Clamp in LONG space before the narrowing: (n / TargetCell).toInt
    // wraps negative past ~5.5e11 vectors, and max(16, negative) would
    // silently collapse to the 16-cell floor — Θ(n²) pair work instead of
    // the linear rule this function exists to enforce.
    math.max(NCells.toLong, math.min(n / TargetCell, Int.MaxValue.toLong)).toInt

  /** Semantic near-dup drops over a (`vec_id`, `embedding`) corpus.
    * Returns (dropped_id, kept_id, cos) ordered by dropped_id. */
  def semDedup(corpus: DataFrame, eps: Double = 0.99,
               nCells: Int = NCells): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val emb = corpus.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
    val train = Pq.collectBoundedSample(corpus, emb)
    val coarse = Pq.trainCodebooks(train, m = 1, k = nCells, subDim = Pq.Dims)
    val cents = (0 until nCells)
      .map(c => (c, coarse.slice(c * Pq.Dims, (c + 1) * Pq.Dims).toSeq))
      .toDF("cell", "centroid")
    // One scan: cell assignment (codegen kernel) + centrality score. The
    // centroid table is nCells rows — broadcast by construction.
    val assigned = emb
      .withColumn("cell",
        NativeKernels.argminCentroid($"norm_e", coarse, nCells, Pq.Dims))
      .join(broadcast(cents), "cell")
      .withColumn("cdot", VectorOps.cosine($"norm_e", $"centroid"))
      .select($"cell", $"vec_id", $"norm_e", $"cdot")
    // Within-cluster pairs: equi-join on cell (the one shuffle), exact
    // cosine on the survivors. Directional filter: a outranks b ⇒ b drops.
    val a = assigned.select($"cell", $"vec_id".as("a_id"),
      $"norm_e".as("a_e"), $"cdot".as("a_p"))
    val b = assigned.select($"cell", $"vec_id".as("b_id"),
      $"norm_e".as("b_e"), $"cdot".as("b_p"))
    val pairs = a.join(b, Seq("cell"))
      .filter($"a_id" =!= $"b_id")
      .withColumn("cos", VectorOps.cosine($"a_e", $"b_e"))
      .filter($"cos" >= eps)
      .filter($"a_p" > $"b_p" || ($"a_p" === $"b_p" && $"a_id" < $"b_id"))
    // Per dropped vector: the best-ranked neighbor it yields to. Groups are
    // near-dup-degree-sized — the window is over a handful of rows.
    val w = Window.partitionBy($"b_id").orderBy($"a_p".desc, $"a_id".asc)
    pairs.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"b_id".as("dropped_id"), $"a_id".as("kept_id"),
        round($"cos", 6).as("cos"))
      .orderBy($"dropped_id")
  }

  /** Planted-copy id offset (above q39's 1e5 near-dup range). */
  val CopyIdOffset = 2000000L

  /** q152: SemDeDup over embeddings + exact copies of the first 25 vectors
    * at `vec_id + 2e6` — the drop list is exactly the planted copies. */
  def q152SemDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val corpus = base.unionByName(base.filter($"vec_id" < 25)
      .select(($"vec_id" + CopyIdOffset).as("vec_id"), $"embedding"))
    // The cluster count follows the corpus (scale rule above); the planted
    // drop-list oracle is nCells-independent — identical vectors share a
    // cell under ANY centroid set.
    semDedup(corpus, nCells = cellsFor(corpus.count()))
  }
}
