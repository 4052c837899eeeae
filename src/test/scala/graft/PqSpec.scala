package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** Product-quantization ANN: planted-copy retrieval, recall against the
  * exact brute force, determinism, and the compressed-code width. */
class PqSpec extends SparkSpec {

  private lazy val base = graft.sources.Tables.embeddings(spark, sf0001)

  test("planted exact copies are retrieved at rank 1") {
    import spark.implicits._
    val planted = base.unionByName(
      base.filter($"vec_id" < 8).withColumn("vec_id", $"vec_id" + 100000L))
    val top1 = Pq.annPq(planted, nQueries = 8, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // A copy has the same code as its query, so ADC gives it the maximal
    // score; allow one miss for a pathological tie.
    val hits = (0L until 8L).count(q => top1.get(q).contains(q + 100000L))
    assert(hits >= 7, s"planted-copy top-1 hits: $hits/8 ($top1)")
  }

  test("recall@5 against the exact brute force clears the floor") {
    import spark.implicits._
    val exact = Similarity.q37TopKBruteForce(spark, sf0001, nQueries = 8, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val pq = Pq.annPq(base, nQueries = 8, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = exact.map { case (q, ids) => (pq(q) & ids).size.toDouble / ids.size }
      .sum / exact.size
    info(f"PQ recall@5 vs exact: $recall%.3f")
    // Measured 1.000 on the sf0.001 corpus (near-random embeddings, the
    // hardest case for a quantizer — the exact re-rank stage is what carries
    // it). Floor at 0.6 to absorb codebook/train-sample drift without
    // letting a real regression through.
    assert(recall >= 0.6, f"recall@5 $recall%.3f below floor")
  }

  test("the PQ path is deterministic across runs") {
    val a = Pq.annPq(base).collect().toSeq
    val b = Pq.annPq(base).collect().toSeq
    assert(a === b)
  }

  test("IVFPQ: planted exact copies are retrieved at rank 1") {
    import spark.implicits._
    val planted = base.unionByName(
      base.filter($"vec_id" < 8).withColumn("vec_id", $"vec_id" + 100000L))
    val top1 = graft.ext.IvfPq.annIvfPq(planted, nQueries = 8, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // A copy lands in its query's cell with an identical residual code, so
    // it survives the probe and wins the exact re-rank.
    val hits = (0L until 8L).count(q => top1.get(q).contains(q + 100000L))
    assert(hits >= 7, s"planted-copy top-1 hits: $hits/8 ($top1)")
  }

  test("IVFPQ: recall@5 vs exact clears the floor; the probe genuinely prunes") {
    import spark.implicits._
    val exact = Similarity.q37TopKBruteForce(spark, sf0001, nQueries = 8, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = graft.ext.IvfPq.annIvfPq(base, nQueries = 8, k = 5)
      .select($"query_id", $"neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = exact.map { case (q, ids) => (got(q) & ids).size.toDouble / ids.size }
      .sum / exact.size
    info(f"IVFPQ recall@5 vs exact: $recall%.3f")
    // nProbe/nCells = 4/16 bounds attainable recall by the cell restriction;
    // near-random embeddings spread true neighbors across cells, so this
    // floor is the regression guard for THAT trade, not absolute quality.
    assert(recall >= 0.3, f"recall@5 $recall%.3f below floor")
    // The cell restriction must actually prune: candidates admitted to ADC
    // stay well under queries x corpus.
    val n = base.count()
    val admitted = graft.ext.IvfPq.probedCandidates(base, nQueries = 8).count()
    assert(admitted < 8L * n * 2 / 3, s"probe admitted $admitted of ${8 * n}")
  }

  test("IVFPQ: deterministic across runs") {
    val a = graft.ext.IvfPq.annIvfPq(base).collect().toSeq
    val b = graft.ext.IvfPq.annIvfPq(base).collect().toSeq
    assert(a === b)
  }

  test("codes are m bytes per vector — 32x smaller than the raw floats") {
    import spark.implicits._
    val emb = base.withColumn("norm_e", Similarity.normalizeArr($"embedding"))
    val train = emb.orderBy($"vec_id").limit(256)
      .select($"norm_e").collect().map(_.getSeq[Double](0).toArray)
    val codebook = Pq.trainCodebooks(train)
    assert(codebook.length === Pq.M * Pq.K * Pq.SubDim)
    val widths = emb.select(
        graft.functions.NativeKernels.pqEncode($"norm_e", codebook, Pq.M, Pq.K, Pq.SubDim)
          .as("code"))
      .select(length($"code").as("w")).distinct().collect().map(_.getInt(0)).toSeq
    assert(widths === Seq(Pq.M))
  }
}
