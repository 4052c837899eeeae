package graft

import graft.ext.{IvfPq, Pq, Similarity}
import graft.sources.Staged

/** Staged ANN index artifacts ([[graft.sources.Staged.ivfModel]] /
  * [[graft.sources.Staged.pqCodebook]] /
  * [[graft.sources.Staged.ivfpqQuantizers]]) are what q149 reads instead of
  * retraining all three quantizers inline. These tests pin the contract
  * that makes that substitution sound: every trainer is deterministic, so
  * the staged-artifact path returns EXACTLY the rows the inline-training
  * path returns. */
class AnnStagedModelSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q42 IVF: staged model path ≡ inline training path") {
    val staged = Similarity.q42AnnIvf(spark, sf0001,
      model = Some(Staged.ivfModel(spark, sf0001)))
    val inline = Similarity.q42AnnIvf(spark, sf0001)
    assert(rows(staged) == rows(inline))
  }

  test("q98 PQ: staged codebook path ≡ inline training path") {
    val staged = Pq.q98AnnPq(spark, sf0001,
      trained = Some(Staged.pqCodebook(spark, sf0001)))
    val inline = Pq.q98AnnPq(spark, sf0001)
    assert(rows(staged) == rows(inline))
  }

  test("q99 IVFPQ: staged quantizer path ≡ inline training path") {
    val staged = IvfPq.q99AnnIvfPq(spark, sf0001,
      trained = Some(Staged.ivfpqQuantizers(spark, sf0001)))
    val inline = IvfPq.q99AnnIvfPq(spark, sf0001)
    assert(rows(staged) == rows(inline))
  }

  test("IVF training is partition-independent: different partitioning " +
    "of a corpus LARGER than the training cap trains the identical model") {
    // The staged-model contract: the trained model is a pure value of the
    // corpus. Two historical traps, both pinned here:
    //  - a bare limit() takes whichever rows arrive first (partitioning-
    //    dependent) — fixed by the sorted limit;
    //  - sample()'s per-partition RNG seeding makes WHICH rows pass the
    //    pre-limit filter depend on scan partitioning — fixed by the
    //    deterministic xxhash64(vec_id) draw. That path only engages once
    //    the size estimate puts the corpus above 2×maxTrainRows (32768
    //    estimated rows), so the corpus here is replicated until the
    //    ACTUAL computed fraction is < 1 — asserted, not assumed (the
    //    round-12 version of this test resolved fraction = 1.0 and never
    //    exercised the sampling draw).
    // Per-replica-scaled vectors make replica identity visible in the
    // centroids; train under 2- and 64-partition layouts of the same rows.
    import org.apache.spark.sql.functions._
    val base = graft.sources.Tables.embeddings(spark, sf0001)
    val big = (0 until 80).map { r =>
      base.select((col("vec_id") + r * 1000000L).as("vec_id"),
        transform(col("embedding"),
          x => x * lit(1.0f + r / 100.0f)).as("embedding"))
    }.reduce(_ unionByName _)
    val fraction = Similarity.ivfTrainFraction(big)
    assert(fraction < 1.0,
      s"test corpus must engage the sampling draw, got fraction=$fraction")
    def centers(parts: Int) =
      Similarity.trainIvfModel(big.repartition(parts)).clusterCenters
        .map(_.toArray.toSeq).toSeq
    assert(centers(2) == centers(64))
  }

  test("staged artifacts are memoized: second fetch is the same instance") {
    val a = Staged.pqCodebook(spark, sf0001)
    val b = Staged.pqCodebook(spark, sf0001)
    assert(a eq b)
    val m1 = Staged.ivfModel(spark, sf0001)
    val m2 = Staged.ivfModel(spark, sf0001)
    assert(m1 eq m2)
    val q1 = Staged.ivfpqQuantizers(spark, sf0001)
    val q2 = Staged.ivfpqQuantizers(spark, sf0001)
    assert(q1 eq q2)
  }
}
