package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType,
  StructField, StructType}
import graft.ext.KMeans
import graft.sources.{Staged, TempDirs}

/** q176: the q166 k-means model deployed as a LIVE scoring monitor — the
  * cluster-drift deployment shape: a trained model (k×d fixed-point
  * centroids) scores embedding micro-batches as they land, and each batch
  * appends its per-cluster (count, exact integer inertia) delta; reading
  * the deltas back and summing reproduces the batch assignment report
  * EXACTLY, because per-vector distances are independent of batching and
  * the per-cluster sums are exact longs (associative). That is why q176
  * shares q166's DuckDB oracle verbatim — the streaming path is
  * hash-checked against the same ground truth as the batch path.
  *
  * Composition, all pre-existing engine pieces: file stream over the
  * staged two-delivery embeddings dir, `foreachBatch` running the
  * scan-local literal-centroid assignment, append sink of k-row deltas,
  * and a final bounded aggregate over deliveries×k rows.
  */
object KmeansMonitor {

  private val batchSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def q176StreamingKmeans(spark: SparkSession, dir: String,
                          k: Int = 4, iters: Int = 3): DataFrame = {
    import spark.implicits._
    val cents = KMeans.trainCentroids(spark, dir, k, iters)
    val watch = Staged.embeddingsWatchDir(spark, dir)
    val outDir = TempDirs.create("graft_kmmon_out_").toString
    // No maxFilesPerTrigger: per-vector scoring is batching-independent
    // and the per-cluster deltas are exact associative sums, so one
    // micro-batch reproduces the q166 report byte-for-byte at one fixed
    // foreachBatch round instead of two (multi-delivery folding is pinned
    // by KMeansSpec).
    val q = spark.readStream
      .schema(batchSchema)
      .parquet(watch)
      .writeStream
      .option("checkpointLocation", TempDirs.create("graft_kmmon_ck_").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        // foreachBatch is at-least-once: a retried micro-batch must not
        // double-count its (n, dist) deltas. Each batch OVERWRITES its own
        // batchId-keyed directory, so a replay is idempotent and the final
        // aggregate still exactly equals the q166 batch report.
        b.select(KMeans.assign(KMeans.quant(b.col("embedding")), cents).as("m"))
          .groupBy(col("m.cl").as("cluster"))
          // decimal(38,0): same overflow-proof exact-sum discipline as q166
          // (a LONG delta would wrap past ~3.6e4 extreme points per batch).
          .agg(count(lit(1)).as("n"),
            sum(col("m.dist").cast("decimal(38,0)")).as("dist"))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
      .groupBy($"cluster")
      .agg(sum($"n").as("n_points"),
        round(sum($"dist") / lit(1e12), 6).as("inertia"))
      .join(broadcast(KMeans.checksumFrame(spark, cents)), Seq("cluster"))
      .select($"cluster", $"n_points", $"inertia", $"centroid_checksum")
      .orderBy($"cluster")
  }
}
