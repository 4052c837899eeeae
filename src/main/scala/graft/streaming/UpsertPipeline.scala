package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.ops.{EmissionsEtl, Merge}

/** The reference's complete event-driven pipeline (SURVEY.md §3.1+§3.2) as
  * one Structured Streaming job: file lands in a watched directory → P1-P8
  * transform → keyed last-write-wins merge into a versioned parquet
  * warehouse table.
  *
  * Semantics preserved from the reference:
  *  - at-least-once delivery + idempotent merge ⇒ effectively-once results
  *    (`scripts/lambda_handler_warehouse.py:95-101`);
  *  - later-arriving files win on key conflict (the sequential per-file loop
  *    at `:79`) — within a micro-batch, file order is imposed explicitly via
  *    `_metadata.file_path`;
  *  - the warehouse table is readable at every point (versioned directories,
  *    latest-complete wins; a real deployment swaps in a table format's
  *    atomic commit, but the merge operator is identical).
  */
object UpsertPipeline {

  /** Latest committed warehouse state (empty with the warehouse schema if
    * nothing has been committed yet). Resolution and the `_SUCCESS`-gated
    * commit discipline live in [[graft.ops.VersionedTable]]. */
  def currentTable(spark: SparkSession, warehouseDir: String): DataFrame =
    graft.ops.VersionedTable.read(spark, warehouseDir, EmissionsEtl.warehouseSchema)

  /** Merge one transformed batch into the warehouse (new version dir). */
  def commitBatch(spark: SparkSession, warehouseDir: String, transformed: DataFrame): Unit = {
    val merged = Merge.upsert(currentTable(spark, warehouseDir), transformed,
      EmissionsEtl.mergeKeys)
    merged.write.mode(SaveMode.Overwrite)
      .parquet(graft.ops.VersionedTable.nextVersionPath(spark, warehouseDir))
  }

  /** Same event-driven pipeline, but the sink is the JDBC warehouse — the
    * reference's actual target (Postgres RDS; embedded Derby in tests).
    * `foreachBatch` + the staged-MERGE upsert give the same
    * at-least-once + idempotent ⇒ effectively-once contract as the parquet
    * path: a re-delivered batch MERGEs to the same state. */
  def runOnceJdbc(spark: SparkSession, landingDir: String, jdbcUrl: String,
                  checkpointDir: String): Unit = {
    implicit val s: SparkSession = spark
    val raw = spark.readStream
      .schema(EmissionsEtl.rawSchema)
      .option("header", "true")
      .option("delimiter", ",")
      .csv(landingDir)
      .withColumn("__file", col("_metadata.file_path"))
    val q = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val transformed = EmissionsEtl.transform(batch, carryCols = Seq("__file"))
        val unique = Merge.latestPerKey(transformed, EmissionsEtl.mergeKeys, Seq("__file"))
          .drop("__file")
        graft.sinks.JdbcWarehouse.upsertBatch(unique, jdbcUrl)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** CDC variant of the pipeline: the landing directory receives operation
    * logs (data columns + a monotone sequence + an I/U/D op), and each
    * micro-batch is applied to the versioned warehouse with
    * [[Merge.applyCdc]] — merge-with-deletes, the Debezium/DMS consumption
    * shape. Same delivery contract as the upsert path: applyCdc is
    * idempotent over any re-delivered log suffix, so at-least-once file
    * delivery yields effectively-once table state. */
  def runOnceCdc(spark: SparkSession, landingDir: String, warehouseDir: String,
                 checkpointDir: String,
                 logSchema: org.apache.spark.sql.types.StructType,
                 keys: Seq[String], seqCol: String, opCol: String): Unit = {
    implicit val s: SparkSession = spark
    val dataSchema = org.apache.spark.sql.types.StructType(
      logSchema.filterNot(f => f.name == seqCol || f.name == opCol))
    val raw = spark.readStream
      .schema(logSchema)
      .option("header", "true")
      .csv(landingDir)
    val q = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val target = graft.ops.VersionedTable.read(spark, warehouseDir, dataSchema)
        Merge.applyCdc(target, batch, keys, seqCol, opCol)
          .write.mode(SaveMode.Overwrite)
          .parquet(graft.ops.VersionedTable.nextVersionPath(spark, warehouseDir))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Incremental-view maintenance over the event stream (the streaming form
    * of q92's refresh algebra): each micro-batch contributes PARTIAL
    * aggregate states (count, raw sum) per (day, event_type), folded into
    * the maintained rollup with one small groupBy — the rollup table is
    * touched per batch, the event history is never rescanned. Combine is
    * commutative/associative, so batch boundaries don't affect the result;
    * the checkpoint guarantees each file folds in exactly once. */
  def runOnceRollup(spark: SparkSession, landingDir: String, warehouseDir: String,
                    checkpointDir: String): Unit = {
    implicit val s: SparkSession = spark
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rollupSchema = StructType(Seq(
      StructField("day", TimestampType), StructField("event_type", StringType),
      StructField("n_events", LongType), StructField("sum_value", DoubleType)))
    val raw = spark.readStream
      .schema(EventsStream.rawSchema)
      .parquet(landingDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = batch
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        val target = graft.ops.VersionedTable.read(spark, warehouseDir, rollupSchema)
        target.unionByName(partial)
          .groupBy(col("day"), col("event_type"))
          .agg(sum(col("n_events")).as("n_events"), sum(col("sum_value")).as("sum_value"))
          .write.mode(SaveMode.Overwrite)
          .parquet(graft.ops.VersionedTable.nextVersionPath(spark, warehouseDir))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Run the pipeline over everything currently in `landingDir`, then stop
    * (Trigger.AvailableNow). Call repeatedly as new files land — or swap the
    * trigger for a continuous schedule; checkpointing makes either safe. */
  def runOnce(spark: SparkSession, landingDir: String, warehouseDir: String,
              checkpointDir: String): Unit = {
    implicit val s: SparkSession = spark
    val raw = spark.readStream
      .schema(EmissionsEtl.rawSchema)
      .option("header", "true")
      .option("delimiter", ",")
      .csv(landingDir)
      .withColumn("__file", col("_metadata.file_path"))
    val q = raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Reference semantics: later files win. Impose file order inside the
        // batch, make it key-unique, then merge.
        val transformed = EmissionsEtl.transform(batch, carryCols = Seq("__file"))
        val unique = Merge.latestPerKey(transformed, EmissionsEtl.mergeKeys, Seq("__file"))
          .drop("__file")
        commitBatch(spark, warehouseDir, unique)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
