package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming superset of the reference's event-driven micro-batch
  * pipeline (SURVEY.md §2 O1): file-arrival source → event-time windowed
  * aggregation with watermark → sink. `Trigger.AvailableNow` + memory sink
  * make it synchronously testable on static parquet; in production the same
  * query runs continuously with checkpointing (exactly-once via idempotent
  * foreachBatch merge — see graft.ops.Merge).
  */
object EventsStream {

  /** Raw parquet schema of events (ns timestamps read as long). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly per-type counts/sums computed as a streaming query — identical
    * result (and DuckDB oracle) to the batch q22. Complete output mode: every
    * window is emitted at termination regardless of watermark position. */
  def q23StreamingHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = s"graft_stream_${System.nanoTime()}"
    // The file stream source wants a directory to watch; stage the static
    // fixture behind a symlink so the same code serves a live landing dir.
    val watchDir = java.nio.file.Files.createTempDirectory("graft_stream_src_")
    java.nio.file.Files.createSymbolicLink(
      watchDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(rawSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select($"w.start".as("bucket_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"bucket_start", $"event_type")
  }

  /** Sessionization as a streaming query — session windows (30-minute gap)
    * over the same file-arrival source, identical result (and DuckDB oracle)
    * to the batch q24. Session state is merged across micro-batches by the
    * session-window state store. Complete output mode is what makes the
    * run-once parity check possible (every session emitted at termination);
    * it retains all window state, so a CONTINUOUS production run would use
    * append/update mode instead, where the watermark evicts closed
    * sessions and bounds state. */
  def q82StreamingSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = s"graft_sessions_${System.nanoTime()}"
    val watchDir = java.nio.file.Files.createTempDirectory("graft_stream_sess_")
    java.nio.file.Files.createSymbolicLink(
      watchDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(rawSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      // Boundary semantics: session_window merges on delta ≤ gap (touching
      // sessions merge — pinned by SessionBoundarySpec), identical to the
      // shared q24 oracle's strictly-greater-than-30-minutes break rule, so
      // the plain 30-minute gap is exact.
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .select($"user_id", unix_timestamp($"w.start").as("session_start_s"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start_s")
  }
}
