package graft

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sources.{Staged, Tables}
import graft.streaming.EventsStream

/** The streaming twin of [[EventsTsNormalizeSpec]]: the events fixture's
  * physical `ts` type has shifted under the engine once already (ns
  * TIMESTAMP → µs TIMESTAMP_NTZ, Aug 2026), and the STREAMING queries read
  * through their own fixed schema ([[EventsStream.rawSchema]]) against the
  * [[Staged.eventsWatchDir]] staging — a second, independent read path that
  * a future format shift could break while the batch loaders stay green
  * (exactly how round 8 lost q23/q82/q134). This spec drives every writable
  * fixture generation end-to-end through eventsWatchDir → readStream, so a
  * shape regression fails HERE, not in the driver's correctness gate.
  *
  * (The ns-era TIMESTAMP(NANOS) physical shape is not writable from Spark —
  * only pyarrow produced it; its read adaptation is pinned by
  * EventsTsNormalizeSpec via `nanosAsLong` and by the real-fixture test
  * below, which exercises whatever generation is currently on disk.)
  */
class StreamFixtureShapesSpec extends SparkSpec {

  // Same instant as EventsTsNormalizeSpec: 2026-03-01T12:34:56.789012 UTC.
  private val epochMicros = 1772368496789012L
  private val epochNanos = epochMicros * 1000L

  /** A one-row events fixture with `ts` in the given physical shape, written
    * where the staging expects it (`<dir>/events.parquet`). */
  private def writeFixture(tsType: DataType, tsValue: Any): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_shape_").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
        java.util.List.of(Row(1L, tsValue, 7L, "click", 1.5, "{}")), schema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Read the staged watch dir exactly as the streaming queries do. */
  private def streamOnce(dir: String): Seq[Row] = {
    val watchDir = Staged.eventsWatchDir(spark, dir)
    val name = s"shape_probe_${System.nanoTime()}"
    val q = spark.readStream
      .schema(EventsStream.rawSchema)
      .parquet(watchDir)
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).collect().toIndexedSeq
  }

  private def assertShape(tsType: DataType, tsValue: Any): Unit = {
    val rows = streamOnce(writeFixture(tsType, tsValue))
    assert(rows.size == 1)
    val r = rows.head
    assert(r.getLong(r.fieldIndex("ts")) == epochNanos,
      s"staged stream read must yield epoch-nanos ts for physical $tsType")
    assert(r.getLong(r.fieldIndex("event_id")) == 1L)
    assert(r.getString(r.fieldIndex("event_type")) == "click")
  }

  test("long (normalized/ns-era post-read) fixture streams through rawSchema") {
    assertShape(LongType, epochNanos)
  }

  test("timestamp_ntz (µs-era) fixture streams through rawSchema") {
    assertShape(TimestampNTZType,
      LocalDateTime.of(2026, 3, 1, 12, 34, 56, 789012000))
  }

  test("timestamp (tz-adjusted) fixture streams through rawSchema") {
    assertShape(TimestampType, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(epochMicros / 1000000L,
        (epochMicros % 1000000L) * 1000L)))
  }

  test("current on-disk fixture generation streams and matches the batch loader") {
    val viaStream = streamOnce(sf0001)
    val viaBatch = Tables.events(spark, sf0001)
    assert(viaStream.size == viaBatch.count())
    val streamMin = viaStream.map(r => r.getLong(r.fieldIndex("ts"))).min
    val batchMin = viaBatch.agg(min(col("ts_ns"))).head.getLong(0)
    assert(streamMin == batchMin,
      "stream raw read and batch loader must agree on epoch-nanos ts")
  }
}
