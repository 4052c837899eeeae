package graft

import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** The events fixture's physical `ts` type has changed across driver
  * regenerations (parquet TIMESTAMP(NANOS) read as long via nanosAsLong →
  * TIMESTAMP_NTZ(MICROS), Aug 2026). The engine's internal contract is
  * fixed — `ts` = epoch-nanos LongType after [[Tables.normalizeEventsTs]] —
  * so every downstream query/stream is format-independent. This spec pins
  * the normalizer on all three input shapes at the same instant. */
class EventsTsNormalizeSpec extends SparkSpec {

  // 2026-03-01T12:34:56.789012 UTC, µs precision (exactly representable in
  // every shape the fixture has shipped).
  private val epochMicros = 1772368496789012L
  private val epochNanos = epochMicros * 1000L

  private def assertNormalized(df: org.apache.spark.sql.DataFrame): Unit = {
    val out = Tables.normalizeEventsTs(df)
    assert(out.schema("ts").dataType == LongType)
    // Column position preserved: downstream code indexes events columns.
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.select(col("ts")).head.getLong(0) == epochNanos)
  }

  test("long ts passes through untouched") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, epochNanos, "click")),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType), StructField("event_type", StringType))))
    assertNormalized(df)
  }

  test("timestamp_ntz ts converts exactly under the UTC session zone") {
    val ntz = LocalDateTime.of(2026, 3, 1, 12, 34, 56, 789012000)
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, ntz, "click")),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType), StructField("event_type", StringType))))
    assertNormalized(df)
  }

  test("timestamp (tz-adjusted) ts converts exactly") {
    val ts = Timestamp.from(java.time.Instant.ofEpochSecond(
      epochMicros / 1000000L, (epochMicros % 1000000L) * 1000L))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, ts, "click")),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampType), StructField("event_type", StringType))))
    assertNormalized(df)
  }

  test("unexpected ts type is rejected loudly, not silently miscast") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, "2026-03-01", "click")),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", StringType), StructField("event_type", StringType))))
    intercept[IllegalStateException](Tables.normalizeEventsTs(df))
  }

  test("readEventsRaw adapts to the on-disk fixture and loader derives ts/ts_ns") {
    // Whatever format the current fixture ships, the raw read must yield
    // long nanos and the loader's derived frame must agree with it.
    val raw = Tables.readEventsRaw(spark, s"$sf0001/events.parquet")
    assert(raw.schema("ts").dataType == LongType)
    val viaLoader = Tables.events(spark, sf0001)
    assert(viaLoader.schema("ts_ns").dataType == LongType)
    assert(viaLoader.schema("ts").dataType == TimestampType)
    val (rawMin, loaderMin) = (
      raw.agg(min(col("ts"))).head.getLong(0),
      viaLoader.agg(min(col("ts_ns"))).head.getLong(0))
    assert(rawMin == loaderMin)
    // ts is the µs truncation of ts_ns by construction.
    val bad = viaLoader.filter(
      unix_micros(col("ts")) =!= expr("ts_ns div 1000")).count()
    assert(bad == 0L)
  }
}
