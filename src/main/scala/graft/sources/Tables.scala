package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders for the driver testdata layout (`TESTDATA.md`): one parquet
  * file per table under a scale-factor directory.
  *
  * Mirrors the reference's source surface (SURVEY.md §2 S1-S4): directory
  * scoped, schema-on-read, format options explicit. The engine-internal
  * format is Parquet (columnar, statistics, predicate pushdown) — a strict
  * superset of the reference's CSV behavior (`scripts/etl_process.py:71-74`).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One registration state per SESSION (its monitor is the lock — one lock
  // per session, not a global mutex: registerAll may run cold multi-file
  // staging jobs under its lock, and a global monitor serialized every
  // other session's registration behind them; same-session callers still
  // serialize, register-THEN-publish ordering below). One map, not the
  // pre-round-16 lock-map + dir-map pair: a single entry per session is
  // what [[dropSession]] can actually evict atomically.
  private final class RegState { var dir: String = null }
  private val registrations =
    new java.util.concurrent.ConcurrentHashMap[String, RegState]()

  /** Cache key for a session. The classic session's UUID is unique for the
    * JVM's lifetime; identityHashCode (the pre-round-8 key) is NOT — two
    * live sessions can collide and silently share cached frames / staged
    * catalog tables. (Entries still pin their session for the JVM lifetime;
    * that is the registry's deliberate design, same as Staged.) */
  private[graft] def sessionKey(spark: SparkSession): String = spark match {
    case c: org.apache.spark.sql.classic.SparkSession =>
      org.apache.spark.sql.graftshim.sessionUUIDOf(c)
    case other => System.identityHashCode(other.sessionState).toHexString
  }

  /** Reads the table through [[Staged.tableDir]]: the big tables are
    * re-staged once per JVM into a multi-file layout so scan stages
    * parallelize (the raw fixture is one file with one row group — a
    * single-task scan however wide the cluster); small dims read raw.
    * Row set and schema are identical either way.
    *
    * The analyzed DataFrame is memoized per (session, dir, table):
    * `spark.read.parquet` costs a fresh file listing + footer schema read
    * per call, a pure driver-side tax when 141 bench queries each re-open
    * the same ten tables. Logical plans are immutable, so sharing one
    * frame across queries is free. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    // Through Staged.getOrStage, NOT computeIfAbsent with the build inline:
    // the first load of a big table runs the whole multi-file re-staging
    // Spark job (tableDir), and running THAT inside a ConcurrentHashMap
    // compute would hold the bin lock for the build's duration — any
    // concurrent load hashing to the same bin (the 8-thread warmup's cold
    // sf0.001 pass) blocks on an unrelated table's staging instead of on
    // the memoized holder. getOrStage publishes a lazy holder instantly
    // and runs the build outside any map lock.
    Staged.getOrStage(s"tabledf:${sessionKey(spark)}:$dir:$name") {
      spark.read.parquet(Staged.tableDir(spark, dir, name))
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Normalize the events `ts` column to a LongType epoch-nanos column named
    * `ts` (same position), whatever physical type the fixture carries.
    * Fixture generations have shipped parquet TIMESTAMP(NANOS) (read as long
    * via `nanosAsLong`) and TIMESTAMP_NTZ(MICROS); the engine's internal
    * contract is fixed regardless: `ts` = epoch ns as long. The NTZ cast to
    * TimestampType is exact because every entry point pins the session
    * timezone to UTC (Bench/Verify/SparkEntry builders). */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def toNanos = df.select(df.columns.map { c =>
      if (c == "ts") (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts")
      else col(c)
    }.toIndexedSeq: _*)
    df.schema("ts").dataType match {
      case LongType => df
      case _: TimestampNTZType =>
        // An NTZ value is a wall-clock; its cast to TimestampType reads it
        // IN THE SESSION ZONE. Every engine entry point pins UTC, but a
        // caller from a non-UTC session would silently shift every event —
        // fail loudly at this boundary instead.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventsTs requires spark.sql.session.timeZone=UTC to " +
            s"convert TIMESTAMP_NTZ exactly (session zone is '$tz')")
        toNanos
      case _: TimestampType => toNanos // instant-typed: zone-independent
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

  /** Adaptive raw read of an events parquet file/dir: handles both the
    * ns-era fixture (TIMESTAMP(NANOS) → nanosAsLong) and the µs-era fixture
    * (TIMESTAMP_NTZ) and always returns `ts` as epoch-nanos LongType.
    *
    * Side effect: persistently sets `spark.sql.legacy.parquet.nanosAsLong`
    * on the session (NOT save/restored — the conf is read again at scan
    * execution, and [[Staged.prepare]] runs reads concurrently, so a
    * scoped restore could race another in-flight read). The flag only
    * changes how NANOS-unit parquet loads, a type nothing else reads. */
  def readEventsRaw(s: SparkSession, path: String): DataFrame = {
    // No-op for µs/NTZ data; required so a NANOS-unit fixture loads as long
    // instead of failing with [PARQUET_TYPE_ILLEGAL].
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(s.read.parquet(path))
  }

  /** The events table: `ts_ns` (LongType epoch nanos, exact ordering/output
    * parity with ns-native engines) + a µs-truncated TimestampType `ts` for
    * window/date functions. The staged copy already holds `ts` as INT64
    * nanos ([[Staged.tableDir]] normalizes at staging); the
    * [[normalizeEventsTs]] pass here is a type-adaptive no-op on that and a
    * real conversion on any un-staged layout. */
  def events(s: SparkSession, d: String): DataFrame =
    // getOrStage, like every other memoized layout (its Holder design runs
    // the build OUTSIDE the map's compute, so the nested load() is fine —
    // the legacy local-CHM form here had a documented double-build race).
    Staged.getOrStage(s"eventsdf:${sessionKey(s)}:$d") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(load(s, d, "events"))
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
    }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** Embeddings with the element type pinned to `array<float>`, whatever
    * width the fixture shipped. Same defense as [[normalizeEventsTs]] (the
    * events fixture's physical type DID change under round 8): three native
    * kernels (`NormalizeL2F`, both LSH signature expressions) read elements
    * with `getFloat`, so a regenerated `array<double>` fixture would not
    * fail analysis — it would silently mis-read 4 bytes of every 8-byte
    * slot. One cast at the scan boundary (free when the fixture is already
    * float; columnar, codegen'd when not) keeps every downstream kernel on
    * the type it was written for. Pinned by EmbeddingsWidthSpec. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case _: ArrayType =>
        df.withColumn("embedding", df.col("embedding").cast("array<float>"))
      case other => throw new IllegalStateException(
        s"embeddings.embedding must be an array column, fixture has $other")
    }
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses. `events` goes through its ns-safe
    * loader. Idempotent per (session, dir): re-registering ten views per
    * SQL query is pure driver latency, so repeat calls for the same dir
    * are no-ops (a dir CHANGE re-registers everything). Register-THEN-
    * publish, under a lock: publishing the dir first let a concurrent
    * caller (the bench's parallel warmup) see "already registered", skip,
    * and run its SQL against views that did not exist yet
    * (TABLE_OR_VIEW_NOT_FOUND on `customer`, seen in exactly that race). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val key = sessionKey(spark)
    val state = registrations.computeIfAbsent(key, _ => new RegState)
    state.synchronized {
      if (state.dir != dir) {
        all.foreach { n =>
          val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
          df.createOrReplaceTempView(n)
        }
        state.dir = dir
      }
    }
  }

  /** Teardown hook for a long-lived driver that churns sessions (the
    * MvRewrite.clear posture): drops this session's registration state
    * here, its memoized frames in [[Staged]], AND the tuned clones
    * [[graft.Tuning.sessionFor]] derived from it (each clone pins the
    * parent, so skipping them would keep the dropped session reachable).
    * Without it, each discarded session leaks one registration entry plus
    * its cached table frames for the JVM's lifetime — the deliberate
    * default for the bench/verify single-session shape, wrong for a
    * session-per-request server. Staged DISK artifacts are keyed per
    * corpus, not per session, and are untouched (still shared, still
    * TempDirs-cleaned at JVM exit). */
  def dropSession(spark: SparkSession): Unit = {
    val key = sessionKey(spark)
    graft.Tuning.dropClonesOf(key)(clone => dropState(sessionKey(clone)))
    dropState(key)
  }

  private def dropState(key: String): Unit = {
    registrations.remove(key)
    Staged.dropSession(key)
  }

  /** CSV reader with the reference's option semantics (S1,
    * `scripts/etl_process.py:71-74`): header, explicit delimiter, explicit
    * schema (the reference reads untyped; we type at the edge). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .schema(schema)
      .csv(path)
}
