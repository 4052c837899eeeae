package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.queries.Analytics
import graft.streaming.EventsStream

/** Regression guard for the session-gap boundary semantics (probing a
  * round-4 advice finding): the shared DuckDB oracle breaks a session only
  * when the gap is STRICTLY greater than 30 minutes. Spark's
  * `session_window` MERGES on delta ≤ gap (touching sessions merge — this
  * spec is the measurement), so the plain 30-minute gap matches the oracle
  * exactly: an event landing EXACTLY 30 minutes after its predecessor stays
  * in the same session; 30 minutes + 1 µs splits. The advice's proposed
  * +1 µs nudge assumed half-open `delta < gap` semantics and would flip the
  * boundary the wrong way — this fixture is what proves it. Asserted for
  * both the batch (q24) and streaming (q82) paths, which share the oracle. */
class SessionBoundarySpec extends SparkSpec {

  private val T0 = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in ns
  private val Min30 = 30L * 60 * 1000000000L
  private val Us1 = 1000L

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_fix_").toString
    val rows = Seq(
      // user 1: +30m exactly (same session), then +30m+1µs (new session)
      Row(1L, T0, 1L, "click", 1.0, "{}"),
      Row(2L, T0 + Min30, 1L, "click", 2.0, "{}"),
      Row(3L, T0 + Min30 + Min30 + Us1, 1L, "click", 4.0, "{}"),
      // user 2: +30m+1µs immediately — two single-event sessions
      Row(4L, T0, 2L, "click", 8.0, "{}"),
      Row(5L, T0 + Min30 + Us1, 2L, "click", 16.0, "{}"))
    val staging = java.nio.file.Files.createTempDirectory("graft_sess_stage_")
    spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        EventsStream.rawSchema)
      .coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    // The production layout (and the file-stream source, which does not
    // descend into subdirectories) expects events.parquet as a single FILE.
    // Files.list holds a directory handle until closed (same discipline
    // as Staged.eventsWatchDir).
    val listing = java.nio.file.Files.list(staging)
    var moved = false
    try {
      val part = listing.iterator()
      while (part.hasNext && !moved) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.move(p, java.nio.file.Paths.get(dir, "events.parquet"))
          moved = true
        }
      }
    } finally listing.close()
    require(moved, "no part file produced")
    dir
  }

  // (user_id, session_start_s, n_events, sum_value)
  private val expected = Seq(
    (1L, T0 / 1000000000L, 2L, 3.0),
    (1L, (T0 + Min30 + Min30 + Us1) / 1000000000L, 1L, 4.0),
    (2L, T0 / 1000000000L, 1L, 8.0),
    (2L, (T0 + Min30 + Us1) / 1000000000L, 1L, 16.0))

  test("batch q24: exactly-30-minute gap stays in session, +1µs splits") {
    val got = Analytics.q24Sessions(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("streaming q82 agrees with the batch path on the boundary fixture") {
    val got = EventsStream.q82StreamingSessions(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
  }
}
