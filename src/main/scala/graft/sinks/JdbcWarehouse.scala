package graft.sinks

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC warehouse sink — the reference's warehouse IS a relational database:
  * Postgres RDS with a natural-key UNIQUE constraint, a staging table loaded
  * first, and `INSERT ... ON CONFLICT (key...) DO UPDATE SET ReportedValue =
  * EXCLUDED.ReportedValue` (reference
  * `scripts/lambda_handler_warehouse.py:45-101`). This sink reproduces that
  * exact shape over plain JDBC:
  *
  *  - target DDL with a surrogate identity `id` (the reference's `SERIAL
  *    PRIMARY KEY`, SURVEY §2a K5) and the 6-column natural UNIQUE key;
  *  - each batch staged via `df.write.jdbc` (parallel partition writes —
  *    `numPartitions` bounds the connection fan-in, the knob that matters
  *    when a 1000-executor job meets a database with finite connections);
  *  - one set-based ANSI `MERGE` from staging into the target per batch —
  *    the standard-SQL equivalent of Postgres's ON CONFLICT upsert, matching
  *    [[graft.ops.Merge.upsert]] last-write-wins semantics (null keys never
  *    match — a null-key row always inserts, as under Postgres UNIQUE).
  *
  * Sequential per-batch staging mirrors the reference's per-file loop
  * (`:79`): later batches win on key conflict. Tests run it against embedded
  * Derby (the JDBC database available in-container) as the stand-in for
  * Postgres; everything here is ANSI SQL + vanilla JDBC, so the URL is the
  * only Postgres-specific piece.
  *
  * Identifiers are uppercase-quoted throughout: Spark's JDBC writer quotes
  * column names, and unquoted DDL identifiers fold to uppercase in the
  * catalog — mixed-case DataFrame columns would otherwise never resolve.
  */
object JdbcWarehouse {

  val TableName = "EUROPEAN_GHG_PROJECTIONS"
  /** Per-invocation staging name: a FIXED name (the reference's choice, and
    * this sink's through round 12) lets two concurrent loads against the
    * same database cross-contaminate — one caller's DROP/CREATE lands mid
    * way through the other's staged write, so rows fail with
    * table-not-found or silently merge as part of the WRONG batch. A
    * unique suffix per upsert keeps staging private to its load (the same
    * session-keyed-name fix the catalog stagings got in round 13); the
    * table is dropped after the merge. */
  private def freshStagingName(): String =
    "TEMP_EUROPEAN_GHG_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(12).toUpperCase
  /** Natural key (reference `:63`). */
  val KeyCols = Seq("COUNTRY", "YEAR", "SCENARIO", "CATEGORY", "GAS", "UNIT")
  /** All data columns, in reference DDL order (`:54-64`). */
  val DataCols =
    Seq("COUNTRY", "YEAR", "SCENARIO", "CATEGORY", "GAS", "REPORTEDVALUE", "UNIT")

  private def q(n: String) = "\"" + n + "\""
  /** Column DDL. The target sets NOT NULL on the natural-key columns (the
    * staging table stays nullable, like the reference's temp table): a
    * null-key staged row never matches MERGE's `t.K = s.K` predicate, so
    * without the constraint each re-delivered batch would quietly INSERT a
    * fresh duplicate — the constraint turns that into a loud load failure.
    * (Deliberate hardening over the reference's all-nullable Postgres DDL,
    * `lambda_handler_warehouse.py:54-64`.) */
  private def colDdl(notNullKeys: Boolean) = {
    val types = Seq(
      "COUNTRY" -> "VARCHAR(256)", "YEAR" -> "INTEGER",
      "SCENARIO" -> "VARCHAR(256)", "CATEGORY" -> "VARCHAR(256)",
      "GAS" -> "VARCHAR(256)", "REPORTEDVALUE" -> "DOUBLE",
      "UNIT" -> "VARCHAR(256)")
    types.map { case (c, t) =>
      val nn = if (notNullKeys && KeyCols.contains(c)) " NOT NULL" else ""
      s"${q(c)} $t$nn"
    }.mkString(", ")
  }

  private def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: Connection, name: String): Boolean = {
    // getTables treats the name as a PATTERN: every table name here carries
    // underscores (single-char wildcards), so an unescaped probe can
    // false-positively match a similarly-named table and skip the CREATE.
    val esc = conn.getMetaData.getSearchStringEscape
    val literal = name.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
    val rs = conn.getMetaData.getTables(null, null, literal, Array("TABLE"))
    try rs.next() finally rs.close()
  }

  /** Reference `create_table_command` (`:53-65`): surrogate identity id +
    * natural UNIQUE key. Key columns are NOT NULL in the target (see
    * [[colDdl]]); the pipeline additionally drops null-key rows upstream
    * (P2), exactly as the reference's ETL does. */
  def ensureTarget(url: String): Unit = withConnection(url) { conn =>
    if (!tableExists(conn, TableName)) {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE ${q(TableName)} (
           | "ID" INTEGER NOT NULL GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
           | ${colDdl(notNullKeys = true)},
           | CONSTRAINT "UQ_GHG" UNIQUE (${KeyCols.map(q).mkString(", ")})
           |)""".stripMargin)
      catch {
        // Check-then-create race: two concurrent first loads both see the
        // table absent; the loser's CREATE throws. If the table exists NOW,
        // the winner created it and this load proceeds; anything else is a
        // real DDL failure and propagates.
        case e: java.sql.SQLException =>
          if (!tableExists(conn, TableName)) throw e
      }
      finally st.close()
    }
  }

  /** Reference `create_temporary_table_command` (`:68-70`): same shape as
    * the target, no id, recreated empty per load. */
  private def createStaging(url: String, staging: String): Unit =
    withConnection(url) { conn =>
      val st = conn.createStatement()
      try {
        if (tableExists(conn, staging))
          st.executeUpdate(s"DROP TABLE ${q(staging)}")
        st.executeUpdate(s"CREATE TABLE ${q(staging)} (${colDdl(notNullKeys = false)})")
      } finally st.close()
    }

  private def dropStaging(url: String, staging: String): Unit =
    try withConnection(url) { conn =>
      val st = conn.createStatement()
      try { if (tableExists(conn, staging)) st.executeUpdate(s"DROP TABLE ${q(staging)}") }
      finally st.close()
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort cleanup

  /** Load one batch: stage via parallel `df.write.jdbc`, then one set-based
    * MERGE into the target (reference `import_into_real_table_command`
    * `:95-101`). `batch` must carry the warehouse columns (any case) and be
    * key-unique (enforce upstream with [[graft.ops.Merge.latestPerKey]]). */
  def upsertBatch(batch: DataFrame, url: String, numPartitions: Int = 4): Unit = {
    ensureTarget(url)
    val staging = freshStagingName()
    createStaging(url, staging)
    try {
      val upper = batch.select(batch.columns.toIndexedSeq.map(c => col(c).as(c.toUpperCase)): _*)
        .select(DataCols.map(col): _*)
      upper.repartition(numPartitions)
        .write.mode(SaveMode.Append).jdbc(url, q(staging), new Properties())
      val on = KeyCols.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      withConnection(url) { conn =>
        val st = conn.createStatement()
        val mergeSql =
          s"""MERGE INTO ${q(TableName)} t
             |USING ${q(staging)} s ON $on
             |WHEN MATCHED THEN UPDATE SET "REPORTEDVALUE" = s."REPORTEDVALUE"
             |WHEN NOT MATCHED THEN INSERT (${DataCols.map(q).mkString(", ")})
             |VALUES (${DataCols.map(c => s"s.${q(c)}").mkString(", ")})""".stripMargin
        // ANSI MERGE lacks ON CONFLICT's concurrent-insert semantics: two
        // concurrent loads inserting the same new key both take the NOT
        // MATCHED branch and the second commit violates UQ_GHG. A retry
        // re-evaluates the MERGE against the now-committed row (MATCHED →
        // UPDATE), converging to the same state ON CONFLICT would produce.
        // SQLState class 23 = integrity-constraint violation.
        var attempts = 0
        var done = false
        try while (!done) {
          attempts += 1
          try { st.executeUpdate(mergeSql); done = true }
          catch {
            case e: java.sql.SQLException
                if Option(e.getSQLState).exists(_.startsWith("23")) && attempts < 3 =>
              () // unique-violation race: re-evaluate against committed rows
          }
        } finally st.close()
      }
    } finally dropStaging(url, staging)
  }

  /** Read the warehouse table back as a DataFrame (id excluded — the
    * surrogate is load-order-dependent, the natural key is the identity). */
  def readTable(spark: SparkSession, url: String): DataFrame =
    spark.read.jdbc(url, q(TableName), new Properties())
      .select(DataCols.map(col): _*)
}
