package graft

import java.nio.file.{Files, Path}
import graft.streaming.UpsertPipeline
import graft.ops.EmissionsEtl

/** End-to-end reference lifecycle: files land → streaming pickup → transform
  * → keyed merge into the versioned warehouse; re-delivery is idempotent. */
class UpsertPipelineSpec extends SparkSpec {

  private def writeCsv(dir: Path, name: String, rows: Seq[String]): Unit = {
    val header = "CountryCode,Year,Scenario,Category,Gas,Reported Value"
    Files.writeString(dir.resolve(name), (header +: rows).mkString("\n"))
  }

  test("landing files are transformed, merged last-write-wins, idempotently") {
    val landing = Files.createTempDirectory("graft_landing_")
    val warehouse = Files.createTempDirectory("graft_warehouse_").toString
    val checkpoint = Files.createTempDirectory("graft_ckpt_").toString
    val gas = EmissionsEtl.totalGhgRaw

    writeCsv(landing, "001.csv", Seq(
      s"""AT,2030,WEM,Energy,"$gas",100.0""",
      s"""DE,2030,WEM,Energy,"$gas",50.0"""))
    UpsertPipeline.runOnce(spark, landing.toString, warehouse, checkpoint)
    val after1 = UpsertPipeline.currentTable(spark, warehouse).collect()
      .map(r => (r.getString(0), r.getDouble(5))).toMap
    assert(after1 == Map("Austria" -> 100.0, "Germany" -> 50.0))

    // second file: update AT, add FR; also a dirty row that must be dropped
    writeCsv(landing, "002.csv", Seq(
      s"""AT,2030,WEM,Energy,"$gas",200.0""",
      s"""FR,2030,WEM,Energy,"$gas",75.0""",
      s"""XX,2030,WEM,Energy,"$gas",1.0"""))
    UpsertPipeline.runOnce(spark, landing.toString, warehouse, checkpoint)
    val after2 = UpsertPipeline.currentTable(spark, warehouse).collect()
      .map(r => (r.getString(0), r.getDouble(5))).toMap
    assert(after2 == Map("Austria" -> 200.0, "Germany" -> 50.0, "France" -> 75.0))

    // re-run with nothing new: no state change (idempotent pickup)
    UpsertPipeline.runOnce(spark, landing.toString, warehouse, checkpoint)
    val after3 = UpsertPipeline.currentTable(spark, warehouse).collect()
      .map(r => (r.getString(0), r.getDouble(5))).toMap
    assert(after3 == after2)
  }

  test("CDC landing: I/U/D logs stream into the versioned warehouse, deletes erase, re-run is a no-op") {
    import org.apache.spark.sql.types._
    val landing = Files.createTempDirectory("graft_cdc_landing_")
    val warehouse = Files.createTempDirectory("graft_cdc_wh_").toString
    val checkpoint = Files.createTempDirectory("graft_cdc_ckpt_").toString
    val logSchema = StructType(Seq(
      StructField("k", StringType), StructField("v", DoubleType),
      StructField("seq", LongType), StructField("op", StringType)))
    def state(): Map[String, Double] =
      UpsertPipeline.currentCdcTable(spark, warehouse, logSchema, "seq", "op")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def run(): Unit = UpsertPipeline.runOnceCdc(spark, landing.toString, warehouse,
      checkpoint, logSchema, Seq("k"), "seq", "op")

    Files.writeString(landing.resolve("log1.csv"),
      Seq("k,v,seq,op", "a,1.0,1,I", "b,2.0,2,I", "a,10.0,3,U").mkString("\n"))
    run()
    assert(state() == Map("a" -> 10.0, "b" -> 2.0))

    // delete b, insert c, then delete c again within the same log
    Files.writeString(landing.resolve("log2.csv"),
      Seq("k,v,seq,op", "b,0.0,4,D", "c,3.0,5,I", "c,0.0,6,D").mkString("\n"))
    run()
    assert(state() == Map("a" -> 10.0))

    run() // no new files: checkpoint yields an empty batch stream — state holds
    assert(state() == Map("a" -> 10.0))

    // LATE, OUT-OF-ORDER re-delivery (new file path, so the checkpoint
    // can't dedup it) carrying only stale sequence numbers: a's old value,
    // a pre-delete update for b, c's pre-delete insert. The stored per-key
    // seq + tombstones must win — no rollback, no resurrection. (The
    // pre-tombstone layout failed all three: stored rows compared as
    // seq = -infinity and deletes left no trace.)
    Files.writeString(landing.resolve("log1-retry.csv"),
      Seq("k,v,seq,op", "a,1.0,1,I", "b,99.0,3,U", "c,3.0,5,I").mkString("\n"))
    run()
    assert(state() == Map("a" -> 10.0),
      "stale re-delivered ops must not roll back or resurrect keys")
  }

  test("incremental rollup maintenance: streamed partials fold to the exact batch recompute") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions._
    import graft.streaming.EventsStream
    val landing = Files.createTempDirectory("graft_rollup_landing_")
    val warehouse = Files.createTempDirectory("graft_rollup_wh_").toString
    val checkpoint = Files.createTempDirectory("graft_rollup_ckpt_").toString
    val dayNs = 24L * 3600 * 1000000000L
    val t0 = 1704067200L * 1000000000L
    def writeEvents(name: String, rows: Seq[Row]): Unit = {
      val staging = Files.createTempDirectory("graft_rollup_stage_")
      spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          EventsStream.rawSchema)
        .coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val listing = Files.list(staging)
      try {
        val part = listing.iterator()
        while (part.hasNext) {
          val p = part.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            Files.move(p, landing.resolve(name))
        }
      } finally listing.close()
    }
    val batch1 = Seq(
      Row(1L, t0, 1L, "click", 1.5, "{}"),
      Row(2L, t0 + 1000L, 2L, "click", 2.5, "{}"),
      Row(3L, t0 + dayNs, 1L, "view", 4.0, "{}"))
    val batch2 = Seq(
      Row(4L, t0 + 2000L, 3L, "click", 8.0, "{}"),   // same day+type as batch1 rows
      Row(5L, t0 + dayNs, 2L, "view", 16.0, "{}"))
    def run(): Unit = UpsertPipeline.runOnceRollup(spark, landing.toString, warehouse, checkpoint)
    writeEvents("e1.parquet", batch1)
    run()
    writeEvents("e2.parquet", batch2)
    run()
    run() // no new files — rollup must hold
    import org.apache.spark.sql.types._
    val rollupSchema = StructType(Seq(
      StructField("day", TimestampType), StructField("event_type", StringType),
      StructField("n_events", LongType), StructField("sum_value", DoubleType)))
    val rollup = graft.ops.VersionedTable.read(spark, warehouse, rollupSchema)
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rollup == Map(
      ("2024-01-01 00:00:00.0", "click") -> ((3L, 12.0)),
      ("2024-01-02 00:00:00.0", "view") -> ((2L, 20.0))))
    // Compaction: each batch folds the previous cumulative partial and
    // GCs everything below it, so the partials dir holds at most the
    // fold source + the newest dir — NOT one dir per batch forever (the
    // unbounded-growth shape this replaced). Two batches ran, so: dir 1
    // (cumulative through batch 1) plus batch 0's dir, which batch 1
    // keeps as its replay fold-source.
    import scala.jdk.CollectionConverters._
    val partialDirs = Files.list(java.nio.file.Paths.get(warehouse, "_partials"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("micro_batch=")).toSeq
    assert(partialDirs.toSet == Set("micro_batch=0", "micro_batch=1"),
      s"expected exactly the fold-source and newest cumulative dirs, got $partialDirs")
    // The newest cumulative dir IS the rollup — bounded by days×types.
    val cum = spark.read.schema(rollupSchema)
      .parquet(s"$warehouse/_partials/micro_batch=1").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(cum == rollup.map(identity))
  }

  test("within one batch, the later file wins on key conflict") {
    val landing = Files.createTempDirectory("graft_landing2_")
    val warehouse = Files.createTempDirectory("graft_warehouse2_").toString
    val checkpoint = Files.createTempDirectory("graft_ckpt2_").toString
    val gas = EmissionsEtl.totalGhgRaw
    writeCsv(landing, "001.csv", Seq(s"""AT,2030,WEM,Energy,"$gas",1.0"""))
    writeCsv(landing, "002.csv", Seq(s"""AT,2030,WEM,Energy,"$gas",2.0"""))
    UpsertPipeline.runOnce(spark, landing.toString, warehouse, checkpoint)
    val rows = UpsertPipeline.currentTable(spark, warehouse).collect()
    assert(rows.length == 1)
    assert(rows.head.getDouble(5) == 2.0)
  }
}
