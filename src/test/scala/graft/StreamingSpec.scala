package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.queries.Analytics
import graft.streaming.{EventsStream, StatefulOps}

/** Streaming paths: the streaming windowed agg must equal its batch twin,
  * and the custom stateful operator must accumulate across micro-batches. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch hourly agg") {
    val batch = Analytics.q22EventsHourly(spark, sf0001).collect().toSeq
    val stream = EventsStream.q23StreamingHourly(spark, sf0001).collect().toSeq
    assert(stream == batch)
  }

  test("maxFilesPerTrigger bounds each backfill micro-batch (AvailableNow)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.DataFrame
    // A 100 TB backfill must not land in the first micro-batch: the rate
    // limit carves the catch-up into bounded batches, each checkpointed, so
    // a mid-backfill crash resumes instead of restarting.
    val landing = java.nio.file.Files.createTempDirectory("graft_rate_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rate_ckpt_").toString
    for (i <- 1 to 6)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(landing, f"f$i%02d.csv"), s"id\n$i\n")
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema("id LONG").option("header", "true")
      .option("maxFilesPerTrigger", "2")
      .csv(landing)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += b.count() }; ()
      }
      .start()
    q.awaitTermination()
    assert(batchSizes.toSeq == Seq(2L, 2L, 2L),
      s"6 files at 2 files/trigger must process as 3 bounded batches, got $batchSizes")
  }

  test("watermark drops late events in append-mode windowed aggregation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val agg = input.toDS().toDF("ts", "value")
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("ws"), $"n")
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append).start()
    input.addData((ts(1), 1.0), (ts(5), 1.0))      // window 10:00
    q.processAllAvailable()
    input.addData((ts(31), 1.0))                   // watermark → 10:26, closes 10:00
    q.processAllAvailable()
    input.addData((ts(2), 99.0))                   // LATE: before watermark → dropped
    q.processAllAvailable()
    input.addData((ts(59), 1.0))                   // closes 10:30 window
    q.processAllAvailable()
    val rows = spark.table("late_test").collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    q.stop()
    // late event did NOT bump the 10:00 window's count
    assert(rows("2024-01-01 10:00:00.0") == 2L)
    assert(rows("2024-01-01 10:30:00.0") == 1L)
  }

  test("append-mode session windows: watermark closes and emits sessions, open sessions are withheld") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // Production form of q82: append mode — the watermark EVICTS closed
    // session state and emits each session exactly once (complete mode, used
    // for the run-once oracle parity check, would retain all state forever).
    val sessions = input.toDS().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"w.start".as("ws"), $"n_events")
    val q = sessions.writeStream.format("memory").queryName("session_evict")
      .outputMode(OutputMode.Append).start()
    input.addData((ts(0), 1L, 1.0), (ts(3), 1L, 1.0))  // one session for user 1
    q.processAllAvailable()
    assert(spark.table("session_evict").count() == 0,
      "session still open: nothing may be emitted yet")
    input.addData((ts(30), 2L, 1.0))  // watermark → 10:20 closes user 1's session
    q.processAllAvailable()
    val emitted = spark.table("session_evict").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(emitted == Set((1L, "2024-01-01 10:00:00.0", 2L)),
      s"closed session must be emitted exactly once, got $emitted")
    // user 2's session (10:30) is still open — withheld
    q.stop()
  }

  test("dropDuplicatesWithinWatermark deduplicates re-delivered events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val deduped = input.toDS().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append).start()
    input.addData((1L, ts(0)), (2L, ts(1)))
    q.processAllAvailable()
    input.addData((1L, ts(2)), (3L, ts(3)))        // event 1 re-delivered
    q.processAllAvailable()
    val n = spark.table("dedup_test").count()
    q.stop()
    assert(n == 3, s"expected 3 unique events, got $n")
  }

  test("streaming top-k keeps the best k per query across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.ScoredCandidate
    val input = MemoryStream[ScoredCandidate]
    val q = StatefulOps.streamingTopK(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_stream")
      .outputMode(OutputMode.Append).start()
    input.addData(
      ScoredCandidate(1L, 10L, 0.5), ScoredCandidate(1L, 11L, 0.9),
      ScoredCandidate(1L, 12L, 0.1))
    q.processAllAvailable()
    input.addData(ScoredCandidate(1L, 13L, 0.7), ScoredCandidate(2L, 20L, 0.3))
    q.processAllAvailable()
    val rows = spark.table("topk_stream").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList))
    q.stop()
    // batch 1 snapshot: [11 (0.9), 10 (0.5)]; batch 2 folds 13 (0.7) into state
    assert(rows.contains((1L, List(11L, 10L))))
    assert(rows.contains((1L, List(11L, 13L))))
    assert(rows.contains((2L, List(20L))))
  }

  test("left-outer stream-stream join emits the null row once the watermark closes the match window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDS().toDF("user_id", "click_ts").withWatermark("click_ts", "5 minutes")
    val v = views.toDS().toDF("v_user_id", "view_ts").withWatermark("view_ts", "5 minutes")
    val joined = c.join(v,
      $"user_id" === $"v_user_id" &&
        $"view_ts" >= $"click_ts" - expr("INTERVAL 5 MINUTES") &&
        $"view_ts" <= $"click_ts",
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ss_left_join")
      .outputMode(OutputMode.Append).start()
    // user 1 gets a matching view; user 2 never does
    clicks.addData((1L, ts(10)), (2L, ts(10)))
    views.addData((1L, ts(7)))
    q.processAllAvailable()
    val early = spark.table("ss_left_join").collect()
    // user 2's null result CANNOT be emitted yet: a matching view could
    // still arrive until the watermark passes the join window
    assert(!early.exists(r => r.getLong(0) == 2L),
      "unmatched row must be withheld while the match window is open")
    // advance both watermarks far past the window; the unmatched click
    // must now surface exactly once, with a null view side
    // several nudge batches: the watermark advances one micro-batch after
    // the data that moves it, and the outer-null emission one batch later
    // still — a single nudge is timing-sensitive
    for (m <- Seq(45, 55, 58)) {
      clicks.addData((100L + m, ts(m)))
      views.addData((100L + m, ts(m)))
      q.processAllAvailable()
    }
    val rows = spark.table("ss_left_join").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getTimestamp(3))))
    q.stop()
    assert(rows.count(_._1 == 2L) == 1, s"expected exactly one user-2 row in ${rows.toSeq}")
    assert(rows.find(_._1 == 2L).get._2.isEmpty, "user 2's view side must be null")
    assert(rows.find(_._1 == 1L).get._2.contains(ts(7)))
  }

  test("stream-stream interval join pairs clicks with views within the window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDS().toDF("user_id", "click_ts").withWatermark("click_ts", "10 minutes")
    val v = views.toDS().toDF("v_user_id", "view_ts").withWatermark("view_ts", "10 minutes")
    val joined = c.join(v,
      $"user_id" === $"v_user_id" &&
        $"view_ts" >= $"click_ts" - expr("INTERVAL 5 MINUTES") &&
        $"view_ts" <= $"click_ts")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append).start()
    clicks.addData((1L, ts(10)), (2L, ts(10)))
    views.addData((1L, ts(7)), (1L, ts(20)), (2L, ts(1)))
    q.processAllAvailable()
    val rows = spark.table("ss_join")
      .select($"user_id", $"view_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    q.stop()
    // user 1: view at 10:07 is within [10:05, 10:10] → joined;
    // view at 10:20 is after the click; user 2's view at 10:01 is too old.
    assert(rows == Set((1L, ts(7))))
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.runningPerUser(input.toDS())
      .writeStream.format("memory").queryName("running_test")
      .outputMode(OutputMode.Append).start()
    input.addData(StatefulOps.Ev(1L, "view", 1.0), StatefulOps.Ev(1L, "click", 2.0))
    q.processAllAvailable()
    input.addData(StatefulOps.Ev(1L, "view", 4.0), StatefulOps.Ev(2L, "view", 9.0))
    q.processAllAvailable()
    val rows = spark.table("running_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    // user 1: first batch (2, 3.0), second batch carries state → (3, 7.0)
    assert(rows.contains((1L, 2L, 3.0)))
    assert(rows.contains((1L, 3L, 7.0)))
    assert(rows.contains((2L, 1L, 9.0)))
  }

  test("transformWithState (RocksDB) matches flatMapGroupsWithState on the same batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    try {
      conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val input = MemoryStream[StatefulOps.Ev]
      val q = StatefulOps.runningPerUserTws(input.toDS())
        .writeStream.format("memory").queryName("running_tws_test")
        .outputMode(OutputMode.Update).start()
      input.addData(StatefulOps.Ev(1L, "view", 1.0), StatefulOps.Ev(1L, "click", 2.0))
      q.processAllAvailable()
      input.addData(StatefulOps.Ev(1L, "view", 4.0), StatefulOps.Ev(2L, "view", 9.0))
      q.processAllAvailable()
      val rows = spark.table("running_tws_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      q.stop()
      // identical running aggregates to the flatMapGroupsWithState form
      assert(rows == Set((1L, 2L, 3.0), (1L, 3L, 7.0), (2L, 1L, 9.0)))
    } finally saved.fold(conf.unset(key))(conf.set(key, _))
  }

  test("q157: streaming dedup absorbs re-delivered duplicates — equals the unique-events rollup") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // The staged landing dir must REALLY contain duplicates, or the dedup
    // proves nothing: delivered rows > distinct event ids.
    val watch = graft.sources.Staged.dedupWatchDir(spark, sf0001)
    val delivered = spark.read
      .schema(graft.streaming.EventsStream.rawSchema).parquet(watch)
    val nDelivered = delivered.count()
    val nUnique = delivered.select($"event_id").distinct().count()
    assert(nDelivered > nUnique,
      s"landing dir must re-deliver duplicates ($nDelivered vs $nUnique)")
    val streamed = graft.streaming.EventsStream
      .q157StreamingDedup(spark, sf0001).collect().toSeq
    val batch = graft.sources.Tables.events(spark, sf0001)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        count_distinct($"user_id").as("n_users"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("q162: the maintained MV equals the batch rollup and commits one version per micro-batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mv = graft.streaming.EventsStream.q162StreamingMv(spark, sf0001)
    val rows = mv.collect().toSeq
    val batch = graft.sources.Tables.events(spark, sf0001)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"event_type", $"day").collect().toSeq
    assert(rows == batch,
      "MV after the at-least-once replay must equal the unique-events rollup")
    // (type, day) is the MV's primary key — the merge must keep it unique.
    assert(mv.select("event_type", "day").distinct().count() == rows.size)
  }

  test("noDataMicroBatches off: dedup + update-mode rollup emit the same rows as with settling batches") {
    // The r19 streaming-floor lever (EventsStream.startPinned noSettle=true
    // on q23/q82/q157/q162): A/B the q157/q162 operator shapes over the
    // same MemoryStream data with the watermark-settling batch enabled and
    // disabled — sink rows must be identical, because
    // dropDuplicatesWithinWatermark emits rows in the batch they arrive and
    // an update-mode aggregation emits only touched keys; the data-less
    // batch exists for state EVICTION only. (q134's outer join is the shape
    // whose OUTPUT depends on the settling batch — it keeps the default.)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def run(noData: String, tag: String): Seq[(Long, Long, Long)] = {
      val key = "spark.sql.streaming.noDataMicroBatches.enabled"
      val prev = spark.conf.get(key, "true")
      spark.conf.set(key, noData)
      try {
        val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
        def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
        val rolled = input.toDS().toDF("event_id", "ts", "user_id")
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("event_id")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"), max(unix_timestamp($"ts")).as("last_s"))
        val name = s"nodata_ab_$tag"
        val q = rolled.writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Update).start()
        input.addData((1L, ts(0), 7L), (2L, ts(1), 7L), (3L, ts(2), 9L))
        q.processAllAvailable()
        input.addData((1L, ts(3), 7L), (4L, ts(30), 9L)) // dup + watermark push
        q.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
        q.stop()
        spark.catalog.dropTempView(name)
        rows
      } finally spark.conf.set(key, prev)
    }
    val withSettle = run("true", "on")
    val noSettle = run("false", "off")
    assert(withSettle.nonEmpty && withSettle == noSettle,
      s"settle-on $withSettle must equal settle-off $noSettle")
  }

  test("structural guard: corpus-sized streaming results are file-backed, never memory sinks") {
    // The memory-sink pathology recurred twice (q82 in the r13 64x sweep,
    // q134 in review): a corpus-sized result routed through format("memory")
    // funnels the whole output through a single-threaded driver collect.
    // The fixed queries return frames rooted at a parquet read of their
    // foreachBatch/file-sink output; the drain-a-memory-sink path returns a
    // localCheckpoint (LogicalRDD, no file relation). Assert the plan shape
    // so a reintroduced memory sink on any corpus-sized entry fails here.
    // Bounded-result streams (q23/q25's fixed hourly/window grids, q176's
    // k-report) legitimately keep memory sinks and are exempt.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val corpusSized = Seq(
      "q82_streaming_sessions", "q134_streaming_left_join",
      "q153_streaming_neardup_ingest", "q157_streaming_dedup",
      "q162_streaming_mv", "q201_learning_ingest")
    for (name <- corpusSized) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      val plan = df.queryExecution.analyzed
      val fileBacked = plan.collectFirst {
        case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] => ()
      }.isDefined
      val hasRdd = plan.collectFirst {
        case r: org.apache.spark.sql.execution.LogicalRDD => r
      }.isDefined
      assert(fileBacked && !hasRdd,
        s"$name must return a file-backed result (foreachBatch/file sink), " +
          s"not a drained memory sink: fileBacked=$fileBacked hasLogicalRDD=$hasRdd")
    }
  }

  test("streaming state partitioning derives from landing-dir volume, conf-capped (rule #6)") {
    import graft.streaming.EventsStream
    // bench-scale landing dir: floors at 4 — the run-once shape q134 et al
    // ship with, so pinned-partition results and timings are unchanged
    val watch = graft.sources.Staged.ssjoinWatchDir(spark, sf0001)
    assert(EventsStream.pinnedPartitionsFor(spark, watch) == 4)
    // a bigger landing dir derives more state instances (48 MB / 8 MiB = 6)
    val big = java.nio.file.Files.createTempDirectory("graft_state_derive_")
    java.nio.file.Files.write(big.resolve("slice.bin"), new Array[Byte](48 << 20))
    assert(EventsStream.pinnedPartitionsFor(spark, big.toString) == 6,
      "state partitions must scale with landing-dir bytes")
    // the cap is a session conf, not a hard-coded cluster assumption
    try {
      spark.conf.set(EventsStream.MaxStatePartitionsKey, "5")
      assert(EventsStream.pinnedPartitionsFor(spark, big.toString) == 5)
    } finally spark.conf.unset(EventsStream.MaxStatePartitionsKey)
    // a missing dir keeps the floor instead of throwing (probe logs, never
    // silently serializes state)
    assert(EventsStream.pinnedPartitionsFor(spark, "/nonexistent/graft/watch") == 4)
  }
}
