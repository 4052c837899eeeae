package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution for one SparkEntry query: runs the query (warmup +
  * one timed pass) and prints every Spark job's wall time with its NAME —
  * the engine stamps phase descriptions via [[graft.JobStage]] (probe/
  * verify/delta writes, partitioned-merge phases, versioned commits), so a
  * multi-job query (streaming foreachBatch pipelines, staged merges) shows
  * WHERE its wall goes rather than one opaque number. For streaming
  * queries it additionally prints each micro-batch's engine-phase
  * durations (listing/planning/addBatch/offset-log/commit-log) from the
  * StreamingQueryProgress — the driver-side costs that appear as inter-job
  * GAPS in the job table.
  * Usage: runMain graft.tools.JobTime <sfDir> <query...>
  */
object JobTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.withStatics(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.muteBenignWarns()

    final case class Job(start: Long, site: String, var end: Long = 0L)
    val jobs = TrieMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, Job(j.time,
          // Engine-stamped phase description first (JobStage.named);
          // callSite is only populated when something set it explicitly,
          // so it is the fallback, not the primary.
          Option(j.properties.getProperty("spark.job.description"))
            .orElse(Option(j.properties.getProperty("callSite.short")))
            .getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach(_.end = j.time)
    })

    // Streaming-phase attribution: micro-batch durations (source listing,
    // planning, state/sink work, offset+commit log writes) are DRIVER-side
    // and never appear as Spark jobs — they are the gaps between jobs. The
    // progress events name them.
    val batchProgress = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.streaming.StreamingQueryProgress]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        batchProgress.add(e.progress)
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })

    // Default label for jobs submitted from THIS thread (the noop sink and
    // its AQE stages): engine phases running on other threads (foreachBatch)
    // keep their own JobStage stamps; jobs that would otherwise print `?`
    // now at least name the query's own materialization.
    def run(name: String): Unit =
      graft.JobStage.named(spark, s"$name: result materialize") {
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }

    // Listener delivery is async (the Bench.settled() lesson): without a
    // drain, a timed job whose JobEnd is still queued reads end=0 (huge
    // negative duration), and warmup JobStarts delivered after clear()
    // re-enter the map attributed to the timed pass.
    def settled(): Unit = {
      // VALUE snapshot (Job.end is a var; snapshotting references would
      // make cur == prev trivially true while ends still mutate)
      def snap(): Map[Int, Long] = jobs.map { case (id, j) => id -> j.end }.toMap
      var prev = snap()
      var spins = 0
      while (spins < 10) {
        Thread.sleep(20)
        val cur = snap()
        if (cur == prev && cur.valuesIterator.forall(_ != 0L)) spins = 10
        else { prev = cur; spins += 1 }
      }
    }

    for (name <- names) {
      try run(name) catch { case e: Throwable => println(s"$name warmup: ${e.getMessage}") }
      settled()
      // Drain the shared bus before clearing and again before printing:
      // progress events are async like job events — without the drain a
      // warmup batch's late event lands AFTER clear() (misattributed to the
      // timed pass) and the timed pass's last event can still be in flight
      // at print time (silently dropped batch).
      org.apache.spark.sql.graftshim.drainListenerBus(spark)
      jobs.clear()
      batchProgress.clear()
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      settled()
      org.apache.spark.sql.graftshim.drainListenerBus(spark)
      // A job whose JobEnd never settled would read end=0 → a huge negative
      // duration silently corrupting the job-sum; flag it instead.
      val (done, unfinished) = jobs.toSeq.sortBy(_._1).partition(_._2.end != 0L)
      val sumJobs = done.map { case (_, j) => (j.end - j.start) / 1e3 }.sum
      println(f"== $name wall $wall%.2f s, ${done.size} jobs, job-sum $sumJobs%.2f s (gaps = driver/planning/FS)")
      for ((id, j) <- done)
        println(f"  job $id%3d ${(j.end - j.start) / 1e3}%7.3f s  ${j.site}")
      for ((id, j) <- unfinished)
        println(f"  job $id%3d   UNFINISHED (no JobEnd) — excluded from job-sum  ${j.site}")
      // Micro-batch phase breakdown (streaming queries only): the named
      // driver-side costs behind the job-table gaps.
      import scala.jdk.CollectionConverters._
      for (p <- batchProgress.asScala.toSeq.sortBy(_.batchId)) {
        val phases = p.durationMs.asScala.toSeq
          .sortBy { case (_, ms) => -ms.longValue() }
          .map { case (k, ms) => s"$k ${ms}ms" }.mkString(", ")
        println(f"  batch ${p.batchId}%2d (${p.numInputRows}%5d rows)  $phases")
      }
    }
    spark.stop()
  }
}
