package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB attribution for one SparkEntry query: runs the query (warmup +
  * one timed pass) and prints every Spark job's wall time with its call
  * site, so a multi-job query (streaming foreachBatch pipelines, staged
  * merges) shows WHERE its wall goes rather than one opaque number.
  * Usage: runMain graft.tools.JobTime <sfDir> <query...>
  */
object JobTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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
          Option(j.properties.getProperty("callSite.short")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach(_.end = j.time)
    })

    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

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
      jobs.clear()
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      settled()
      val done = jobs.toSeq.sortBy(_._1)
      val sumJobs = done.map { case (_, j) => (j.end - j.start) / 1e3 }.sum
      println(f"== $name wall $wall%.2f s, ${done.size} jobs, job-sum $sumJobs%.2f s (gaps = driver/planning/FS)")
      for ((id, j) <- done)
        println(f"  job $id%3d ${(j.end - j.start) / 1e3}%7.3f s  ${j.site}")
    }
    spark.stop()
  }
}
