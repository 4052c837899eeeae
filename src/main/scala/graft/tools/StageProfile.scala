package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-STAGE attribution for one timed rep of named SparkEntry queries:
  * sums each stage's task run/CPU/deserialize/shuffle-write time so the
  * per-task fixed cost (TaskProfile's finding) can be localized to an
  * operator. Prints stages sorted by CPU with task counts and the stage
  * name's leading line. Usage: runMain graft.tools.StageProfile <sfDir> <query...>
  */
object StageProfile {
  private final case class S(var run: Long = 0, var cpu: Long = 0,
                             var deser: Long = 0, var shufW: Long = 0,
                             var gc: Long = 0, var tasks: Int = 0,
                             var recsIn: Long = 0, var bytesIn: Long = 0,
                             var shufRecsW: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Isolation knobs for the shuffle-write experiments (SPARK_GRAFT_XCONF:
    // semicolon-separated k=v pairs applied to the builder).
    val extra = sys.env.getOrElse("SPARK_GRAFT_XCONF", "").split(';')
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v) }
    val b0 = graft.GraftSession.withStatics(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // XCONF LAST so an experiment override of a fixed default (e.g. AQE
    // off) actually wins — builder semantics are last-set-wins.
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.muteBenignWarns()
    val stages = TrieMap.empty[Int, S]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val s = stages.getOrElseUpdate(t.stageId, S())
          s.synchronized {
            s.run += m.executorRunTime
            s.cpu += m.executorCpuTime
            s.deser += m.executorDeserializeTime
            s.shufW += m.shuffleWriteMetrics.writeTime
            s.gc += m.jvmGCTime
            s.tasks += 1
            s.recsIn += m.inputMetrics.recordsRead + m.shuffleReadMetrics.recordsRead
            s.bytesIn += m.inputMetrics.bytesRead + m.shuffleReadMetrics.totalBytesRead
            s.shufRecsW += m.shuffleWriteMetrics.recordsWritten
          }
        }
      }
    })
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
    for (name <- names) {
      try run(name) catch { case e: Throwable => println(s"$name warmup: ${e.getMessage}") }
      Thread.sleep(300)
      stages.clear()
      val t0 = System.nanoTime()
      run(name)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"== $name wall $wall%.2f s, ${stages.size} stages")
      val rows = stages.toSeq.sortBy(-_._2.cpu)
      for ((id, s) <- rows)
        println(f"  stage $id%4d tasks ${s.tasks}%3d run ${s.run / 1e3}%7.2f cpu ${s.cpu / 1e9}%7.2f " +
          f"deser ${s.deser / 1e3}%5.2f shufW ${s.shufW / 1e9}%5.2f gc ${s.gc / 1e3}%5.2f " +
          f"recsIn ${s.recsIn}%9d MBin ${s.bytesIn / 1e6}%7.1f recsOut ${s.shufRecsW}%9d")
    }
    spark.stop()
  }
}
