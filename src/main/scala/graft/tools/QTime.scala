package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for local perf iteration: runs the named
  * SparkEntry queries at the given SF dir with the bench session config,
  * one warmup + 3 timed reps each, printing per-rep walls. Not part of the
  * driver contract. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Honors SPARK_GRAFT_CPUS (r19) so the core-scaling sweep can time the
    // same queries at 8 vs 32 cores — a hard-coded master ruins exactly
    // that measurement (the bench-harness rule, applied to the tool too).
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
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
    // Weather evidence per query (round 18): hypervisor steal accrued over
    // the timed reps, printed next to the walls — an isolation median
    // taken in a steal storm (measured up to ~1 stolen core on this box)
    // should carry that fact, not get quoted as a quiet-window number.
    def stealSec(): Double = ProcStat.stealSec()
    for (name <- args) {
      try run(name) catch { case e: Throwable => println(s"$name warmup: ${e.getMessage}") }
      val s0 = stealSec()
      val t0All = System.nanoTime()
      val walls = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        run(name)
        (System.nanoTime() - t0) / 1e9
      }
      val s1 = stealSec()
      val stealCores =
        if (s0 < 0 || s1 < 0) Double.NaN
        else (s1 - s0) / ((System.nanoTime() - t0All) / 1e9)
      println(f"$name%-28s ${walls.map(w => f"$w%6.2f").mkString(" ")}" +
        f"  steal_cores $stealCores%.2f")
    }
    spark.stop()
  }
}
