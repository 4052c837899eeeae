package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug harness: run named SparkEntry queries in isolation with wall-time
  * per run (repeats to separate warm-up from steady state), optionally
  * printing the formatted plan. Usage:
  *
  *   runMain graft.tools.QueryProbe <sfDir> <reps> [--explain] q42_ann_ivf ...
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    // Flags first, positionals after: `--explain` may appear anywhere
    // without shifting <sfDir>/<reps> (query names can't start with "--").
    val (flags, positional) = args.partition(_.startsWith("--"))
    val explain = flags.contains("--explain")
    val sfDir = positional(0)
    val reps = positional(1).toInt
    val names = positional.drop(2).toIndexedSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extraConfs = sys.env.getOrElse("SPARK_GRAFT_CONFS", "")
      .split(';').toIndexedSeq.filter(_.contains('='))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // Bucketed tables here exist only for bucketing-aware joins; see
      // GraftSession for why the auto heuristic is disabled.
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    extraConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Staged.prepare(spark, sfDir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name rep $i: $sec%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
