package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profiler: run named SparkEntry queries repeatedly in one JVM and
  * print per-invocation wall times — separates steady-state per-query cost
  * (repeat runs) from first-touch cost (file index, codegen, broadcasts).
  * Usage: runMain graft.tools.Micro <sfDir> <reps> <query...>
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = graft.GraftSession.withStatics(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", shuf)
      // An EXPLICIT shuffle sweep must measure what it set: disable the
      // per-query derived re-tune, which would otherwise silently reset
      // the conf before every SparkEntry build.
      .config(graft.Tuning.EnabledKey,
        (!sys.env.contains("SPARK_GRAFT_SHUFFLE")).toString)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", (4L * 1024 * 1024).toString))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MINPART", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        (t1 - t0, t2 - t1, t3 - t2)
      }
      println(f"MICRO $name%-28s " + times.map { case (b, p, e) =>
        f"b=${b / 1e9}%5.2f p=${p / 1e9}%5.2f e=${e / 1e9}%5.2f"
      }.mkString("  "))
    }
    spark.stop()
  }
}
