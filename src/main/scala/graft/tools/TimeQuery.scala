package graft.tools

import graft.GraftSession

/** Time individual queries by name: `runMain graft.tools.TimeQuery q134_... [qXX ...]`.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS.
  * Each query runs REPS times (default 2 — first is warmup) against a noop
  * sink; per-rep seconds are printed so warm/cold are both visible. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = GraftSession.build("time-query",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    for (q <- args) {
      val fn = graft.SparkEntry.queries(q)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q%-30s ${times.map(t => f"$t%.2f").mkString("  ")}")
    }
    spark.stop()
  }
}
