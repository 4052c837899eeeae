package graft.tools

import graft.GraftSession

/** Plan/feature inspection scratchpad (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build("scratch", cpus)
    val name = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_QUERY", "q01_pricing_summary")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val mode = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_MODE", "explain")
    if (mode == "time") {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[scratch] $name run $i: build ${(t1 - t0) / 1e9}%.2f s, " +
          f"action ${(System.nanoTime() - t1) / 1e9}%.2f s")
      }
    } else {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
