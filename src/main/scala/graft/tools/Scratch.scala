package graft.tools

import graft.GraftSession

/** Plan/feature inspection scratchpad (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    val name = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_QUERY", "q01_pricing_summary")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
