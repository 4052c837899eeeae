package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    val plan = graft.SparkEntry.queries("q11_top_customers_per_region")(spark, "/root/testdata/sf0.1")
      .queryExecution.executedPlan.toString
    println("HAS WindowGroupLimit: " + plan.contains("WindowGroupLimit"))
    spark.stop()
  }
}
