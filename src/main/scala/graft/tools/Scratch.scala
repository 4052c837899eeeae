package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    val plan = graft.queries.Extra.q75OnlySlowSupplier(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    println("q75 decorrelated joins: " +
      "semi=" + plan.contains("LeftSemi") + " anti=" + plan.contains("LeftAnti") +
      " nestedLoop=" + plan.contains("BroadcastNestedLoopJoin"))
    spark.stop()
  }
}
