package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    for (q <- Seq("q18_range_join", "q45_interval_join", "q19_asof_join")) {
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.toString
      val kind = Seq("BroadcastNestedLoopJoin", "SortMergeJoin", "BroadcastHashJoin",
        "ShuffledHashJoin", "CartesianProduct")
        .filter(plan.contains).mkString(",")
      println(s"$q -> $kind")
    }
    spark.stop()
  }
}
