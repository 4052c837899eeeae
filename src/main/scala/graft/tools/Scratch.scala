package graft.tools

import graft.GraftSession

/** Dev scratchpad main for quick plan/schema checks. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q01_pricing_summary", "q02_project_filter", "q10_revenue_by_nation", "q19_asof_join")) {
      println(s"==== $q ====")
      graft.SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
