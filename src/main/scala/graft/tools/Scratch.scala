package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    val df = graft.queries.Extra.q74Tfidf(spark, "/root/testdata/sf0.001")
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    println("q74 FileScans=" + "FileScan".r.findAllIn(plan).length +
      " ReusedExchange=" + plan.contains("ReusedExchange"))
    spark.stop()
  }
}
