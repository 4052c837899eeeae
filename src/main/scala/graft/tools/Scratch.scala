package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    import spark.implicits._
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force the shuffle-join path so the runtime filter has something to prune
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    println("bloom default enabled: " +
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
    val o = graft.sources.Tables.orders(spark, "/root/testdata/sf0.01")
      .filter($"o_orderpriority" === "1-URGENT")
    val j = li.join(o, $"l_orderkey" === $"o_orderkey")
    val plan = j.queryExecution.optimizedPlan.toString
    println("HAS bloom: " + plan.toLowerCase.contains("bloom"))
    println(plan.split("\n").take(12).mkString("\n"))
    spark.stop()
  }
}
