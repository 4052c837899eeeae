package graft.tools

import graft.GraftSession

/** Dev scratchpad main for quick plan/schema checks. Not part of the API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
