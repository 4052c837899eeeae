package graft.tools

import graft.GraftSession
import java.nio.file.Files

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "4")
    val landing = Files.createTempDirectory("sl_")
    val wh = Files.createTempDirectory("sw_").toString
    val ck = Files.createTempDirectory("sc_").toString
    val gas = graft.ops.EmissionsEtl.totalGhgRaw
    Files.writeString(landing.resolve("001.csv"),
      "CountryCode,Year,Scenario,Category,Gas,Reported Value\n" +
      s"AT,2030,WEM,Energy,\"$gas\",100.0\n")
    graft.streaming.UpsertPipeline.runOnce(spark, landing.toString, wh, ck)
    val t = graft.streaming.UpsertPipeline.currentTable(spark, wh)
    t.printSchema()
    t.show(5, false)
    spark.stop()
  }
}
