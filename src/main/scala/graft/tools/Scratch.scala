package graft.tools

import graft.GraftSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "32")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    time("q86_decontamination", "/root/testdata/sf0.001")
    for (i <- 1 to 3)
      println(f"q86 sf0.1 run$i: ${time("q86_decontamination", "/root/testdata/sf0.1")}%.2f s")
    spark.stop()
  }
}
