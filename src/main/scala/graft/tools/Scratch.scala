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
    time("q62_neardup_corpus", "/root/testdata/sf0.001")
    for (i <- 1 to 3)
      println(f"q62 sf0.1 run$i: ${time("q62_neardup_corpus", "/root/testdata/sf0.1")}%.2f s")
    spark.stop()
  }
}
