package graft.tools

/** Ad-hoc single-query timer: runMain graft.tools.TimeOne <query> <sfDir>. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("time-one",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val (q, dir) = (args(0), args(1))
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
