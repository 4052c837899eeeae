package graft
object Q122Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_big64")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Bench.muteBenignWarns()
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q122_market_basket")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // plan node check
    val plan = graft.SparkEntry.queries("q122_market_basket")(spark, dir)
      .queryExecution.executedPlan.toString
    println("ObjectHashAggregate in plan: " + plan.contains("ObjectHashAggregate"))
    println("SortAggregate in plan: " + plan.contains("SortAggregate"))
    for (thr <- Seq("128", "4194304", "128")) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      run() // warm at this conf
      val walls = (1 to 2).map(_ => run())
      println(f"threshold=$thr%-8s walls ${walls.map(w => f"$w%6.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
