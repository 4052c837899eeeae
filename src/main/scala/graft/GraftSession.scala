package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * local[N] here, but every knob is chosen to survive a 1000-executor
  * cluster: AQE on (runtime coalesce + skew-join splitting), shuffle
  * partitions sized to cores locally (cluster: 2-3x total cores),
  * auto-broadcast enabled so dimension joins never shuffle the fact side.
  */
object GraftSession {
  def build(appName: String = "graft",
            cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // The engine's bucketed tables (MinHash signatures, dedup history
      // hashes) exist solely for their bucketing-aware merge joins; Spark's
      // DisableUnnecessaryBucketedScan heuristic drops the bucketed read in
      // exactly those plans when the probe side's stats are unknown (a
      // localCheckpoint boundary), reintroducing the table-side exchange
      // the layout was built to avoid — measured 1.5-3× slower on q139/q143
      // at sf0.1, worse with data. No other scans are bucketed, so forcing
      // bucketed reads session-wide costs nothing.
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // The iterative kernels (connectedComponents) rely on the context
      // cleaner to delete RELIABLE checkpoint files once a generation's
      // RDD is unreferenced — that cleanup is OFF by default, and without
      // it a checkpoint-dir deployment leaks one full label-generation
      // file per CC round for the app's lifetime. No-op under local
      // checkpoints (this process), load-bearing wherever a production
      // session copies these defaults and sets a checkpoint dir.
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }
}
