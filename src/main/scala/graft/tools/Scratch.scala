package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("scratch", "8")
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val dir = "/root/testdata/sf0.001"
    val watchDir = java.nio.file.Files.createTempDirectory("graft_sess_src_")
    java.nio.file.Files.createSymbolicLink(
      watchDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream
      .schema(graft.streaming.EventsStream.rawSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
    try {
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName("sess_test")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      println("COMPLETE MODE OK rows=" + spark.table("sess_test").count())
    } catch { case e: Throwable => println("COMPLETE FAILED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
