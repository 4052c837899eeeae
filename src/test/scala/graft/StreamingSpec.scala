package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.queries.Analytics
import graft.streaming.{EventsStream, StatefulOps}

/** Streaming paths: the streaming windowed agg must equal its batch twin,
  * and the custom stateful operator must accumulate across micro-batches. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals batch hourly agg") {
    val batch = Analytics.q22EventsHourly(spark, sf0001).collect().toSeq
    val stream = EventsStream.q23StreamingHourly(spark, sf0001).collect().toSeq
    assert(stream == batch)
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulOps.Ev]
    val q = StatefulOps.runningPerUser(input.toDS())
      .writeStream.format("memory").queryName("running_test")
      .outputMode(OutputMode.Append).start()
    input.addData(StatefulOps.Ev(1L, "view", 1.0), StatefulOps.Ev(1L, "click", 2.0))
    q.processAllAvailable()
    input.addData(StatefulOps.Ev(1L, "view", 4.0), StatefulOps.Ev(2L, "view", 9.0))
    q.processAllAvailable()
    val rows = spark.table("running_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    // user 1: first batch (2, 3.0), second batch carries state → (3, 7.0)
    assert(rows.contains((1L, 2L, 3.0)))
    assert(rows.contains((1L, 3L, 7.0)))
    assert(rows.contains((2L, 1L, 9.0)))
  }
}
