package graft

import graft.queries.Analytics

/** q105's Greenwald-Khanna approx percentiles against the exact values: with
  * accuracy 10⁴ the rank error is ≤ n/10⁴ rows, so on this data the value
  * error at each probed quantile must be tiny relative to the local value
  * spread. Asserted as a relative-value tolerance per (flag, quantile). */
class AnalyticsSketchSpec extends SparkSpec {

  test("q105 approx percentiles land within tolerance of the exact percentiles") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val approx = Analytics.q105ApproxPercentiles(spark, sf001)
      .collect().map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf001)
      .groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D, 0.99D))").as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((flag, ap) <- approx; (e, a) <- exact(flag).zip(ap)) {
      assert(math.abs(a - e) / math.max(e, 1.0) < 0.02,
        f"$flag: approx $a%.2f vs exact $e%.2f out of tolerance")
    }
  }
}
