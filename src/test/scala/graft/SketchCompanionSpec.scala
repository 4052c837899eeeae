package graft

import graft.ext.Similarity
import graft.queries.{Analytics, Extra}

/** Companion-oracle invariants for the sketch/ANN family (q146-q149): every
  * guarantee column the driver's DuckDB oracle will assert TRUE must hold at
  * the spec fixture too, so a threshold drifting out of band is caught at
  * `sbt test` time, not by a red CORRECTNESS row.
  */
class SketchCompanionSpec extends SparkSpec {

  private def allTrue(rows: Array[org.apache.spark.sql.Row],
                      cols: Seq[String]): Unit =
    rows.foreach { r =>
      cols.foreach { c =>
        assert(r.getAs[Boolean](c), s"$c false in row $r")
      }
    }

  test("q146: both HLL estimators land within 5% of the exact distinct count") {
    val out = Analytics.q146HllErrorBound(spark, sf0001).collect()
    assert(out.length == 5, "one row per market segment")
    allTrue(out, Seq("acd_within_5pct", "hll_within_5pct"))
  }

  test("q147: GK percentile ranks stay inside the slacked band per returnflag") {
    val out = Analytics.q147PercentileRankBound(spark, sf0001).collect()
    assert(out.length == 3, "one row per returnflag")
    allTrue(out, Seq("p50_ok", "p95_ok", "p99_ok"))
  }

  test("q148: CMS never undercounts and overcounts inside the 10x eps*N band") {
    val out = Extra.q148CmsGuarantees(spark, sf0001).collect()
    assert(out.length == 10, "top-10 heavy hitters")
    allTrue(out, Seq("no_undercount", "overcount_bounded"))
  }

  test("q149: every ANN method clears its recall floor vs brute force") {
    val out = Similarity.q149AnnRecallFloors(spark, sf0001).collect()
    assert(out.map(_.getAs[String]("method")).toSeq ==
      Seq("ivf", "ivfpq", "lsh", "pq"))
    assert(out.forall(_.getAs[Long]("n_queries") == 8L))
    allTrue(out, Seq("recall_ge_floor"))
  }
}
