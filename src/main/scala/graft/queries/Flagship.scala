package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Flagship analytics (SURVEY.md §2b / K7 made concrete): the ad-hoc SQL
  * surface of the reference warehouse (`README.md:141-147`), expressed
  * Spark-first over the driver's star schema.
  *
  * Conventions shared with the DuckDB oracles in [[graft.SparkEntry.oracleSql]]:
  *  - every computed column is aliased identically on both sides;
  *  - floating aggregates are `round(...)`-ed so double summation order
  *    cannot flip the hash compare;
  *  - every result has a deterministic total ORDER BY.
  */
object Flagship {

  /** TPC-H Q1 shape: scan → filter → hash aggregate (partial+final) → sort.
    * Narrow scan: only 7 of 11 lineitem columns read (column pruning), filter
    * pushed to parquet. One shuffle (agg on 2 low-cardinality keys). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1999-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q5 shape: 5-way join fact-to-dims. customer/nation/region are
    * broadcast (no shuffle of the fact side for them); lineitem⋈orders is the
    * single big shuffle join; AQE picks sizes at runtime. */
  def q10RevenueByNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name".as("region_name"), $"n_name".as("nation_name"))
      .agg(
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"region_name", $"nation_name")
  }

  /** Top-3 customers by revenue within each region: join + agg + ranked
    * window + filter (top-k per group without a global sort). */
  def q11TopCustomersPerRegion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val rev = o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"c_custkey", $"c_name")
      .agg(round(sum($"o_totalprice"), 2).as("total_spent"))
    val w = Window.partitionBy($"r_name")
      .orderBy($"total_spent".desc, $"c_custkey".asc)
    rev.withColumn("rank_in_region", row_number().over(w))
      .filter($"rank_in_region" <= 3)
      .select($"r_name".as("region_name"), $"rank_in_region",
        $"c_custkey", $"c_name", $"total_spent")
      .orderBy($"region_name", $"rank_in_region")
  }
}
