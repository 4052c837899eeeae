package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Flagship

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.q10RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Flagship.q01PricingSummary _),
    "q10_revenue_by_nation" -> (Flagship.q10RevenueByNation _),
    "q11_top_customers_per_region" -> (Flagship.q11TopCustomersPerRegion _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q10_revenue_by_nation" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY region_name, nation_name""".stripMargin,
    "q11_top_customers_per_region" ->
      """WITH rev AS (
        |  SELECT r_name, c_custkey, c_name,
        |    round(sum(o_totalprice), 2) AS total_spent
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, c_custkey, c_name
        |), ranked AS (
        |  SELECT r_name, c_custkey, c_name, total_spent,
        |    row_number() OVER (PARTITION BY r_name
        |                       ORDER BY total_spent DESC, c_custkey ASC) AS rank_in_region
        |  FROM rev
        |)
        |SELECT r_name AS region_name, rank_in_region, c_custkey, c_name, total_spent
        |FROM ranked WHERE rank_in_region <= 3
        |ORDER BY region_name, rank_in_region""".stripMargin,
  )
}
