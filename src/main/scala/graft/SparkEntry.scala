package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Flagship, Parity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.q10RevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Flagship.q01PricingSummary _),
    "q02_project_filter" -> (Parity.q02ProjectFilter _),
    "q03_null_drop" -> (Parity.q03NullDrop _),
    "q04_case_when_enrich" -> (Parity.q04CaseWhenEnrich _),
    "q05_rename_shape" -> (Parity.q05RenameShape _),
    "q06_dim_decode" -> (Parity.q06DimDecode _),
    "q07_upsert" -> (Parity.q07Upsert _),
    "q08_csv_roundtrip" -> (Parity.q08CsvRoundtrip _),
    "q09_upsert_versioned" -> (Parity.q09UpsertVersioned _),
    "q10_revenue_by_nation" -> (Flagship.q10RevenueByNation _),
    "q11_top_customers_per_region" -> (Flagship.q11TopCustomersPerRegion _),
    "q12_running_totals" -> (Analytics.q12RunningTotals _),
    "q13_mom_growth" -> (Analytics.q13MomGrowth _),
    "q14_rollup" -> (Analytics.q14Rollup _),
    "q15_set_ops" -> (Analytics.q15SetOps _),
    "q16_semi_anti" -> (Analytics.q16SemiAnti _),
    "q17_scalar_functions" -> (Analytics.q17ScalarFunctions _),
    "q18_range_join" -> (Analytics.q18RangeJoin _),
    "q19_asof_join" -> (Analytics.q19AsOfJoin _),
    "q20_distinct_agg" -> (Analytics.q20DistinctAgg _),
    "q21_approx_distinct" -> (Analytics.q21ApproxDistinct _),
    "q22_events_hourly" -> (Analytics.q22EventsHourly _),
    "q24_sessions" -> (Analytics.q24Sessions _),
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
    "q02_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus IN ('F', 'O')
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_null_drop" ->
      """SELECT event_id, user_id, nullif(event_type, 'error') AS et, value
        |FROM events
        |WHERE nullif(event_type, 'error') IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q04_case_when_enrich" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice > 150000 THEN 'BIG'
        |       WHEN o_totalprice > 50000 THEN 'MID'
        |       ELSE 'SMALL' END AS order_class,
        |  CASE WHEN o_orderstatus = 'O' THEN 'OPEN'
        |       WHEN o_orderstatus = 'F' THEN 'FINISHED'
        |       ELSE o_orderstatus END AS status_label
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "q05_rename_shape" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |  l_extendedprice AS price
        |FROM lineitem
        |ORDER BY order_id, line_no""".stripMargin,
    "q06_dim_decode" ->
      """SELECT n_nationkey, n_name, r_name AS region_name,
        |  CASE r_regionkey WHEN 0 THEN 'Z-ALPHA' WHEN 1 THEN 'Z-BRAVO'
        |    WHEN 2 THEN 'Z-CHARLIE' WHEN 3 THEN 'Z-DELTA'
        |    WHEN 4 THEN 'Z-ECHO' END AS zone
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
    "q07_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |), u AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice,
        |         o_orderstatus
        |  FROM t WHERE o_orderstatus = 'O'
        |)
        |SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
        |UNION ALL
        |SELECT * FROM u
        |ORDER BY o_orderkey""".stripMargin,
    "q08_csv_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q09_upsert_versioned" ->
      """WITH allb AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, 0 AS v FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 1.05, o_orderstatus, 1
        |  FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 0.95, o_orderstatus, 2
        |  FROM orders WHERE o_orderstatus = 'P'
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY v DESC) AS rn
        |  FROM allb
        |)
        |SELECT o_orderkey, o_totalprice, o_orderstatus FROM r WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin,
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
    "q12_running_totals" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
        |  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q13_mom_growth" ->
      """WITH m AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |  FROM orders GROUP BY 1
        |)
        |SELECT month, revenue, n_orders,
        |  lag(revenue) OVER (ORDER BY month) AS prev_revenue,
        |  CASE WHEN lag(revenue) OVER (ORDER BY month) IS NOT NULL THEN
        |    round((revenue - lag(revenue) OVER (ORDER BY month))
        |          / lag(revenue) OVER (ORDER BY month), 6) END AS growth
        |FROM m
        |ORDER BY month""".stripMargin,
    "q14_rollup" ->
      """SELECT
        |  CAST(grouping(r_name) * 2 + grouping(n_name) AS INTEGER) AS lvl,
        |  coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY lvl, region_name, nation_name""".stripMargin,
    "q15_set_ops" ->
      """SELECT custkey FROM (
        |  SELECT custkey FROM (
        |    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |    INTERSECT
        |    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        |  )
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |)
        |ORDER BY custkey""".stripMargin,
    "q16_semi_anti" ->
      """SELECT c_custkey, c_name, TRUE AS has_orders FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, c_name, FALSE AS has_orders FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q17_scalar_functions" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_upper,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  substring(p_name, 1, 5) AS name_prefix,
        |  length(p_name) AS name_len,
        |  p_partkey % 7 AS key_mod,
        |  p_retailprice * 1.21 AS price_vat,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  abs(p_size - 25) AS size_dist
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q18_range_join" ->
      """SELECT p_partkey, p_size, band
        |FROM part
        |JOIN (VALUES (0, 10, 'S'), (10, 25, 'M'), (25, 40, 'L'), (40, 100, 'XL'))
        |  AS bands(lo, hi, band)
        |  ON p_size >= lo AND p_size < hi
        |ORDER BY p_partkey""".stripMargin,
    "q19_asof_join" ->
      """WITH tagged AS (
        |  SELECT event_id, user_id, ts, value,
        |    CASE WHEN event_type = 'view' THEN value END AS vval,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS side
        |  FROM events WHERE event_type IN ('view', 'click')
        |), w AS (
        |  SELECT *, last_value(vval IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, side
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_value
        |  FROM tagged
        |)
        |SELECT event_id, user_id, value, asof_view_value
        |FROM w WHERE side = 1
        |ORDER BY event_id""".stripMargin,
    "q20_distinct_agg" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT o_custkey) AS n_buyers,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q22_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q24_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events
        |), g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM o
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |)
        |SELECT user_id,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_s""".stripMargin,
  )
}
