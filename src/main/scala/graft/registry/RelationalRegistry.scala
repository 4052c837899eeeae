package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Relational slice of the driver registry (joins, aggregations, windows, sorts, set ops, scalar functions, graph kernels) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object RelationalRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q48_asof_join_native" -> (Analytics.q48AsOfJoinNative _),
    "q20_distinct_agg" -> (Analytics.q20DistinctAgg _),
    "q21_approx_distinct" -> (Analytics.q21ApproxDistinct _),
    "q25_sliding_windows" -> (Advanced.q25SlidingWindows _),
    "q26_percentiles" -> (Advanced.q26Percentiles _),
    "q27_cube" -> (Advanced.q27Cube _),
    "q44_token_frequencies" -> (Advanced.q44TokenFrequencies _),
    "q45_interval_join" -> (Advanced.q45IntervalJoin _),
    "q46_grouping_sets" -> (Advanced.q46GroupingSets _),
    "q49_stratified_sample" -> (Advanced.q49StratifiedSample _),
    "q50_json_extract" -> (Advanced.q50JsonExtract _),
    "q53_pivot" -> (Advanced.q53Pivot _),
    "q57_correlated_subquery" -> (Advanced.q57CorrelatedSubquery _),
    "q59_first_last_value" -> (Advanced.q59FirstLastValue _),
    "q63_except_all" -> (Advanced.q63ExceptAll _),
    "q66_date_functions" -> (Advanced.q66DateFunctions _),
    "q68_gap_fill" -> (Advanced.q68GapFill _),
    "q71_scd2_intervals" -> (Advanced.q71Scd2Intervals _),
    "q72_rank_variants" -> (Advanced.q72RankVariants _),
    "q69_histogram" -> (Advanced.q69Histogram _),
    "q70_data_quality" -> (Advanced.q70DataQuality _),
    "q67_regexp_functions" -> (Advanced.q67RegexpFunctions _),
    "q64_collect_sorted" -> (Advanced.q64CollectSorted _),
    "q65_string_agg" -> (Advanced.q65StringAgg _),
    "q54_unpivot" -> (Advanced.q54Unpivot _),
    "q55_ntile" -> (Advanced.q55Ntile _),
    "q56_stats" -> (Advanced.q56Stats _),
    "q74_tfidf" -> (Extra.q74Tfidf _),
    "q75_only_slow_supplier" -> (Extra.q75OnlySlowSupplier _),
    "q76_equi_depth_histogram" -> (Extra.q76EquiDepthHistogram _),
    "q77_filtered_agg" -> (Extra.q77FilteredAgg _),
    "q83_heavy_hitters" -> ((s: SparkSession, d: String) => Extra.q83HeavyHitters(s, d)),
    "q84_range_join_bucketed" -> (Extra.q84RangeJoinBucketed _),
    "q85_interval_overlap" -> (Extra.q85IntervalOverlap _),
    "q89_ratio_to_report" -> (Extra.q89RatioToReport _),
    "q90_variant" -> (Extra.q90Variant _),
    "q92_incremental_agg" -> (Extra.q92IncrementalAgg _),
    "q101_recursive_hierarchy" -> (Extra.q101RecursiveHierarchy _),
    "q102_lateral_topn" -> (Extra.q102LateralTopN _),
    "q103_fuzzy_match" -> (Extra.q103FuzzyMatch _),
    "q104_column_profile" -> (Extra.q104ColumnProfile _),
    // Sketch percentiles — no SQL oracle (engine-specific sketch); error
    // bound vs the exact q26 path asserted in AnalyticsSketchSpec.
    "q105_approx_percentiles" -> (Analytics.q105ApproxPercentiles _),
    "q106_interpolate" -> (Advanced.q106Interpolate _),
    "q107_zonemap_prune" -> (Advanced.q107ZonemapPrune _),
    "q108_mv_rewrite" -> (Advanced.q108MvRewrite _),
    "q109_pagerank" -> (Extra.q109Pagerank _),
    "q110_full_outer" -> (Extra.q110FullOuter _),
    "q111_outliers" -> (Extra.q111Outliers _),
    "q146_hll_error_bound" -> (Analytics.q146HllErrorBound _),
    "q147_percentile_rank_bound" -> (Analytics.q147PercentileRankBound _),
    "q148_cms_guarantees" ->
      ((s: SparkSession, d: String) => Extra.q148CmsGuarantees(s, d)),
    "q113_skyline" -> (Extra.q113Skyline _),
    "q117_triangles" -> (Extra.q117Triangles _),
    // Sketch rollup — no SQL oracle (DuckDB has no persistable sketch
    // type); merged==direct and error bound asserted in QualitySpec.
    "q118_sketch_rollup" -> (Extra.q118SketchRollup _),
    "q122_market_basket" -> ((s, dir) => Extra.q122MarketBasket(s, dir)),
    "q124_skew_report" -> (Extra.q124SkewReport _),
    "q126_winsorize" -> (Extra.q126Winsorize _),
    "q127_group_trend" -> (Extra.q127GroupTrend _),
    "q131_bloom_lookup" -> (Advanced.q131BloomLookup _),
    "q136_basket_concentration" -> (Extra.q136BasketConcentration _),
    "q137_pit_scd2" -> (Advanced.q137PitScd2 _),
  )

  val oracleSql: Map[String, String] = Map(
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
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  p_partkey % 7 AS key_mod,
        |  p_retailprice * 1.21 AS price_vat,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  abs(p_size - 25) AS size_dist
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q18_range_join" -> SharedOracleSql.rangeJoinOracleSql,
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
    "q49_stratified_sample" ->
      """WITH t AS (
        |  SELECT lang, count(*) AS n_total FROM documents GROUP BY lang
        |), s AS (
        |  SELECT lang, count(*) AS n_sampled FROM documents
        |  WHERE doc_id % 10 < 3 GROUP BY lang
        |)
        |SELECT t.lang AS lang, n_total, n_sampled,
        |  round(CAST(n_sampled AS DOUBLE) / n_total, 4) AS rate
        |FROM t JOIN s ON t.lang = s.lang
        |ORDER BY lang""".stripMargin,
    "q50_json_extract" ->
      """WITH e AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value
        |  FROM events
        |)
        |SELECT k % 10 AS k_bucket, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q71_scd2_intervals" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS effective_from,
        |  lead(o_orderdate) OVER w AS effective_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, effective_from, o_orderkey""".stripMargin,
    "q72_rank_variants" ->
      """SELECT p_partkey, p_brand, p_size,
        |  CAST(row_number() OVER (PARTITION BY p_brand
        |    ORDER BY p_size DESC, p_partkey ASC) AS INTEGER) AS rn,
        |  CAST(rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS INTEGER)
        |    AS rk,
        |  CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC)
        |    AS INTEGER) AS drk
        |FROM part WHERE p_partkey <= 300
        |ORDER BY p_partkey""".stripMargin,
    "q68_gap_fill" ->
      """WITH bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
        |  FROM events
        |), grid AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
        |), actual AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n FROM events GROUP BY 1
        |)
        |SELECT grid.hour AS hour, coalesce(n, 0) AS n_events
        |FROM grid LEFT JOIN actual ON grid.hour = actual.hour
        |ORDER BY hour""".stripMargin,
    "q69_histogram" ->
      """SELECT bin, CAST(bin * 50000 AS BIGINT) AS bin_lo, count(*) AS n_orders FROM (
        |  SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS INTEGER) AS bin
        |  FROM orders
        |)
        |GROUP BY bin ORDER BY bin""".stripMargin,
    "q70_data_quality" ->
      """SELECT count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS null_quantity,
        |  CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS bad_discount,
        |  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS nonpositive_price,
        |  CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0 ELSE 1 END)
        |    AS BIGINT) AS bad_returnflag,
        |  (SELECT count(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE l.l_orderkey = o.o_orderkey))
        |    AS orphan_lineitems
        |FROM lineitem""".stripMargin,
    "q66_date_functions" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS INTEGER) AS days_since_95
        |FROM orders WHERE o_orderkey <= 500
        |ORDER BY o_orderkey""".stripMargin,
    "q67_regexp_functions" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER)
        |    AS n_consonant_chars,
        |  regexp_matches(text, 'merge.*join|join.*merge') AS mentions_merge_join
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q63_except_all" ->
      """WITH big AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        |), open_o AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |), ex AS (
        |  SELECT custkey, count(*) AS n, 'except_all' AS op FROM (
        |    SELECT custkey FROM big EXCEPT ALL SELECT custkey FROM open_o
        |  ) GROUP BY custkey
        |), inx AS (
        |  SELECT custkey, count(*) AS n, 'intersect_all' AS op FROM (
        |    SELECT custkey FROM big INTERSECT ALL SELECT custkey FROM open_o
        |  ) GROUP BY custkey
        |)
        |SELECT custkey, n, op FROM ex
        |UNION ALL SELECT custkey, n, op FROM inx
        |ORDER BY op, custkey""".stripMargin,
    "q64_collect_sorted" ->
      """SELECT l_orderkey,
        |  string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber)
        |    AS line_numbers,
        |  CAST(len(list(l_linenumber)) AS INTEGER) AS n_lines
        |FROM lineitem WHERE l_orderkey <= 100
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "q65_string_agg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q59_first_last_value" ->
      """SELECT o_orderkey, o_custkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "q57_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice >= 1.5 * (
        |  SELECT avg(o_totalprice) FROM orders i WHERE i.o_custkey = o.o_custkey
        |)
        |ORDER BY o_orderkey""".stripMargin,
    "q53_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS rev_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS rev_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS rev_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q54_unpivot" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS rev_f,
        |    round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS rev_o,
        |    round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS rev_p
        |  FROM orders GROUP BY o_orderpriority
        |)
        |SELECT o_orderpriority, status_col, revenue FROM (
        |  SELECT o_orderpriority, 'rev_f' AS status_col, rev_f AS revenue FROM p
        |  UNION ALL
        |  SELECT o_orderpriority, 'rev_o', rev_o FROM p
        |  UNION ALL
        |  SELECT o_orderpriority, 'rev_p', rev_p FROM p
        |)
        |WHERE revenue IS NOT NULL
        |ORDER BY o_orderpriority, status_col""".stripMargin,
    "q55_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS INTEGER)
        |    AS quartile,
        |  round(percent_rank() OVER (ORDER BY c_acctbal ASC, c_custkey ASC), 6)
        |    AS pct_rank
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
    "q56_stats" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT c_mktsegment,
        |  round(stddev_samp(c_acctbal), 4) AS bal_stddev,
        |  round(var_samp(c_acctbal), 2) AS bal_var,
        |  round(corr(c_acctbal, n_orders), 4) AS bal_orders_corr
        |FROM customer JOIN pc ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q48_asof_join_native" ->
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
    "q25_sliding_windows" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    TIMESTAMP '1970-01-01 00:00:00'
        |      + CAST(floor(epoch(ts) / 1800) AS BIGINT) * (INTERVAL 30 MINUTE)
        |      AS t30
        |  FROM events
        |), x AS (
        |  SELECT event_type, value,
        |    unnest([t30, t30 - INTERVAL 30 MINUTE]) AS bucket_start
        |  FROM e
        |)
        |SELECT bucket_start, event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q26_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        |  round(min(o_totalprice), 2) AS min_price,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q27_cube" ->
      """SELECT
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INTEGER) AS lvl,
        |  coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY lvl, status, priority""".stripMargin,
    "q44_token_frequencies" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
        |)
        |GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""".stripMargin,
    "q45_interval_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  v.event_id AS view_id,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= 300000000
        |ORDER BY click_id, view_id""".stripMargin,
    "q46_grouping_sets" ->
      """SELECT
        |  CAST(grouping(r_name) * 2 + grouping(n_name) AS INTEGER) AS lvl,
        |  coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name), ())
        |ORDER BY lvl, region_name, nation_name""".stripMargin,
    // q146-q149: companion oracles for the sketch/ANN family (q21/q118/q138
    // HLL, q105 GK percentiles, q83 CMS, q38/q42/q98/q99 ANN — all stay
    // no_oracle because DuckDB runs different sketches / can't reproduce
    // trained quantizers). Each states the kernel's published guarantee as
    // a SQL-checkable invariant next to the exact values DuckDB CAN
    // compute: estimate-within-bound, rank-within-band, never-undercount,
    // recall-above-floor.
    "q146_hll_error_bound" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS exact_buyers,
        |       true AS acd_within_5pct, true AS hll_within_5pct
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q147_percentile_rank_bound" ->
      """SELECT l_returnflag, count(*) AS n,
        |       true AS p50_ok, true AS p95_ok, true AS p99_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q148_cms_guarantees" ->
      """SELECT l_partkey, count(*) AS exact_n,
        |       true AS no_undercount, true AS overcount_bounded
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY exact_n DESC, l_partkey LIMIT 10""".stripMargin,
    "q74_tfidf" ->
      """WITH corpus AS (
        |  SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 50
        |), tokens AS (
        |  SELECT doc_id, unnest(string_split_regex(t, '[^a-z]+')) AS term
        |  FROM corpus
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tokens
        |  WHERE term <> '' GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (
        |  SELECT count(DISTINCT doc_id) AS n_docs FROM corpus
        |), scored AS (
        |  SELECT doc_id, term, tf, df,
        |    round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, rank, term, tf, df, score FROM ranked
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    "q75_only_slow_supplier" -> Extra.q75Sql,
    "q76_equi_depth_histogram" ->
      """SELECT decile, count(*) AS n_orders,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi,
        |  round(avg(o_totalprice), 4) AS avg_price
        |FROM (
        |  SELECT o_totalprice, CAST(ntile(10) OVER (
        |    ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS decile
        |  FROM orders
        |)
        |GROUP BY decile ORDER BY decile""".stripMargin,
    "q77_filtered_agg" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_total,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
        |  round(sum(o_totalprice) FILTER (WHERE o_totalprice > 200000.0), 2)
        |    AS sum_large,
        |  round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 4)
        |    AS avg_f_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q84_range_join_bucketed" -> SharedOracleSql.rangeJoinOracleSql,
    "q85_interval_overlap" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS lo
        |  FROM orders WHERE o_custkey <= 20
        |), i AS (
        |  SELECT o_custkey, o_orderkey, lo, lo + 30 AS hi FROM o
        |)
        |SELECT a.o_custkey AS a_cust, b.o_custkey AS b_cust,
        |  count(*) AS n_overlaps
        |FROM i a JOIN i b
        |  ON a.lo < b.hi AND b.lo < a.hi
        | AND a.o_orderkey < b.o_orderkey AND a.o_custkey <> b.o_custkey
        |GROUP BY 1, 2 ORDER BY a_cust, b_cust""".stripMargin,
    "q89_ratio_to_report" ->
      """WITH rev AS (
        |  SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS revenue
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name
        |)
        |SELECT n_name, revenue,
        |  round(revenue / sum(revenue) OVER (), 6) AS share,
        |  CAST(rank() OVER (ORDER BY revenue DESC, n_name) AS INTEGER)
        |    AS rev_rank
        |FROM rev ORDER BY rev_rank, n_name""".stripMargin,
    "q90_variant" ->
      """WITH e AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |  FROM events
        |)
        |SELECT k % 2 AS k_parity, count(*) AS n_events,
        |  CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY 1 ORDER BY k_parity""".stripMargin,
    // q92: the oracle is the from-scratch recompute the incremental refresh
    // must be indistinguishable from.
    "q92_incremental_agg" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    // q101/q102: the Spark query IS the same SQL text.
    "q101_recursive_hierarchy" -> graft.queries.Extra.q101Sql,
    "q102_lateral_topn" -> graft.queries.Extra.q102Sql,
    "q106_interpolate" ->
      """WITH obs AS (
        |  SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
        |    (CAST(round(sum(value) * 100) AS BIGINT) * 100) // count(*) AS v4
        |  FROM events WHERE event_type = 'error' GROUP BY 1
        |), bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM obs),
        |grid AS (
        |  SELECT CAST(g.i AS BIGINT) AS h
        |  FROM bounds, UNNEST(generate_series(lo, hi)) AS g(i)
        |), joined AS (
        |  SELECT grid.h, obs.v4 FROM grid LEFT JOIN obs ON grid.h = obs.h
        |), w AS (
        |  SELECT h, v4,
        |    last_value(v4 IGNORE NULLS) OVER (ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v4 IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER (ORDER BY h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
        |    first_value(v4 IGNORE NULLS) OVER (ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v4 IS NOT NULL THEN h END IGNORE NULLS)
        |      OVER (ORDER BY h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
        |  FROM joined
        |)
        |SELECT h, CASE WHEN v4 IS NOT NULL THEN 0 ELSE 1 END AS interpolated,
        |  (CASE WHEN v4 IS NOT NULL THEN v4
        |        WHEN pv IS NULL THEN nv
        |        WHEN nv IS NULL THEN pv
        |        ELSE (pv * (nh - h) + nv * (h - ph)) // (nh - ph) END)
        |    / 10000.0 AS value
        |FROM w ORDER BY h""".stripMargin,
    "q107_zonemap_prune" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 5000
        |  AND l_partkey BETWEEN 50 AND 150
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q108_mv_rewrite" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem WHERE l_linestatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q109_pagerank" ->
      """WITH nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer),
        |edges AS (
        |  SELECT id AS src, id // 2 AS dst FROM nodes WHERE id >= 2
        |  UNION ALL
        |  SELECT id AS src, id // 3 AS dst FROM nodes WHERE id >= 3
        |),
        |outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
        |c1 AS (SELECT e.dst AS id, CAST(SUM(r.rank // o.od) AS BIGINT) AS contrib
        |       FROM edges e JOIN r0 r ON e.src = r.id JOIN outdeg o ON e.src = o.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.id, CAST(150000000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c1 c ON n.id = c.id),
        |c2 AS (SELECT e.dst AS id, CAST(SUM(r.rank // o.od) AS BIGINT) AS contrib
        |       FROM edges e JOIN r1 r ON e.src = r.id JOIN outdeg o ON e.src = o.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.id, CAST(150000000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c2 c ON n.id = c.id),
        |c3 AS (SELECT e.dst AS id, CAST(SUM(r.rank // o.od) AS BIGINT) AS contrib
        |       FROM edges e JOIN r2 r ON e.src = r.id JOIN outdeg o ON e.src = o.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.id, CAST(150000000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS rank
        |       FROM nodes n LEFT JOIN c3 c ON n.id = c.id)
        |SELECT id, rank FROM r3 ORDER BY rank DESC, id ASC LIMIT 20""".stripMargin,
    "q110_full_outer" ->
      """WITH c AS (
        |  SELECT c_nationkey AS nk, count(*) AS n_cust,
        |    round(sum(c_acctbal), 2) AS cust_bal
        |  FROM customer WHERE c_nationkey < 20 GROUP BY 1
        |), s AS (
        |  SELECT s_nationkey AS nk, count(*) AS n_supp,
        |    round(sum(s_acctbal), 2) AS supp_bal
        |  FROM supplier WHERE s_nationkey >= 5 GROUP BY 1
        |)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, cust_bal,
        |  COALESCE(n_supp, 0) AS n_supp, supp_bal
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nationkey""".stripMargin,
    "q111_outliers" ->
      """WITH stats AS (
        |  SELECT o_orderpriority AS p, avg(o_totalprice) AS mu,
        |    stddev_samp(o_totalprice) AS sigma
        |  FROM orders GROUP BY 1
        |)
        |SELECT o_orderkey, o_orderpriority,
        |  round((o_totalprice - mu) / sigma, 4) AS z
        |FROM orders JOIN stats ON o_orderpriority = p
        |ORDER BY abs(round((o_totalprice - mu) / sigma, 4)) DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q113_skyline" ->
      """WITH pts AS (
        |  SELECT l_suppkey AS suppkey,
        |    CAST(round(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS rev_c,
        |    CAST(SUM(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT suppkey, rev_c, qty FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.rev_c >= p.rev_c AND q.qty >= p.qty
        |    AND (q.rev_c > p.rev_c OR q.qty > p.qty))
        |ORDER BY rev_c DESC, suppkey""".stripMargin,
    "q103_fuzzy_match" ->
      """WITH probes AS (
        |  SELECT p_partkey AS probe_id,
        |    substr(p_name, 2) || substr(p_name, 1, 1) AS probe_name
        |  FROM part WHERE p_partkey < 20
        |), scored AS (
        |  SELECT probe_id, p_partkey AS match_key,
        |    CAST(levenshtein(probe_name, p_name) AS INTEGER) AS dist
        |  FROM probes, part
        |), best AS (
        |  SELECT probe_id, match_key, dist,
        |    row_number() OVER (PARTITION BY probe_id ORDER BY dist, match_key) AS rn
        |  FROM scored
        |)
        |SELECT probe_id, match_key, dist FROM best WHERE rn = 1
        |ORDER BY probe_id""".stripMargin,
    "q104_column_profile" ->
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
        |FROM orders
        |ORDER BY col_name""".stripMargin,
    "q117_triangles" ->
      """WITH nodes AS (SELECT CAST(p_partkey AS BIGINT) AS id FROM part),
        |edges AS (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT id - 1 AS u, id AS v FROM nodes WHERE id >= 2
        |    UNION ALL
        |    SELECT id // 2 AS u, id AS v FROM nodes WHERE id >= 2
        |  ) e
        |),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM (SELECT u AS a, v AS b FROM edges) ab
        |  JOIN (SELECT u AS b, v AS c FROM edges) bc USING (b)
        |  JOIN (SELECT u AS a, v AS c FROM edges) ac USING (a, c)
        |)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT count(*) FROM edges) AS n_edges,
        |       n_triangles
        |FROM tri""".stripMargin,
    "q122_market_basket" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |), n_orders AS (
        |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
        |), item_n AS (
        |  SELECT l_partkey, count(*) AS n_item FROM li GROUP BY 1
        |), pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |)
        |SELECT part_a, part_b, n_ab,
        |  round(n_ab / CAST(na.n_item AS DOUBLE), 6) AS confidence,
        |  round((n_ab * o.n_orders) / CAST(na.n_item * nb.n_item AS DOUBLE), 6)
        |    AS lift
        |FROM pairs
        |JOIN item_n na ON pairs.part_a = na.l_partkey
        |JOIN item_n nb ON pairs.part_b = nb.l_partkey
        |CROSS JOIN n_orders o
        |ORDER BY n_ab DESC, part_a, part_b
        |LIMIT 20""".stripMargin,
    "q124_skew_report" ->
      """WITH counts AS (
        |  SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
        |), ranked AS (
        |  SELECT cnt, l_partkey,
        |    row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rk,
        |    count(*) OVER () AS n_keys
        |  FROM counts
        |)
        |SELECT CAST(max(n_keys) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_cnt,
        |  round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
        |  round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
        |  round(sum(CASE WHEN rk <= ceil(n_keys / 100.0) THEN cnt ELSE 0 END)
        |        / CAST(sum(cnt) AS DOUBLE), 6) AS top1pct_share
        |FROM ranked""".stripMargin,
    "q126_winsorize" ->
      """WITH o AS (
        |  SELECT o_orderstatus,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders
        |), b AS (
        |  SELECT o_orderstatus,
        |    CAST(round(quantile_cont(c, 0.01)) AS BIGINT) AS lo,
        |    CAST(round(quantile_cont(c, 0.99)) AS BIGINT) AS hi
        |  FROM o GROUP BY 1
        |)
        |SELECT o.o_orderstatus, count(*) AS n,
        |  CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        |  CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        |  max(lo) AS lo_c, max(hi) AS hi_c,
        |  round(CAST(sum(least(greatest(c, lo), hi)) AS BIGINT)
        |        / (100.0 * count(*)), 4) AS mean_winsorized
        |FROM o JOIN b USING (o_orderstatus)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q127_group_trend" ->
      """WITH yearly AS (
        |  SELECT n_name, year(o_orderdate) - 2000 AS yr_c,
        |    round(sum(o_totalprice), 2) / 1e6 AS rev_musd
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2
        |)
        |SELECT n_name, count(*) AS n_years,
        |  round(regr_slope(rev_musd, yr_c), 4) AS slope_musd_per_yr,
        |  round(regr_intercept(rev_musd, yr_c), 4) AS level_2000_musd,
        |  round(regr_r2(rev_musd, yr_c), 4) AS r2
        |FROM yearly GROUP BY 1 ORDER BY 1""".stripMargin,
    // The oracle is the SAME IN-list probe over the raw table: blooms have
    // no false negatives and the predicate re-applies post-prune, so the
    // layout+index machinery must be invisible in the result.
    "q131_bloom_lookup" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (1, 2, 3, 32, 33, 1000, 1027, 5000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Scalar-SQL twin of the Spark side's array-HOF formulation — identical
    // integer arithmetic, so the lambda path is provably exact.
    "q136_basket_concentration" ->
      """WITH c AS (
        |  SELECT l_orderkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem WHERE l_orderkey <= 2000
        |)
        |SELECT l_orderkey,
        |  CAST(count(*) AS INTEGER) AS n_items,
        |  CAST(sum(c) AS BIGINT) AS total_cents,
        |  round(CAST(sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS DOUBLE)
        |        / CAST(CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)
        |               AS DOUBLE), 6) AS hhi
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same portable as-of emulation as q19/q48: union both sides, version
    // rows (side 0) sort before same-day facts, ignoreNulls last_value
    // carries the in-effect version forward.
    "q137_pit_scd2" ->
      """WITH ver AS (
        |  SELECT o_custkey, o_orderdate AS t, o_totalprice AS ver_price,
        |    row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |      ORDER BY o_orderkey DESC) AS rn
        |  FROM orders WHERE o_custkey <= 100
        |), d AS (
        |  SELECT o_custkey, t, ver_price FROM ver WHERE rn = 1
        |), f AS (
        |  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
        |    l.l_shipdate AS t
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_custkey <= 100
        |), u AS (
        |  SELECT o_custkey, t, ver_price, 0 AS side,
        |    CAST(NULL AS BIGINT) AS l_orderkey,
        |    CAST(NULL AS BIGINT) AS l_linenumber
        |  FROM d
        |  UNION ALL
        |  SELECT o_custkey, t, NULL, 1, l_orderkey, l_linenumber FROM f
        |), w AS (
        |  SELECT *, last_value(ver_price IGNORE NULLS) OVER (
        |    PARTITION BY o_custkey ORDER BY t, side
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pit
        |  FROM u
        |)
        |SELECT l_orderkey, l_linenumber, o_custkey, t AS ship_date,
        |  COALESCE(round(pit, 2), -1) AS pit_price
        |FROM w WHERE side = 1
        |ORDER BY 1, 2""".stripMargin,
  )
}
