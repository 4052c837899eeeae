package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.AsOfJoin

/** Wide analytics surface (SURVEY.md §2b): windows, rollup, set ops, semi/
  * anti joins, scalar functions, range & as-of joins, distinct aggregates,
  * event-time bucketing — the concrete form of the reference's "arbitrary
  * SQL over the warehouse table" capability (K7, `README.md:141-147`).
  */
object Analytics {

  /** Running totals + sliding 3-row average per customer — frame-based
    * window aggregates. One shuffle (partition by customer). */
  def q12RunningTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, dir)
      .withColumn("running_spend",
        round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("avg3",
        // scale 4, not 2: a 2-row window of cent-exact prices averages to an
        // exact half-cent, where Spark (HALF_UP) and DuckDB disagree.
        round(avg($"o_totalprice").over(w.rowsBetween(-2, 0)), 4))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice",
        $"running_spend", $"avg3")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** Month-over-month revenue growth: date_trunc + lag window. */
  def q13MomGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
    val w = Window.orderBy($"month")
    monthly
      .withColumn("prev_revenue", lag($"revenue", 1).over(w))
      .withColumn("growth",
        when($"prev_revenue".isNotNull,
          round(($"revenue" - $"prev_revenue") / $"prev_revenue", 6)))
      .orderBy($"month")
  }

  /** ROLLUP region→nation revenue with explicit grouping level — hierarchy
    * totals in one pass (Expand + single aggregate). */
  def q14Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, dir)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(
        (grouping($"r_name") * 2 + grouping($"n_name")).cast("int").as("lvl"),
        round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .select(
        $"lvl",
        coalesce($"r_name", lit("ALL")).as("region_name"),
        coalesce($"n_name", lit("ALL")).as("nation_name"),
        $"revenue", $"n_orders")
      .orderBy($"lvl", $"region_name", $"nation_name")
  }

  /** Set operations: INTERSECT then EXCEPT (both DISTINCT semantics, matching
    * SQL). Buyers in the BUILDING segment who have a >100k order, minus those
    * who ever placed a finished ('F') order. */
  def q15SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("custkey"))
    val bigSpenders = o.filter($"o_totalprice" > 100000).select($"o_custkey".as("custkey"))
    val finished = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
    building.intersect(bigSpenders).except(finished).orderBy($"custkey")
  }

  /** Semi/anti joins: every customer flagged by order existence — the
    * EXISTS / NOT EXISTS pair as Spark join types. */
  def q16SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val withOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
      .withColumn("has_orders", lit(true))
    val withoutOrders = c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
      .withColumn("has_orders", lit(false))
    withOrders.unionByName(withoutOrders)
      .select($"c_custkey", $"c_name", $"has_orders")
      .orderBy($"c_custkey")
  }

  /** Scalar function surface: string/math/date built-ins (all codegen'd,
    * no UDFs), aligned with DuckDB spellings in the oracle. */
  def q17ScalarFunctions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_upper"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        substring($"p_name", 1, 5).as("name_prefix"),
        length($"p_name").as("name_len"),
        ($"p_partkey" % 7).as("key_mod"),
        ($"p_retailprice" * 1.21).as("price_vat"),
        round(sqrt($"p_retailprice"), 6).as("price_sqrt"),
        floor($"p_retailprice").cast("long").as("price_floor"),
        ceil($"p_retailprice").cast("long").as("price_ceil"),
        abs($"p_size" - 25).as("size_dist"))
      .orderBy($"p_partkey")
  }

  /** Range (theta) join: parts classified into size bands via a broadcast
    * non-equi join — the band table never forces a shuffle of the fact. */
  def q18RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq((0, 10, "S"), (10, 25, "M"), (25, 40, "L"), (40, 100, "XL"))
      .toDF("lo", "hi", "band")
    Tables.part(spark, dir)
      .join(broadcast(bands), $"p_size" >= $"lo" && $"p_size" < $"hi")
      .select($"p_partkey", $"p_size", $"band")
      .orderBy($"p_partkey")
  }

  /** As-of join over events: each click picks up the most recent prior (or
    * same-instant) view's value per user. Exact ns ordering via ts_ns. */
  def q19AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_ns", $"event_id", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts_ns", $"value".as("view_value"))
    AsOfJoin.lookup(clicks, views, Seq("user_id"), "ts_ns", Seq("view_value"))
      .select($"event_id", $"user_id", $"value", $"asof_view_value")
      .orderBy($"event_id")
  }

  /** Same as-of semantics as q19, executed by the native custom operator
    * ([[graft.plans.NativeAsOfJoin]]: LogicalPlan + Strategy + sort-merge
    * SparkPlan) — both hash-match the same DuckDB oracle. */
  def q48AsOfJoinNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_ns", $"event_id", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts_ns", $"value".as("view_value"))
    graft.plans.NativeAsOfJoin.lookup(clicks, views, Seq("user_id"), "ts_ns", Seq("view_value"))
      .select($"event_id", $"user_id", $"value", $"asof_view_value")
      .orderBy($"event_id")
  }

  /** Distinct aggregates per segment (exact). */
  def q20DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        countDistinct($"o_custkey").as("n_buyers"),
        countDistinct($"o_orderstatus").as("n_statuses"),
        count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"c_mktsegment")
  }

  /** Approximate distinct (HyperLogLog++): the sketch path for 100 TB
    * cardinality estimation. No DuckDB oracle (different sketch) — driver
    * records a rows-only check; the exact/approx agreement is unit-tested.
    *
    * CONTRACT (since round 12): this query's error bound is 2% rsd — a
    * shipped-result semantic, not an internal tuning knob. Callers who
    * need the 1% class must use the DataSketches kernel path (q118/q138)
    * rather than tightening this rsd back.
    *
    * rsd 0.02, not 0.01, and deliberately: the built-in
    * `approx_count_distinct` carries its 2^p-register sketch as ~2^p/6
    * individual LONG COLUMNS in the aggregation buffer, so analyzer/
    * optimizer/codegen walks scale with register count — a FIXED per-
    * execution cost, not a per-row one (measured ~1.0 s at rsd 0.01 even
    * on a 25-row input vs ~0.2 s at rsd 0.02 and ~0.05 s at the default;
    * row count 25 vs 150k moved none of them). At rsd 0.02 the realized
    * error here is ≤ 2% at the oracle SF (≤ 3.7% at sf0.1), comfortably
    * inside q146's 5% audit. When 1%-class precision is actually required,
    * the DataSketches kernel is the right tool — same estimate class at
    * 0.81% standard error with ONE binary buffer column (q118/q138, and
    * q146 audits both paths side by side at rsd 0.01 / lgK 14). */
  def q21ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(approx_count_distinct($"o_custkey", 0.02).as("approx_buyers"))
      .orderBy($"c_mktsegment")
  }

  /** q105: approximate percentiles (Greenwald-Khanna sketch, accuracy
    * parameter 10⁴ ⇒ rank error ≤ n/10⁴) — the bounded-memory one-pass
    * companion to q26's exact path, completing the sketch family (HLL q21,
    * count-min q83). No oracle (different sketch in DuckDB); the error
    * bound vs the exact percentiles is asserted in AnalyticsSketchSpec.
    * The three quantiles are projected as scalar columns (p50/p95/p99)
    * rather than one ARRAY column so the verify harness's sort/hash
    * bookkeeping works on the output shape. */
  def q105ApproxPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        approx_percentile($"l_extendedprice", array(lit(0.5), lit(0.95), lit(0.99)),
          lit(10000)).as("approx_pcts"))
      .select($"l_returnflag", $"n",
        element_at($"approx_pcts", 1).as("p50"),
        element_at($"approx_pcts", 2).as("p95"),
        element_at($"approx_pcts", 3).as("p99"))
      .orderBy($"l_returnflag")
  }

  /** Error-bound COMPANION ORACLE for the HLL family (q21's
    * `approx_count_distinct` and q118/q138's `hll_sketch_agg` kernel —
    * VERDICT r09 #4 pattern, same shape as q144/q145). The sketches stay
    * `no_oracle` (DuckDB's HLL is a different sketch), but the INVARIANT is
    * SQL-statable without computing them: both estimators carry a published
    * relative-error bound (rsd 1% for ACD; ≈0.81% for lgK=14 DataSketches
    * HLL), so every per-segment estimate must land within a generous 5%
    * (> 5 sigma) of the exact distinct count DuckDB can compute. One
    * aggregation pass evaluates the exact path and both sketches
    * side-by-side — exactly the sketch-vs-exact audit a production
    * deployment runs on a sampled partition before trusting the sketch
    * corpus-wide. */
  def q146HllErrorBound(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Dedup (segment, custkey) FIRST: every measure below is
    // duplicate-insensitive (exact distinct by definition; both HLL
    // variants hash each key to the same registers however often it
    // repeats), so the pre-aggregation is semantically free — and it
    // removes the Expand that mixing countDistinct with two sketch
    // aggregates would otherwise plan (measured 33 s at sf0.1: every
    // source row duplicated per aggregate branch, each carrying a 2^14-
    // register sketch update; deduped: one hash agg + sketches over the
    // collapsed keys, ~1 s).
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_custkey").distinct()
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("exact_buyers"),
        approx_count_distinct($"o_custkey", 0.01).as("acd"),
        hll_sketch_estimate(hll_sketch_agg($"o_custkey", lit(14))).as("hll"))
      .select($"c_mktsegment", $"exact_buyers",
        (abs($"acd" - $"exact_buyers") <= $"exact_buyers" * 0.05)
          .as("acd_within_5pct"),
        (abs($"hll" - $"exact_buyers") <= $"exact_buyers" * 0.05)
          .as("hll_within_5pct"))
      .orderBy($"c_mktsegment")
  }

  /** Rank-error COMPANION ORACLE for q105's Greenwald-Khanna
    * `approx_percentile` (accuracy 10⁴ ⇒ rank error ≤ n/10⁴). The returned
    * value v is a real element whose rank interval is
    * [count(< v) + 1, count(≤ v)]; GK guarantees that interval intersects
    * [q·n − n/10⁴, q·n + n/10⁴]. The check states that with 50× slack
    * (n/200 + 1, absorbing value ties): count(< v) must not exceed the
    * upper band and count(≤ v) must reach the lower band. DuckDB states the
    * group domain, exact row counts, and the required TRUEs. Two passes:
    * the sketch aggregation, then one broadcast-join re-scan to rank the
    * three returned values per group — the same audit shape as q146. */
  def q147PercentileRankBound(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir).select($"l_returnflag", $"l_extendedprice")
    val pct = li
      .groupBy($"l_returnflag")
      .agg(approx_percentile($"l_extendedprice",
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("ps"))
      .select($"l_returnflag",
        element_at($"ps", 1).as("p50"),
        element_at($"ps", 2).as("p95"),
        element_at($"ps", 3).as("p99"))
    def rankCounts(tag: String, p: Column): Seq[Column] = Seq(
      sum(when($"l_extendedprice" < p, 1L).otherwise(0L)).as(s"lt_$tag"),
      sum(when($"l_extendedprice" <= p, 1L).otherwise(0L)).as(s"le_$tag"))
    def ok(q: Double, tag: String): Column = {
      val slack = $"n" / 200.0 + 1.0
      (col(s"lt_$tag") <= $"n" * q + slack) &&
        (col(s"le_$tag") >= $"n" * q - slack)
    }
    val counted = li.join(broadcast(pct), Seq("l_returnflag"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        (rankCounts("p50", $"p50") ++ rankCounts("p95", $"p95") ++
          rankCounts("p99", $"p99")): _*)
    counted
      .select($"l_returnflag", $"n",
        ok(0.5, "p50").as("p50_ok"), ok(0.95, "p95").as("p95_ok"),
        ok(0.99, "p99").as("p99_ok"))
      .orderBy($"l_returnflag")
  }

  /** Event-time tumbling window (batch form): hourly per-type counts/sums.
    * The same aggregation runs as a Structured Streaming query in
    * q23 (streaming/EventsStream) with identical results. */
  def q22EventsHourly(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .select($"w.start".as("bucket_start"), $"event_type", $"n_events", $"sum_value")
      .orderBy($"bucket_start", $"event_type")
  }

  /** Sessionization (batch): 30-minute-gap sessions per user via
    * session_window; output keyed by session start epoch-second.
    *
    * Boundary semantics (SessionBoundarySpec pins this with a fixture): Spark
    * merges an event into the previous session when delta ≤ gap — touching
    * sessions merge — which is exactly the oracle's rule (break only when the
    * gap is STRICTLY greater than 30 minutes), so the plain 30-minute gap is
    * correct as-is. (A +1 µs nudge was once proposed on the assumption of
    * half-open `delta < gap` semantics; measured behavior is the closed
    * boundary, and the nudge would have flipped the 30 m + 1 µs case the
    * wrong way.) */
  def q24Sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .select($"user_id", unix_timestamp($"w.start").as("session_start_s"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start_s")
  }
}
