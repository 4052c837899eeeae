package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Parity slice of the driver registry (reference-ETL parity, file-format round-trips, upsert/CDC sinks) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object ParityRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Flagship.q01PricingSummary _),
    "q02_project_filter" -> (Parity.q02ProjectFilter _),
    "q03_null_drop" -> (Parity.q03NullDrop _),
    "q04_case_when_enrich" -> (Parity.q04CaseWhenEnrich _),
    "q05_rename_shape" -> (Parity.q05RenameShape _),
    "q06_dim_decode" -> (Parity.q06DimDecode _),
    "q07_upsert" -> (Parity.q07Upsert _),
    "q08_csv_roundtrip" -> (Parity.q08CsvRoundtrip _),
    "q09_upsert_versioned" -> (Parity.q09UpsertVersioned _),
    "q28_partitioned_sink" -> (Advanced.q28PartitionedSink _),
    "q87_json_roundtrip" -> (Parity.q87JsonRoundtrip _),
    "q88_orc_roundtrip" -> (Parity.q88OrcRoundtrip _),
    "q91_xml_roundtrip" -> (Parity.q91XmlRoundtrip _),
    "q100_cdc_apply" -> (Extra.q100CdcApply _),
    "q159_schema_evolution" -> (Extra.q159SchemaEvolution _),
    "q202_partitioned_upsert" -> (Parity.q202PartitionedUpsert _),
    "q203_widened_read" -> (Extra.q203WidenedRead _),
  )

  val oracleSql: Map[String, String] = Map(
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
    "q28_partitioned_sink" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // q159: the staged deliveries are pure functions of the orders table
    // (parity split; channel from custkey parity), so the oracle rebuilds
    // the merged read's semantics from `orders` directly. Each channel
    // group holds exactly one orderkey parity = one delivery.
    "q159_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1
        |    THEN (CASE WHEN o_custkey % 2 = 0 THEN 'web' ELSE 'store' END)
        |    ELSE 'unknown' END AS channel,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_orderkey % 2) AS n_deliveries,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY channel ORDER BY channel""".stripMargin,
    // q203: the staged deliveries are pure functions of the orders table
    // (parity split; delivery-0 qty = key%1000 as INT, delivery-1 qty =
    // 3e9 + key%1000 as BIGINT), so the oracle rebuilds the widened read
    // from `orders` directly. A lost upcast on the old int32 files would
    // corrupt delivery 0's sum/min/max.
    "q203_widened_read" ->
      """SELECT CAST(o_orderkey % 2 AS INTEGER) AS delivery,
        |  count(*) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 1000
        |    ELSE 3000000000 + o_orderkey % 1000 END) AS BIGINT) AS sum_qty,
        |  CAST(min(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 1000
        |    ELSE 3000000000 + o_orderkey % 1000 END) AS BIGINT) AS min_qty,
        |  CAST(max(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey % 1000
        |    ELSE 3000000000 + o_orderkey % 1000 END) AS BIGINT) AS max_qty
        |FROM orders GROUP BY delivery ORDER BY delivery""".stripMargin,
    "q87_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q88_orc_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
    "q91_xml_roundtrip" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin,
    // q100: the oracle states applyCdc's semantic directly — per key the
    // highest-sequence op wins and deletes erase the key.
    "q100_cdc_apply" ->
      """WITH log AS (
        |  SELECT l_orderkey AS key, l_extendedprice AS val,
        |    row_number() OVER (PARTITION BY l_orderkey ORDER BY
        |      l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity)
        |      AS seq
        |  FROM lineitem
        |), ops AS (
        |  SELECT key, val, seq,
        |    CASE seq % 3 WHEN 0 THEN 'D' WHEN 1 THEN 'U' ELSE 'I' END AS op
        |  FROM log
        |), latest AS (
        |  SELECT key, val, op,
        |    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |  FROM ops
        |)
        |SELECT key, val FROM latest WHERE rn = 1 AND op <> 'D'
        |ORDER BY key""".stripMargin,
    // q202: q07's LWW merge semantic with a bounded update-key set
    // (orderkey <= 8: 9 keys — the fixture's keys are dense), routed
    // through the bucket-partitioned target.
    "q202_partitioned_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |), u AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice,
        |         o_orderstatus
        |  FROM t WHERE o_orderkey <= 8
        |)
        |SELECT * FROM t WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
        |UNION ALL
        |SELECT * FROM u
        |ORDER BY o_orderkey""".stripMargin,
  )
}
