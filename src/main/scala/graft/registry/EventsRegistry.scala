package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Events slice of the driver registry (event-stream analytics: sessions, funnels, attribution, experiment readouts) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object EventsRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_events_hourly" -> (Analytics.q22EventsHourly _),
    "q24_sessions" -> (Analytics.q24Sessions _),
    "q60_funnel" -> (EventAnalytics.q60Funnel _),
    "q61_retention" -> (EventAnalytics.q61Retention _),
    "q73_rolling_interval" -> (Extra.q73RollingInterval _),
    "q78_daily_ohlc" -> (Extra.q78DailyOhlc _),
    "q160_lateness_audit" -> (EventAnalytics.q160LatenessAudit _),
    "q188_daily_anomaly" -> (EventAnalytics.q188DailyAnomaly _),
    "q191_decayed_activity" -> (EventAnalytics.q191DecayedActivity _),
    "q192_attribution" -> (EventAnalytics.q192Attribution _),
    "q193_benford_audit" -> (EventAnalytics.q193BenfordAudit _),
    "q194_ks_drift" ->
      ((s: SparkSession, d: String) => ext.Quality.q194KsDrift(s, d)),
    "q195_cuped_readout" -> (EventAnalytics.q195CupedReadout _),
    "q196_score_calibration" ->
      ((s: SparkSession, d: String) => ext.Quality.q196ScoreCalibration(s, d)),
    "q119_markov_transitions" -> (EventAnalytics.q119MarkovTransitions _),
    "q123_attribution" -> (EventAnalytics.q123Attribution _),
    "q128_activity_islands" -> (EventAnalytics.q128ActivityIslands _),
    "q129_twap" -> (EventAnalytics.q129Twap _),
    "q130_cumulative_users" -> (EventAnalytics.q130CumulativeUsers _),
    "q133_ab_experiment" -> (EventAnalytics.q133AbExperiment _),
    "q135_rolling_wau" -> (EventAnalytics.q135RollingWau _),
    // Sliding sketch window — no SQL oracle (engine-specific sketch, like
    // q21/q118); QualitySpec bounds per-day error vs the exact q135.
    "q138_rolling_wau_sketch" -> (EventAnalytics.q138RollingWauSketch _),
  )

  val oracleSql: Map[String, String] = Map(
    "q60_funnel" ->
      """WITH o AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS ns,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ns
        |  FROM events
        |), g AS (
        |  SELECT user_id, event_type, ns,
        |    CASE WHEN prev_ns IS NULL OR ns - prev_ns > 1800000000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM o
        |), s AS (
        |  SELECT user_id, event_type, ns,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ns
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g
        |), ps AS (
        |  SELECT user_id, sid,
        |    min(CASE WHEN event_type = 'view' THEN ns END) AS v_ns,
        |    min(CASE WHEN event_type = 'click' THEN ns END) AS c_ns,
        |    min(CASE WHEN event_type = 'purchase' THEN ns END) AS p_ns
        |  FROM s GROUP BY user_id, sid
        |)
        |SELECT count(*) AS n_sessions,
        |  count(v_ns) AS n_with_view,
        |  CAST(sum(CASE WHEN c_ns > v_ns THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_view_then_click,
        |  CAST(sum(CASE WHEN c_ns > v_ns AND p_ns > c_ns THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_full_funnel
        |FROM ps""".stripMargin,
    "q61_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
        |), cohorts AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |)
        |SELECT cohort_week,
        |  count(DISTINCT ev.user_id) AS cohort_size,
        |  count(DISTINCT CASE WHEN week = cohort_week + INTERVAL 7 DAY
        |    THEN ev.user_id END) AS retained_w1,
        |  count(DISTINCT CASE WHEN week = cohort_week + INTERVAL 14 DAY
        |    THEN ev.user_id END) AS retained_w2
        |FROM ev JOIN cohorts ON ev.user_id = cohorts.user_id
        |GROUP BY cohort_week
        |ORDER BY cohort_week""".stripMargin,
    "q22_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q24_sessions" -> SharedOracleSql.sessionsOracleSql,
    "q160_lateness_audit" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) + CAST(
        |      CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
        |        AS UBIGINT) % 3600000000 AS BIGINT) AS arrival_us
        |  FROM events
        |), h AS (
        |  SELECT event_type, ts_us,
        |    max(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY arrival_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw_us
        |  FROM e
        |), l AS (
        |  SELECT event_type, CASE WHEN hw_us IS NULL OR hw_us <= ts_us
        |    THEN 0 ELSE hw_us - ts_us END AS late_us
        |  FROM h
        |)
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 15*60*1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_late_15m,
        |  CAST(sum(CASE WHEN late_us > 30*60*1000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_late_30m,
        |  CAST(max(late_us) // 1000000 AS BIGINT) AS max_late_s
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q196: calibration — global rank of the fixed-point score, exact
    // integer rank sums per source, one final division chain.
    "q196_score_calibration" ->
      """WITH scored AS (
        |  SELECT source, doc_id,
        |    CAST(round(CAST(len(array_to_string(tk, '')) AS DOUBLE)
        |      / len(tk) * 1000000) AS BIGINT) AS score
        |  FROM (SELECT source, doc_id, list_filter(regexp_split_to_array(
        |    lower(text), '[^a-z]+'), x -> x <> '') AS tk FROM documents)
        |  WHERE len(tk) > 0
        |), ranked AS (
        |  SELECT source,
        |    row_number() OVER (ORDER BY score, doc_id) AS rk,
        |    count(*) OVER () AS nt
        |  FROM scored
        |)
        |SELECT source, count(*) AS n_docs,
        |  round((CAST(sum(rk) AS DOUBLE) / count(*) - 1) / (max(nt) - 1), 6)
        |    AS mean_pctile
        |FROM ranked GROUP BY source ORDER BY source""".stripMargin,
    // q195: CUPED readout — exact integer-cents sums; theta via the q175
    // regression device; shape-mirrored adjusted means.
    "q195_cuped_readout" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), cut AS (
        |  SELECT max(day) AS max_day FROM ev
        |), pu AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN date_diff('day', day, max_day) < 15
        |      THEN cents ELSE 0 END) AS BIGINT) AS y,
        |    CAST(sum(CASE WHEN date_diff('day', day, max_day) >= 15
        |      THEN cents ELSE 0 END) AS BIGINT) AS x
        |  FROM ev, cut GROUP BY user_id
        |), st AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pu
        |), v AS (
        |  SELECT CAST(user_id % 2 AS INTEGER) AS variant,
        |    count(*) AS n_users, CAST(sum(y) AS BIGINT) AS vy,
        |    CAST(sum(x) AS BIGINT) AS vx
        |  FROM pu GROUP BY variant
        |)
        |SELECT variant, n_users,
        |  round(CAST(vy AS DOUBLE) / n_users / 100, 6) AS mean_post,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (n * sxx - sx * sx), 6) AS theta,
        |  round((CAST(vy AS DOUBLE) / n_users
        |    - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx))
        |      * (CAST(vx AS DOUBLE) / n_users
        |        - CAST(sx AS DOUBLE) / n)) / 100, 6) AS mean_adjusted
        |FROM v, st ORDER BY variant""".stripMargin,
    // q194: KS drift — integer cross-product argmax, one final division.
    "q194_ks_drift" ->
      """WITH lens AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS len
        |  FROM documents
        |), bsl AS (
        |  SELECT source, len, count(*) AS c1 FROM lens GROUP BY source, len
        |), bl AS (
        |  SELECT len, count(*) AS cg FROM lens GROUP BY len
        |), tot AS (
        |  SELECT s.source, s.n1, t.nt - s.n1 AS n2
        |  FROM (SELECT source, count(*) AS n1 FROM lens GROUP BY source) s,
        |    (SELECT count(*) AS nt FROM lens) t
        |), grid AS (
        |  SELECT tot.source, tot.n1, tot.n2, bl.len,
        |    coalesce(bsl.c1, 0) AS c1, bl.cg - coalesce(bsl.c1, 0) AS c2
        |  FROM tot CROSS JOIN bl
        |  LEFT JOIN bsl ON bsl.source = tot.source AND bsl.len = bl.len
        |), cum AS (
        |  SELECT source, n1, n2,
        |    abs(sum(c1) OVER w * n2 - sum(c2) OVER w * n1) AS dnum
        |  FROM grid
        |  WINDOW w AS (PARTITION BY source ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT source, CAST(max(n1) AS BIGINT) AS n_docs,
        |  CAST(max(dnum) AS BIGINT) AS d_num,
        |  round(CAST(max(dnum) AS DOUBLE) / (max(n1) * max(n2)), 6) AS ks_d
        |FROM cum GROUP BY source ORDER BY source""".stripMargin,
    // q193: Benford audit — exact integer-cents digit ladder (no log10),
    // literal Benford shares, shape-mirrored chi-squared terms.
    "q193_benford_audit" ->
      """WITH benford_raw(digit, share_lit) AS (
        |  VALUES (1, 0.3010299956639812),
        |    (2, 0.17609125905568124),
        |    (3, 0.12493873660829992),
        |    (4, 0.09691001300805642),
        |    (5, 0.07918124604762482),
        |    (6, 0.06694678963061322),
        |    (7, 0.05799194697768673),
        |    (8, 0.05115252244738129),
        |    (9, 0.04575749056067514)
        |), benford AS (
        |  SELECT digit, CAST(share_lit AS DOUBLE) AS benford_share
        |  FROM benford_raw
        |), cents AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS n FROM events
        |  WHERE value > 0
        |), dg AS (
        |  SELECT CASE
        |    WHEN n >= 100000000 THEN n // 100000000
        |    WHEN n >= 10000000 THEN n // 10000000
        |    WHEN n >= 1000000 THEN n // 1000000
        |    WHEN n >= 100000 THEN n // 100000
        |    WHEN n >= 10000 THEN n // 10000
        |    WHEN n >= 1000 THEN n // 1000
        |    WHEN n >= 100 THEN n // 100
        |    WHEN n >= 10 THEN n // 10
        |    ELSE n END AS digit
        |  FROM cents WHERE n > 0
        |), obs AS (
        |  SELECT CAST(digit AS INTEGER) AS digit, count(*) AS observed
        |  FROM dg GROUP BY digit
        |), tot AS (
        |  SELECT CAST(sum(observed) AS BIGINT) AS n_values FROM obs
        |)
        |SELECT b.digit, coalesce(o.observed, 0) AS observed,
        |  b.benford_share,
        |  round(CAST(coalesce(o.observed, 0) AS DOUBLE) / t.n_values, 6)
        |    AS observed_share,
        |  round((coalesce(o.observed, 0) - t.n_values * b.benford_share)
        |    * (coalesce(o.observed, 0) - t.n_values * b.benford_share)
        |    / (t.n_values * b.benford_share), 6) AS chi2_term
        |FROM benford b LEFT JOIN obs o ON o.digit = b.digit, tot t
        |ORDER BY b.digit""".stripMargin,
    // q192: first/last-touch attribution — user-keyed lookback join,
    // per-purchase windows with event_id tiebreaks.
    "q192_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
        |  WHERE event_type = 'purchase'
        |), e AS (
        |  SELECT user_id, event_id AS e_id, event_type AS touch,
        |    ts AS e_ts
        |  FROM events WHERE event_type != 'purchase'
        |), j AS (
        |  SELECT p.p_id, e.touch, e.e_ts, e.e_id
        |  FROM e JOIN p USING (user_id)
        |  WHERE e.e_ts < p.p_ts AND e.e_ts >= p.p_ts - INTERVAL 7 DAY
        |), l AS (
        |  SELECT 'last_touch' AS model, touch FROM (
        |    SELECT *, row_number() OVER (PARTITION BY p_id
        |      ORDER BY e_ts DESC, e_id DESC) AS rk FROM j) WHERE rk = 1
        |), f AS (
        |  SELECT 'first_touch' AS model, touch FROM (
        |    SELECT *, row_number() OVER (PARTITION BY p_id
        |      ORDER BY e_ts ASC, e_id ASC) AS rk FROM j) WHERE rk = 1
        |)
        |SELECT model, touch, count(*) AS n_purchases
        |FROM (SELECT * FROM l UNION ALL SELECT * FROM f)
        |GROUP BY model, touch ORDER BY model, touch""".stripMargin,
    // q191: weekly-halving decay — dyadic 2^-w weights are exact doubles,
    // so the sums are order-independent without fixed point.
    "q191_decayed_activity" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events
        |), md AS (
        |  SELECT max(day) AS max_day FROM ev
        |), b AS (
        |  SELECT event_type,
        |    CAST(floor(date_diff('day', day, max_day) / 7) AS INTEGER) AS w,
        |    count(*) AS c
        |  FROM ev, md GROUP BY event_type, w
        |), a AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |    sum(c * pow(0.5, w)) AS decayed
        |  FROM b GROUP BY event_type
        |), t AS (
        |  SELECT CAST(sum(n_events) AS BIGINT) AS tn, sum(decayed) AS td
        |  FROM a
        |)
        |SELECT event_type, n_events, round(decayed, 6) AS decayed_mass,
        |  round(CAST(n_events AS DOUBLE) / tn, 6) AS raw_share,
        |  round(decayed / td, 6) AS decayed_share
        |FROM a, t ORDER BY event_type""".stripMargin,
    // q188: daily anomaly z-scores — exact trailing integer sums, one
    // shape-mirrored double chain; NULL z on zero variance.
    "q188_daily_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY event_type, day
        |), t AS (
        |  SELECT event_type, day, n_events,
        |    count(*) OVER w AS hist,
        |    sum(n_events) OVER w AS sx,
        |    sum(n_events * n_events) OVER w AS sxx
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, day, n_events,
        |  CASE WHEN 7 * sxx - sx * sx = 0 THEN NULL
        |    ELSE round(CAST(7 * n_events - sx AS DOUBLE) / 7
        |      / sqrt(CAST(7 * sxx - sx * sx AS DOUBLE) / 42), 6) END AS z,
        |  coalesce(abs(CASE WHEN 7 * sxx - sx * sx = 0 THEN NULL
        |    ELSE round(CAST(7 * n_events - sx AS DOUBLE) / 7
        |      / sqrt(CAST(7 * sxx - sx * sx AS DOUBLE) / 42), 6) END) >= 2,
        |    FALSE) AS flagged
        |FROM t WHERE hist = 7
        |ORDER BY event_type, day""".stripMargin,
    "q73_rolling_interval" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(o_totalprice) OVER w, 2) AS rolling_30d_total,
        |  count(*) OVER w AS n_orders_30d
        |FROM (
        |  SELECT *, date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |    AS day_idx
        |  FROM orders WHERE o_custkey <= 200
        |)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_idx
        |  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q78_daily_ohlc" ->
      """WITH b AS (
        |  SELECT date_trunc('day', ts) AS day, epoch_us(ts) AS ts_us,
        |    event_id, value
        |  FROM events
        |), r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY day ORDER BY ts_us, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY day ORDER BY ts_us DESC, event_id DESC)
        |      AS rn_d
        |  FROM b
        |)
        |SELECT day, count(*) AS n_events, min(value) AS low, max(value) AS high,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close
        |FROM r GROUP BY day ORDER BY day""".stripMargin,
    "q119_markov_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next
        |  FROM events
        |)
        |SELECT event_type, next, count(*) AS n,
        |  round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY event_type)
        |                        AS DOUBLE), 6) AS p
        |FROM s WHERE next IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q123_attribution" ->
      """WITH s AS (
        |  SELECT event_type,
        |    first_value(CASE WHEN event_type IN ('view', 'click')
        |                     THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |                    THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events
        |)
        |SELECT coalesce(first_touch, 'none') AS first_touch,
        |       coalesce(last_touch, 'none') AS last_touch,
        |       count(*) AS n_purchases
        |FROM s WHERE event_type = 'purchase'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q128_activity_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), anchored AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |          AS INTEGER) AS anchor
        |  FROM days
        |), islands AS (
        |  SELECT user_id, anchor, count(*) AS len
        |  FROM anchored GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |  count(*) AS n_islands, max(len) AS longest_streak
        |FROM islands GROUP BY 1 ORDER BY 1""".stripMargin,
    "q129_twap" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), led AS (
        |  SELECT user_id, cents, us,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS next_us
        |  FROM e
        |), d AS (
        |  SELECT user_id, cents, (next_us - us) // 1000 AS dur_ms
        |  FROM led WHERE next_us IS NOT NULL
        |)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(dur_ms) AS BIGINT) AS span_ms,
        |  round(CAST(sum(cents * dur_ms) AS BIGINT)
        |        / (CAST(sum(dur_ms) AS BIGINT) * 100.0), 6) AS twap
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q130_cumulative_users" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |), active AS (
        |  SELECT day, count(*) AS active_users
        |  FROM (SELECT DISTINCT user_id, day FROM ev) GROUP BY 1
        |), firsts AS (
        |  SELECT user_id, min(day) AS day FROM ev GROUP BY 1
        |), news AS (
        |  SELECT day, count(*) AS new_users FROM firsts GROUP BY 1
        |)
        |SELECT active.day, active_users,
        |  COALESCE(new_users, 0) AS new_users,
        |  CAST(sum(COALESCE(new_users, 0)) OVER (ORDER BY active.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM active LEFT JOIN news ON active.day = news.day
        |ORDER BY active.day""".stripMargin,
    "q133_ab_experiment" ->
      """WITH pu AS (
        |  SELECT user_id, count(*) AS n_events,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1
        |), v AS (
        |  SELECT *, CASE WHEN (ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) * 31
        |    + ascii(substr(md5(CAST(user_id AS VARCHAR)), 2, 1))) % 2 = 0
        |    THEN 'control' ELSE 'treatment' END AS variant
        |  FROM pu
        |), arms AS (
        |  SELECT variant, count(*) AS n_users,
        |    round(avg(cents / 100.0), 6) AS mean_value,
        |    round(var_samp(cents / 100.0), 6) AS var_value
        |  FROM v GROUP BY 1
        |), p AS (
        |  -- conditional pivot, mirroring the Spark side: one row even when
        |  -- an arm is empty (nulls), never zero rows from an empty cross
        |  SELECT
        |    max(CASE WHEN variant = 'control' THEN n_users END) AS n_c,
        |    max(CASE WHEN variant = 'treatment' THEN n_users END) AS n_t,
        |    max(CASE WHEN variant = 'control' THEN mean_value END) AS m_c,
        |    max(CASE WHEN variant = 'treatment' THEN mean_value END) AS m_t,
        |    max(CASE WHEN variant = 'control' THEN var_value END) AS v_c,
        |    max(CASE WHEN variant = 'treatment' THEN var_value END) AS v_t
        |  FROM arms
        |)
        |SELECT n_c, n_t, round(m_t - m_c, 6) AS lift,
        |  round((m_t - m_c) / sqrt(v_t / n_t + v_c / n_c), 6) AS welch_t
        |FROM p""".stripMargin,
    "q135_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), grid AS (
        |  SELECT DISTINCT day AS grid_day FROM ud
        |), x AS (
        |  SELECT ud.user_id, g.grid_day
        |  FROM ud JOIN grid g
        |    ON ud.day BETWEEN g.grid_day - 6 AND g.grid_day
        |)
        |SELECT grid_day, count(DISTINCT user_id) AS wau,
        |  count(*) AS active_user_days
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
