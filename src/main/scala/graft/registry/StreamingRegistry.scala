package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Streaming slice of the driver registry (Structured Streaming pipelines (file streams, watermarks, foreachBatch)) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object StreamingRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_streaming_hourly" -> (EventsStream.q23StreamingHourly _),
    "q82_streaming_sessions" -> (EventsStream.q82StreamingSessions _),
    "q157_streaming_dedup" -> (streaming.EventsStream.q157StreamingDedup _),
    "q162_streaming_mv" -> (streaming.EventsStream.q162StreamingMv _),
    "q176_streaming_kmeans" ->
      (streaming.KmeansMonitor.q176StreamingKmeans(_, _)),
    "q153_streaming_neardup_ingest" ->
      (streaming.NearDupIngest.q153StreamingNearDupIngest _),
    "q201_learning_ingest" ->
      (streaming.NearDupIngest.q201LearningIngest _),
    "q134_streaming_left_join" -> (EventsStream.q134StreamingLeftJoin _),
  )

  val oracleSql: Map[String, String] = Map(
    "q176_streaming_kmeans" -> SharedOracleSql.KmeansOracleSql,
    "q23_streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    // q157: the deduplicated stream IS the events table (fixture ids are
    // unique; the staged duplicates are re-deliveries of existing rows), so
    // the oracle is the plain per-type rollup.
    "q157_streaming_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // q162: the maintained MV must equal the batch rollup over unique
    // events (the landing dir's duplicates are re-deliveries the dedup
    // stage absorbs).
    "q162_streaming_mv" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    // q153: the q150 ingest replayed through a file stream + foreachBatch.
    // Each batch row is compared against history only, so the union of
    // per-micro-batch results equals the one-shot batch result — the
    // oracle is q150's, verbatim.
    "q153_streaming_neardup_ingest" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' xtra' FROM documents WHERE doc_id < 20
        |), batch AS (
        |  SELECT doc_id + 3000000 AS doc_id, text || ' fresh' AS text
        |  FROM documents WHERE doc_id < 15
        |  UNION ALL
        |  SELECT doc_id + 3000000, reverse(text)
        |  FROM documents WHERE doc_id >= 15 AND doc_id < 25
        |), tkc AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '[\x00-\x20]+'), x -> x <> '') AS toks
        |  FROM corpus
        |), tkb AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '[\x00-\x20]+'), x -> x <> '') AS toks
        |  FROM batch
        |), sc AS (
        |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh
        |  FROM tkc WHERE len(toks) > 0
        |), sb AS (
        |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh
        |  FROM tkb WHERE len(toks) > 0
        |), p AS (
        |  SELECT b.doc_id AS batch_id, c.doc_id AS history_id,
        |    len(list_intersect(b.sh, c.sh)) AS i, len(b.sh) AS nb, len(c.sh) AS nc
        |  FROM sb b JOIN sc c ON true
        |  WHERE len(c.sh) > 0 AND len(b.sh) > 0
        |)
        |SELECT batch_id, history_id,
        |  round(CAST(i AS DOUBLE) / (nb + nc - i), 6) AS jaccard
        |FROM p
        |WHERE round(CAST(i AS DOUBLE) / (nb + nc - i), 6) >= 0.5
        |ORDER BY batch_id, history_id""".stripMargin,
    // q201: the LEARNING ingest — micro-batch 0 probes the corpus only;
    // micro-batch 1 probes corpus ∪ batch 0 (the accepted signature
    // delta). The fixture's planted pair (5000001 vs 5000000, both
    // reversed-doc-30 derivatives that share no shingles with anything
    // natural) exists ONLY across the two batches, so its report row is
    // the oracle's proof that the ingest learned batch 0. Same shingle /
    // jaccard ≥ 0.5 machinery as q153's oracle, with history widened per
    // micro-batch.
    "q201_learning_ingest" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' xtra' FROM documents WHERE doc_id < 20
        |), b0 AS (
        |  SELECT doc_id + 3000000 AS doc_id, text || ' fresh' AS text
        |  FROM documents WHERE doc_id < 15 AND doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, reverse(text)
        |  FROM documents WHERE doc_id >= 15 AND doc_id < 25 AND doc_id % 2 = 0
        |  UNION ALL
        |  SELECT 5000000, reverse(text) FROM documents WHERE doc_id = 30
        |), b1 AS (
        |  SELECT doc_id + 3000000 AS doc_id, text || ' fresh' AS text
        |  FROM documents WHERE doc_id < 15 AND doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 3000000, reverse(text)
        |  FROM documents WHERE doc_id >= 15 AND doc_id < 25 AND doc_id % 2 = 1
        |  UNION ALL
        |  SELECT 5000001, reverse(text) || ' fresh' FROM documents WHERE doc_id = 30
        |), probes AS (
        |  SELECT 0 AS micro_batch, doc_id, text FROM b0
        |  UNION ALL
        |  SELECT 1, doc_id, text FROM b1
        |), hist AS (
        |  SELECT 0 AS micro_batch, doc_id, text FROM corpus
        |  UNION ALL
        |  SELECT 1, doc_id, text FROM corpus
        |  UNION ALL
        |  SELECT 1, doc_id, text FROM b0
        |), tkp AS (
        |  SELECT micro_batch, doc_id,
        |    list_filter(string_split_regex(text, '[\x00-\x20]+'), x -> x <> '') AS toks
        |  FROM probes
        |), tkh AS (
        |  SELECT micro_batch, doc_id,
        |    list_filter(string_split_regex(text, '[\x00-\x20]+'), x -> x <> '') AS toks
        |  FROM hist
        |), sp AS (
        |  SELECT micro_batch, doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh
        |  FROM tkp WHERE len(toks) > 0
        |), sv AS (
        |  SELECT micro_batch, doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh
        |  FROM tkh WHERE len(toks) > 0
        |), p AS (
        |  SELECT b.micro_batch, b.doc_id AS batch_id, h.doc_id AS history_id,
        |    len(list_intersect(b.sh, h.sh)) AS i, len(b.sh) AS nb, len(h.sh) AS nc
        |  FROM sp b JOIN sv h ON b.micro_batch = h.micro_batch
        |  WHERE len(h.sh) > 0 AND len(b.sh) > 0
        |)
        |SELECT micro_batch, batch_id, history_id,
        |  round(CAST(i AS DOUBLE) / (nb + nc - i), 6) AS jaccard
        |FROM p
        |WHERE round(CAST(i AS DOUBLE) / (nb + nc - i), 6) >= 0.5
        |ORDER BY micro_batch, batch_id, history_id""".stripMargin,
    "q82_streaming_sessions" -> SharedOracleSql.sessionsOracleSql,
    // The batch LEFT JOIN the streaming query must reproduce exactly once
    // the watermark closes each click's 30-minute conversion window.
    "q134_streaming_left_join" ->
      """WITH c AS (
        |  SELECT user_id, ts AS click_ts FROM events
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts AS p_ts FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, epoch_us(click_ts) AS click_us,
        |  COALESCE(epoch_us(p_ts), -1) AS purchase_us
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.p_ts >= c.click_ts
        |  AND p.p_ts <= c.click_ts + INTERVAL 30 MINUTE
        |ORDER BY 1, 2, 3""".stripMargin,
  )
}
