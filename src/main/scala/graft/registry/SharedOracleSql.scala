package graft

/** Oracle SQL shared across registry families (one semantics, one
  * oracle): q18/q84 range join, q24/q82 sessions, q34/q143 MinHash
  * window scan, q166/q176 k-means. */
object SharedOracleSql {

  /** Shared by q18 (broadcast non-equi form) and q84 (bucketized cell
    * equi-join form): identical semantics, one oracle. */
  val rangeJoinOracleSql: String =
    """SELECT p_partkey, p_size, band
      |FROM part
      |JOIN (VALUES (0, 10, 'S'), (10, 25, 'M'), (25, 40, 'L'), (40, 100, 'XL'))
      |  AS bands(lo, hi, band)
      |  ON p_size >= lo AND p_size < hi
      |ORDER BY p_partkey""".stripMargin

  /** Shared by q24 (batch) and q82 (streaming): identical session
    * semantics, one oracle. */
  val sessionsOracleSql: String =
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
        |ORDER BY user_id, session_start_s""".stripMargin

  /** Shared oracle for q34 and its materialized-signature-table twin q143
    * (the storage layout must be invisible in the result): quadratic
    * string-shingle scan over the bounded window (+ planted near-copies)
    * with the exact q121 tokenization. */
  val q34OracleRef: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 400
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' xtra' FROM documents WHERE doc_id < 20
      |), tk AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(text, '[\x00-\x20]+'), x -> x <> '') AS toks
      |  FROM corpus
      |), s AS (
      |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS sh
      |  FROM tk WHERE len(toks) > 0
      |), sz AS (
      |  SELECT doc_id, sh, len(sh) AS n FROM s WHERE len(sh) > 0
      |), p AS (
      |  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
      |    len(list_intersect(a.sh, b.sh)) AS i, a.n AS na, b.n AS nb
      |  FROM sz a JOIN sz b ON a.doc_id < b.doc_id
      |)
      |SELECT left_id, right_id,
      |  round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
      |FROM p
      |WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.5
      |ORDER BY left_id, right_id""".stripMargin

  /** q166's oracle, shared verbatim by q176 — the streaming monitor's
    * summed micro-batch deltas equal the batch report exactly. */
  val KmeansOracleSql: String =
    """WITH p AS (
        |  SELECT vec_id, g.i AS d,
        |    CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
        |), init AS (
        |  SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4
        |), c0 AS (
        |  SELECT CAST(dense_rank() OVER (ORDER BY p.vec_id) - 1 AS INTEGER)
        |    AS cl, p.d, p.v
        |  FROM p JOIN init USING (vec_id)
        |), d1 AS (
        |  SELECT p.vec_id, c.cl, sum((p.v - c.v) * (p.v - c.v)) AS dist
        |  FROM p JOIN c0 c USING (d) GROUP BY p.vec_id, c.cl
        |), a1 AS (
        |  SELECT vec_id, cl FROM (SELECT vec_id, cl, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk FROM d1)
        |  WHERE rk = 1
        |), n1 AS (
        |  SELECT a.cl, p.d,
        |    CAST(floor(CAST(sum(p.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
        |  FROM p JOIN a1 a USING (vec_id) GROUP BY a.cl, p.d
        |), c1 AS (
        |  SELECT c.cl, c.d, coalesce(n.v, c.v) AS v
        |  FROM c0 c LEFT JOIN n1 n ON n.cl = c.cl AND n.d = c.d
        |), d2 AS (
        |  SELECT p.vec_id, c.cl, sum((p.v - c.v) * (p.v - c.v)) AS dist
        |  FROM p JOIN c1 c USING (d) GROUP BY p.vec_id, c.cl
        |), a2 AS (
        |  SELECT vec_id, cl FROM (SELECT vec_id, cl, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk FROM d2)
        |  WHERE rk = 1
        |), n2 AS (
        |  SELECT a.cl, p.d,
        |    CAST(floor(CAST(sum(p.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
        |  FROM p JOIN a2 a USING (vec_id) GROUP BY a.cl, p.d
        |), c2 AS (
        |  SELECT c.cl, c.d, coalesce(n.v, c.v) AS v
        |  FROM c1 c LEFT JOIN n2 n ON n.cl = c.cl AND n.d = c.d
        |), d3 AS (
        |  SELECT p.vec_id, c.cl, sum((p.v - c.v) * (p.v - c.v)) AS dist
        |  FROM p JOIN c2 c USING (d) GROUP BY p.vec_id, c.cl
        |), a3 AS (
        |  SELECT vec_id, cl FROM (SELECT vec_id, cl, row_number()
        |    OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk FROM d3)
        |  WHERE rk = 1
        |), n3 AS (
        |  SELECT a.cl, p.d,
        |    CAST(floor(CAST(sum(p.v) AS DOUBLE) / count(*)) AS BIGINT) AS v
        |  FROM p JOIN a3 a USING (vec_id) GROUP BY a.cl, p.d
        |), c3 AS (
        |  SELECT c.cl, c.d, coalesce(n.v, c.v) AS v
        |  FROM c2 c LEFT JOIN n3 n ON n.cl = c.cl AND n.d = c.d
        |), d4 AS (
        |  SELECT p.vec_id, c.cl, sum((p.v - c.v) * (p.v - c.v)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY p.vec_id, c.cl
        |), a4 AS (
        |  SELECT vec_id, cl, dist FROM (SELECT vec_id, cl, dist,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
        |    FROM d4)
        |  WHERE rk = 1
        |), cs AS (
        |  SELECT cl, CAST(sum(v) AS BIGINT) AS centroid_checksum
        |  FROM c3 GROUP BY cl
        |)
        |SELECT a4.cl AS cluster, count(*) AS n_points,
        |  round(CAST(sum(a4.dist) AS DOUBLE) / 1e12, 6) AS inertia,
        |  cs.centroid_checksum
        |FROM a4 JOIN cs ON cs.cl = a4.cl
        |GROUP BY a4.cl, cs.centroid_checksum
        |ORDER BY cluster""".stripMargin

}
