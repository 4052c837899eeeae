package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Similarity slice of the driver registry (embeddings: ANN/k-means/similarity search and multimodal codecs) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object SimilarityRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_embedding_stats" -> (Advanced.q43EmbeddingStats _),
    "q51_media_resize" -> (Multimodal.q51MediaResize _),
    "q37_topk_bruteforce" -> ((s: SparkSession, d: String) => Similarity.q37TopKBruteForce(s, d)),
    "q38_ann_lsh" -> ((s: SparkSession, d: String) => Similarity.q38AnnLsh(s, d)),
    "q39_embedding_neardup" -> (Similarity.q39EmbeddingNearDup _),
    "q42_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.q42AnnIvf(s, d)),
    "q47_topk_aggregated" -> ((s: SparkSession, d: String) => Similarity.q47TopKAggregated(s, d)),
    "q40_media_decode" -> (Multimodal.q40MediaDecode _),
    "q41_frame_sample" -> (Multimodal.q41FrameSample _),
    // Approximate (PQ/ADC) candidates — no SQL oracle, like q38/q42; PqSpec
    // asserts planted-copy recall, recall@5 vs exact, pruning, determinism.
    "q98_ann_pq" -> ((s: SparkSession, d: String) => Pq.q98AnnPq(s, d)),
    "q99_ann_ivfpq" -> ((s: SparkSession, d: String) => IvfPq.q99AnnIvfPq(s, d)),
    "q140_ppm_decode" -> (Multimodal.q140PpmDecode _),
    "q141_wav_decode" -> (Multimodal.q141WavDecode _),
    "q209_mulaw_decode" -> (Multimodal.q209MulawDecode _),
    "q206_bmp_decode" -> (Multimodal.q206BmpDecode _),
    "q207_gif_decode" -> (Multimodal.q207GifDecode _),
    "q208_png_decode" -> (Multimodal.q208PngDecode _),
    "q142_video_frames" -> (Multimodal.q142VideoFrames _),
    "q149_ann_recall_floors" -> (Similarity.q149AnnRecallFloors _),
    "q151_incremental_embedding_neardup" ->
      (Similarity.q151IncrementalEmbeddingNearDup _),
    "q152_semdedup" -> (SemDedup.q152SemDedup _),
    "q161_binaryfile_ingest" -> (Multimodal.q161BinaryFileIngest _),
    "q166_kmeans" ->
      ((s: SparkSession, d: String) => KMeans.q166KMeans(s, d)),
    "q170_hard_negatives" ->
      ((s: SparkSession, d: String) => Similarity.q170HardNegatives(s, d)),
    "q173_jl_projection" ->
      ((s: SparkSession, d: String) => Similarity.q173JlProjection(s, d)),
    "q174_ann_jl" ->
      ((s: SparkSession, d: String) => Similarity.q174AnnJl(s, d)),
    "q179_silhouette" ->
      ((s: SparkSession, d: String) => KMeans.q179Silhouette(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "q51_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
        |    CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height
        |  FROM documents WHERE doc_id % 3 = 0
        |), s AS (
        |  SELECT media_id, width, height,
        |    224.0 / greatest(width, height) AS scale
        |  FROM m
        |)
        |SELECT media_id, width, height,
        |  CAST(greatest(1, floor(width * scale)) AS INTEGER) AS new_width,
        |  CAST(greatest(1, floor(height * scale)) AS INTEGER) AS new_height,
        |  round(scale, 6) AS scale
        |FROM s ORDER BY media_id""".stripMargin,
    "q43_embedding_stats" ->
      """WITH n AS (
        |  SELECT label,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS l2
        |  FROM embeddings
        |)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(l2), 4) AS avg_norm,
        |  round(min(l2), 4) AS min_norm,
        |  round(max(l2), 4) AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "q149_ann_recall_floors" ->
      """SELECT m.method, q.n_queries, true AS recall_ge_floor
        |FROM (SELECT 'ivf' AS method UNION ALL SELECT 'ivfpq'
        |      UNION ALL SELECT 'lsh' UNION ALL SELECT 'pq') m
        |CROSS JOIN (SELECT count(*) AS n_queries
        |            FROM embeddings WHERE vec_id < 8) q
        |ORDER BY m.method""".stripMargin,
    // q151: embedding-ingest near-dup. The batch is small, so the oracle's
    // batch x corpus quadratic cosine is cheap — NO window device needed.
    // Completeness: qualifying pairs are the exact copies at cos 1.0 (LSH
    // recall provably 1), and the measured dead zone is wide (no pair in
    // [0.8, 0.99) at either oracle SF). DOUBLE[] cast pins DuckDB to the
    // kernel's widen-then-sum, as in q39.
    "q151_incremental_embedding_neardup" ->
      """WITH batch AS (
        |  SELECT vec_id + 3000000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id < 10
        |  UNION ALL
        |  SELECT vec_id + 3000000, [-x for x in embedding]
        |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 20
        |)
        |SELECT b.vec_id AS batch_id, e.vec_id AS history_id,
        |  round(list_cosine_similarity(b.embedding::DOUBLE[],
        |    e.embedding::DOUBLE[]), 6) AS cos
        |FROM batch b JOIN embeddings e ON true
        |WHERE round(list_cosine_similarity(b.embedding::DOUBLE[],
        |    e.embedding::DOUBLE[]), 6) >= 0.99
        |ORDER BY batch_id, history_id""".stripMargin,
    // q161: the staged files follow q140's (w, h) formula and the P6 header
    // grammar is "P6\n<w> <h>\n255\n", so both the decoded means AND each
    // file's exact byte length have closed forms in doc_id.
    "q161_binaryfile_ingest" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + doc_id % 97 AS INTEGER) AS width,
        |    CAST(16 + doc_id % 83 AS INTEGER) AS height
        |  FROM documents WHERE doc_id < 64
        |)
        |SELECT media_id,
        |  CAST(9 + length(CAST(width AS VARCHAR))
        |    + length(CAST(height AS VARCHAR))
        |    + 3 * width * height AS BIGINT) AS file_len,
        |  width, height,
        |  round((width - 1) / 2.0, 6) AS mean_r,
        |  round((height - 1) / 2.0, 6) AS mean_g,
        |  round((width + height - 2) / 2.0, 6) AS mean_b
        |FROM m ORDER BY media_id""".stripMargin,
    // q166: k-means (k=4), 3 Lloyd iterations unrolled as CTE blocks.
    // Every arithmetic step mirrors the Spark side exactly: 1e-6
    // fixed-point quantization, integer squared distances, (dist, cl)
    // lexicographic tie-break, floor(sum/n) centroid updates, empty
    // clusters keeping their previous centroid via the LEFT JOIN coalesce.
    "q166_kmeans" ->
      SharedOracleSql.KmeansOracleSql,
    // q179: simplified silhouette — the shared k-means chain through
    // c3, then per-point (nearest, second-nearest) distances and the
    // fixed-pointed silhouette mean.
    "q179_silhouette" ->
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
        |), dd AS (
        |  SELECT p.vec_id, c.cl, sum((p.v - c.v) * (p.v - c.v)) AS dist
        |  FROM p JOIN c3 c USING (d) GROUP BY p.vec_id, c.cl
        |), rk AS (
        |  SELECT vec_id, cl, dist, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY dist, cl) AS r
        |  FROM dd
        |), ab AS (
        |  SELECT a.vec_id, a.cl, a.dist AS da, b.dist AS db
        |  FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND b.r = 2
        |  WHERE a.r = 1
        |), sfp AS (
        |  SELECT vec_id, cl, CAST(round(CASE WHEN greatest(da, db) = 0
        |    THEN 0 ELSE CAST(db - da AS DOUBLE) / greatest(da, db) * 1000000
        |    END) AS BIGINT) AS s
        |  FROM ab
        |)
        |SELECT cl AS cluster, count(*) AS n_points,
        |  round(sum(s) / (1000000.0 * count(*)), 6) AS mean_silhouette
        |FROM sfp GROUP BY cl ORDER BY cluster""".stripMargin,
    // q174: sketch-then-refine ANN — projected-space shortlist (integer
    // distances, (d2, id) order matching the bounded heap), then exact
    // cosine re-rank of the shortlist.
    "q174_ann_jl" ->
      """WITH p AS (
        |  SELECT vec_id, g.i AS i,
        |    CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
        |      AS v
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
        |), s AS (
        |  SELECT i.i AS i, j.j AS j,
        |    CASE WHEN substr(md5((i.i - 1) || '_' || (j.j - 1)), 1, 1)
        |      IN ('1','3','5','7','9','b','d','f') THEN -1 ELSE 1 END AS sg
        |  FROM UNNEST(generate_series(1, 64)) AS i(i),
        |    UNNEST(generate_series(1, 16)) AS j(j)
        |), proj AS (
        |  SELECT p.vec_id, s.j, sum(p.v * s.sg) AS pv
        |  FROM p JOIN s USING (i) GROUP BY p.vec_id, s.j
        |), q AS (
        |  SELECT vec_id AS query_id, j, pv FROM proj WHERE vec_id < 8
        |), pd AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |    sum((c.pv - q.pv) * (c.pv - q.pv)) AS d2
        |  FROM proj c JOIN q ON c.j = q.j AND c.vec_id != q.query_id
        |  GROUP BY q.query_id, c.vec_id
        |), sl AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY d2, neighbor_id) AS rk
        |    FROM pd)
        |  WHERE rk <= 50
        |), qe AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 8
        |), ne AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne
        |  FROM embeddings
        |), sc AS (
        |  SELECT sl.query_id, sl.neighbor_id,
        |    round(list_cosine_similarity(qe.qe, ne.ne), 6) AS cos
        |  FROM sl JOIN qe USING (query_id) JOIN ne USING (neighbor_id)
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM sc
        |)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // q173: JL projection — the 16×64 Rademacher matrix re-derives from
    // md5("i_j") parity; all distances are exact fixed-point integers.
    "q173_jl_projection" ->
      """WITH p AS (
        |  SELECT vec_id, g.i AS i,
        |    CAST(round(CAST(embedding[g.i] AS DOUBLE) * 1000000) AS BIGINT)
        |      AS v
        |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
        |  WHERE vec_id < 80
        |), s AS (
        |  SELECT i.i AS i, j.j AS j,
        |    CASE WHEN substr(md5((i.i - 1) || '_' || (j.j - 1)), 1, 1)
        |      IN ('1','3','5','7','9','b','d','f') THEN -1 ELSE 1 END AS sg
        |  FROM UNNEST(generate_series(1, 64)) AS i(i),
        |    UNNEST(generate_series(1, 16)) AS j(j)
        |), proj AS (
        |  SELECT p.vec_id, s.j, sum(p.v * s.sg) AS pv
        |  FROM p JOIN s USING (i) GROUP BY p.vec_id, s.j
        |), od AS (
        |  SELECT a.vec_id // 2 AS pair_id, a.vec_id AS vec_a,
        |    a.vec_id + 1 AS vec_b, sum((a.v - b.v) * (a.v - b.v)) AS d2
        |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1 AND a.i = b.i
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1, 2, 3
        |), pd AS (
        |  SELECT a.vec_id // 2 AS pair_id, sum((a.pv - b.pv) * (a.pv - b.pv))
        |    AS d2
        |  FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND a.j = b.j
        |  WHERE a.vec_id % 2 = 0 GROUP BY 1
        |)
        |SELECT od.pair_id, od.vec_a, od.vec_b,
        |  round(CAST(od.d2 AS DOUBLE) / 1e12, 6) AS orig_dist_sq,
        |  round(CAST(pd.d2 AS DOUBLE) / (16 * od.d2), 6) AS jl_ratio
        |FROM od JOIN pd USING (pair_id)
        |ORDER BY pair_id""".stripMargin,
    // q170: hard-negative mining — q37's exact-cosine shape with the
    // label-mismatch constraint in the pair predicate.
    "q170_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
        |    label AS qlabel
        |  FROM embeddings WHERE vec_id < 8
        |), c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne,
        |    label
        |  FROM embeddings
        |), s AS (
        |  SELECT query_id, neighbor_id, label AS neighbor_label,
        |    round(list_cosine_similarity(qe, ne), 6) AS cos
        |  FROM q, c WHERE neighbor_id != query_id AND label != qlabel
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM s
        |)
        |SELECT query_id, rank, neighbor_id, neighbor_label, cos
        |FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q152_semdedup" ->
      """SELECT vec_id + 2000000 AS dropped_id, vec_id AS kept_id,
        |  1.0 AS cos
        |FROM embeddings WHERE vec_id < 25
        |ORDER BY dropped_id""".stripMargin,
    // q39: qualifying pairs at cos >= 0.99 are exactly the planted copies
    // at every SF (max natural cosine ~0.6, checked), so the quadratic
    // cosine scan is feasible corpus-wide and LSH recall is provably 1
    // (identical vectors share every bucket). DOUBLE[] cast pins DuckDB to
    // the same widen-then-sequential-sum the Spark kernel uses.
    "q39_embedding_neardup" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10
        |)
        |SELECT a.vec_id AS left_id, b.vec_id AS right_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 6) AS cos
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
        |    b.embedding::DOUBLE[]), 6) >= 0.99
        |ORDER BY left_id, right_id""".stripMargin,
    "q37_topk_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 8
        |), c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne
        |  FROM embeddings
        |), s AS (
        |  SELECT query_id, neighbor_id,
        |    round(list_cosine_similarity(qe, ne), 6) AS cos
        |  FROM q, c WHERE neighbor_id != query_id
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM s
        |)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q47_topk_aggregated" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 8
        |), c AS (
        |  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ne
        |  FROM embeddings
        |), s AS (
        |  SELECT query_id, neighbor_id,
        |    round(list_cosine_similarity(qe, ne), 6) AS cos
        |  FROM q, c WHERE neighbor_id != query_id
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM s
        |)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q40_media_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |      ELSE 'video' END AS kind,
        |    CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        |  FROM documents
        |)
        |SELECT media_id, kind, n_bytes,
        |  CAST(n_bytes % 640 + 16 AS INTEGER) AS width,
        |  CAST(n_bytes % 480 + 16 AS INTEGER) AS height,
        |  CAST(CASE WHEN kind = 'video' THEN n_bytes % 24 + 1 ELSE 1 END AS INTEGER)
        |    AS n_frames
        |FROM m ORDER BY media_id""".stripMargin,
    "q41_frame_sample" ->
      """SELECT media_id,
        |  CAST(frame_idx // 4 AS INTEGER) AS sample_idx,
        |  CAST(frame_idx AS INTEGER) AS frame_idx
        |FROM (
        |  SELECT doc_id AS media_id,
        |    unnest(generate_series(0, octet_length(encode(text)) % 24, 4)) AS frame_idx
        |  FROM documents WHERE doc_id % 3 = 2
        |)
        |ORDER BY media_id, sample_idx""".stripMargin,
    // q140: the pixel model's closed forms (Ppm scaladoc) predict the real
    // decoder's output from arithmetic — no wrap anywhere since
    // w <= 112, h <= 98, so w+h <= 210 < 256 and every mapped resize
    // coordinate stays under 256. Values are exact halves / 32nds, so the
    // 6-decimal rounding is a no-op on both engines.
    "q140_ppm_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + doc_id % 97 AS INTEGER) AS width,
        |    CAST(16 + doc_id % 83 AS INTEGER) AS height
        |  FROM documents WHERE doc_id < 2000
        |), rz AS (
        |  SELECT media_id,
        |    avg(CAST(floor(i * width / 32.0) AS INTEGER)) AS rx,
        |    avg(CAST(floor(i * height / 32.0) AS INTEGER)) AS ry
        |  FROM m, generate_series(0, 31) AS t(i)
        |  GROUP BY media_id
        |)
        |SELECT m.media_id, width, height,
        |  round((width - 1) / 2.0, 6) AS mean_r,
        |  round((height - 1) / 2.0, 6) AS mean_g,
        |  round((width + height - 2) / 2.0, 6) AS mean_b,
        |  round(rx, 6) AS rz_mean_r,
        |  round(ry, 6) AS rz_mean_g,
        |  round(rx + ry, 6) AS rz_mean_b
        |FROM m JOIN rz USING (media_id)
        |ORDER BY media_id""".stripMargin,
    // q206: BMP closed forms (Bmp scaladoc) — means identical to q140's
    // model (no wrap: w <= 76, h <= 96, w+h <= 172); file length counts the
    // two headers plus h padded rows; top_g = (h/2 - 1)/2 (h always even by
    // construction) is the row-order witness — a decoder that skips the
    // bottom-up flip reports the BOTTOM half's mean instead.
    "q206_bmp_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + doc_id % 61 AS INTEGER) AS width,
        |    CAST(16 + 2 * (doc_id % 41) AS INTEGER) AS height
        |  FROM documents WHERE doc_id < 2000
        |)
        |SELECT media_id,
        |  CAST(54 + height * (((3 * width + 3) // 4) * 4) AS INTEGER) AS n_bytes,
        |  width, height,
        |  round((width - 1) / 2.0, 6) AS mean_r,
        |  round((height - 1) / 2.0, 6) AS mean_g,
        |  round((width + height - 2) / 2.0, 6) AS mean_b,
        |  round((height // 2 - 1) / 2.0, 6) AS top_g
        |FROM m ORDER BY media_id""".stripMargin,
    // q207: GIF87a closed forms (Gif scaladoc) — index(x,y) = x+y with no
    // wrap (max index 84 at the 46x40 grid corner; the blue entry i+170
    // wraps at 86, a margin of ONE) over palette (i, i+85, i+170), so every channel
    // mean is mean_idx = (w+h-2)/2 plus the palette offset; top_r is the
    // interlace witness (odd ids store interlaced; the logical image — and
    // so every oracle column — must not depend on that storage order).
    "q207_gif_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + doc_id % 31 AS INTEGER) AS width,
        |    CAST(16 + doc_id % 25 AS INTEGER) AS height,
        |    doc_id % 2 = 1 AS interlaced
        |  FROM documents WHERE doc_id < 2000
        |)
        |SELECT media_id, width, height, interlaced,
        |  round((width + height - 2) / 2.0, 6) AS mean_r,
        |  round((width + height - 2) / 2.0 + 85, 6) AS mean_g,
        |  round((width + height - 2) / 2.0 + 170, 6) AS mean_b,
        |  round((width - 1) / 2.0 + (height // 2 - 1) / 2.0, 6) AS top_r
        |FROM m ORDER BY media_id""".stripMargin,
    // q208: PNG closed forms (Png scaladoc) — r(x,y) = x+y, g = x, b = y,
    // none wrapping (max value 84 at the 46x40 corner), so the channel means are the ramp means
    // and top_r is the Adam7-placement witness (odd ids store interlaced;
    // the logical image — and so every oracle column — must not depend on
    // that storage order). n_bytes has no closed form (DEFLATE length is
    // content-dependent) so the byte-length check lives in PngSpec.
    "q208_png_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + doc_id % 31 AS INTEGER) AS width,
        |    CAST(16 + doc_id % 25 AS INTEGER) AS height,
        |    doc_id % 2 = 1 AS interlaced
        |  FROM documents WHERE doc_id < 2000
        |)
        |SELECT media_id, width, height, interlaced,
        |  round((width + height - 2) / 2.0, 6) AS mean_r,
        |  round((width - 1) / 2.0, 6) AS mean_g,
        |  round((height - 1) / 2.0, 6) AS mean_b,
        |  round((width - 1) / 2.0 + (height // 2 - 1) / 2.0, 6) AS top_r
        |FROM m ORDER BY media_id""".stripMargin,
    // q209: the G.711 µ-law expansion has the closed form
    // mag = (8*man + 132) * 2^exp - 132 over u = 255 - code, so the oracle
    // regenerates the SAME code stream (code_k = 7k mod 256) and evaluates
    // the expansion byte-for-byte in SQL — a wrong complement, segment
    // shift, or bias constant breaks mean/rms/peak. Integer sums divide in
    // IEEE doubles identically on both engines; peak is 32124 everywhere
    // (code 0 at k = 0 expands to -32124) but is COMPUTED, not assumed.
    "q209_mulaw_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    800 + (doc_id % 555) * 3 AS n
        |  FROM documents WHERE doc_id < 2000
        |), s AS (
        |  SELECT media_id, n, unnest(generate_series(0, n - 1)) AS k FROM m
        |), d AS (
        |  SELECT media_id, n,
        |    CASE WHEN u >= 128 THEN -mag ELSE mag END AS lin
        |  FROM (
        |    SELECT media_id, n, u,
        |      (8 * (u % 16) + 132) * (1 << ((u // 16) % 8)) - 132 AS mag
        |    FROM (SELECT media_id, n, 255 - ((7 * k) % 256) AS u FROM s)
        |  )
        |)
        |SELECT media_id, CAST(n AS INTEGER) AS n_samples,
        |  8000 AS sample_rate,
        |  round(n / 8000.0, 6) AS duration_s,
        |  round(sum(lin) / CAST(n AS DOUBLE), 6) AS mean_amp,
        |  round(sqrt(sum(lin * lin) / CAST(n AS DOUBLE)), 6) AS rms,
        |  CAST(max(abs(lin)) AS INTEGER) AS peak
        |FROM d GROUP BY media_id, n ORDER BY media_id""".stripMargin,
    // q141: sawtooth partial-cycle sums — S1 = -100 per full cycle and
    // T1(r) = r(r-1)/2 - 100r; S2 = 666700 per cycle and
    // T2(r) = r(r-1)(2r-1)/6 - 100r(r-1) + 10000r. Integer sums divide in
    // IEEE doubles identically on both engines; peak is 100 for any n >= 1
    // (sample k = 0 is always present).
    "q141_wav_decode" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    1000 + (doc_id % 777) * 3 AS n
        |  FROM documents WHERE doc_id < 2000
        |), p AS (
        |  SELECT media_id, n, n // 200 AS c, n % 200 AS r FROM m
        |), sums AS (
        |  SELECT media_id, n,
        |    c * (-100) + (r * (r - 1)) // 2 - 100 * r AS s1,
        |    c * 666700 + (r * (r - 1) * (2 * r - 1)) // 6
        |      - 100 * r * (r - 1) + 10000 * r AS s2
        |  FROM p
        |)
        |SELECT media_id, CAST(n AS INTEGER) AS n_samples,
        |  8000 AS sample_rate,
        |  round(n / 8000.0, 6) AS duration_s,
        |  round(s1 / CAST(n AS DOUBLE), 6) AS mean_amp,
        |  round(sqrt(s2 / CAST(n AS DOUBLE)), 6) AS rms,
        |  100 AS peak
        |FROM sums ORDER BY media_id""".stripMargin,
    // q142: per-frame luma means from the y4m pixel model — every value
    // bounded under 256 (w <= 64, h <= 48, f < 8), so means are exact
    // halves and the closed form needs no wraparound arithmetic. Sampled
    // frame indices are the stride-2 series below n_frames.
    "q142_video_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(16 + 2 * (doc_id % 25) AS INTEGER) AS width,
        |    CAST(16 + 2 * (doc_id % 17) AS INTEGER) AS height,
        |    CAST(1 + doc_id % 7 AS INTEGER) AS n_frames
        |  FROM documents WHERE doc_id < 2000
        |)
        |SELECT media_id, width, height, n_frames,
        |  CAST(f AS INTEGER) AS frame_idx,
        |  round((width - 1) / 2.0 + (height - 1) / 2.0 + 10 * f, 6) AS luma_mean
        |FROM m, generate_series(0, 6, 2) AS t(f)
        |WHERE f < n_frames
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
