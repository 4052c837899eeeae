package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Corpus slice of the driver registry (corpus curation: retrieval, mixtures/selection, tokenizers, quality/eval, release) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object CorpusRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_train_split" -> (Corpus.q93TrainSplit _),
    "q94_doc_chunks" -> ((s: SparkSession, d: String) => Corpus.q94DocChunks(s, d)),
    "q95_quota_sample" -> ((s: SparkSession, d: String) => Corpus.q95QuotaSample(s, d)),
    "q96_inverted_index" -> (Corpus.q96InvertedIndex _),
    "q97_pii_scrub" -> (Corpus.q97PiiScrub _),
    "q154_temperature_mixing" ->
      ((s: SparkSession, d: String) => Corpus.q154TemperatureMixing(s, d)),
    "q155_corpus_shuffle" ->
      ((s: SparkSession, d: String) => Corpus.q155CorpusShuffle(s, d)),
    "q205_sequence_packing" ->
      ((s: SparkSession, d: String) => Corpus.q205SequencePacking(s, d)),
    "q158_filter_funnel" ->
      ((s: SparkSession, d: String) => ext.Quality.q158FilterFunnel(s, d)),
    "q167_bpe_train" ->
      ((s: SparkSession, d: String) => Bpe.q167BpeTrain(s, d)),
    "q168_bpe_encode" ->
      ((s: SparkSession, d: String) => Bpe.q168BpeEncode(s, d)),
    "q169_vocab_growth" ->
      ((s: SparkSession, d: String) => Corpus.q169VocabGrowth(s, d)),
    "q171_unimax_mixture" ->
      ((s: SparkSession, d: String) => Corpus.q171UnimaxMixture(s, d)),
    "q172_dsir_selection" ->
      ((s: SparkSession, d: String) => ext.Quality.q172DsirSelection(s, d)),
    "q175_zipf_fit" ->
      ((s: SparkSession, d: String) => TextAnalysis.q175ZipfFit(s, d)),
    "q177_feature_hashing" ->
      ((s: SparkSession, d: String) => TextAnalysis.q177FeatureHashing(s, d)),
    "q178_truncation_loss" ->
      ((s: SparkSession, d: String) => Corpus.q178TruncationLoss(s, d)),
    "q180_lexical_diversity" ->
      ((s: SparkSession, d: String) => TextAnalysis.q180LexicalDiversity(s, d)),
    "q181_source_kl" ->
      ((s: SparkSession, d: String) => ext.Quality.q181SourceKl(s, d)),
    "q187_raking_weights" ->
      ((s: SparkSession, d: String) => Corpus.q187RakingWeights(s, d)),
    "q189_dataset_card" ->
      ((s: SparkSession, d: String) => Corpus.q189DatasetCard(s, d)),
    "q190_lexical_cosine" ->
      ((s: SparkSession, d: String) => TextAnalysis.q190LexicalCosine(s, d)),
    "q197_good_turing" ->
      ((s: SparkSession, d: String) => TextAnalysis.q197GoodTuring(s, d)),
    "q198_holdout_perplexity" ->
      ((s: SparkSession, d: String) => ext.Quality.q198HoldoutPerplexity(s, d)),
    "q199_release_manifest" ->
      ((s: SparkSession, d: String) => Corpus.q199ReleaseManifest(s, d)),
    "q200_curation_pipeline" ->
      ((s: SparkSession, d: String) => Corpus.q200CurationPipeline(s, d)),
    "q114_bm25" -> ((s, dir) => Corpus.q114Bm25(s, dir)),
    "q115_lm_quality" -> ((s, dir) => ext.Quality.q115LmQuality(s, dir)),
    "q116_weighted_sample" -> ((s, dir) => ext.Quality.q116WeightedSample(s, dir)),
    "q120_char_entropy" -> ((s, dir) => ext.Quality.q120CharEntropy(s, dir)),
    "q125_hybrid_retrieval" -> ((s, dir) => Corpus.q125HybridRetrieval(s, dir)),
  )

  val oracleSql: Map[String, String] = Map(
    // q152: SemDeDup. The k-means clustering is not SQL-statable, but the
    // drop list is: an exact copy lands in its original's cell by
    // construction (identical vector => identical argmin), ties on
    // centrality, and loses the id tie-break — so the planted copies are
    // exactly the dropped set, each kept by its original at cos 1.0. The
    // natural corpus has no cosine >= 0.99 pair (q39's dead zone), and
    // within-cluster comparison can only SHRINK the pair set vs q39's
    // corpus-wide scan — no extra rows can appear.
    // q154: α=0.5 temperature mixing. sqrt is correctly rounded IEEE on
    // both engines (general pow is not); scaled shares pin to 1e-6 fixed
    // point and the budget split is exact integer division (div / //).
    "q154_temperature_mixing" ->
      """WITH per AS (
        |  SELECT lang, count(*) AS n_docs, sum(n_chars) AS n_chars
        |  FROM documents GROUP BY lang
        |), s AS (
        |  SELECT lang, n_docs, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(round(sqrt(CAST(n_chars AS DOUBLE)
        |      / CAST(sum(n_chars) OVER () AS DOUBLE)) * 1000000) AS BIGINT) AS s_fp
        |  FROM per
        |), t AS (
        |  SELECT *, sum(s_fp) OVER () AS s_tot,
        |    (s_fp * 100000) // sum(s_fp) OVER () AS target_docs
        |  FROM s
        |)
        |SELECT lang, n_docs, n_chars,
        |  round(CAST(s_fp AS DOUBLE) / s_tot, 6) AS weight,
        |  CAST(target_docs AS BIGINT) AS target_docs,
        |  round(CAST(target_docs AS DOUBLE) / n_docs, 6) AS sample_rate
        |FROM t ORDER BY lang""".stripMargin,
    // q155: deterministic shuffle/shard export — the q116/q93 md5-u32
    // device; shard = u32 mod 8, position = per-shard hash order.
    "q155_corpus_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS UBIGINT) AS okey
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, okey, CAST(okey % 8 AS INTEGER) AS shard FROM k
        |)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id)
        |    AS INTEGER) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    // q205: the packing policy is pure window arithmetic over q155's
    // shuffled order, so the oracle restates it verbatim — sequence id =
    // floor(tokens-before / capacity) within the shard's md5-u32 order.
    "q205_sequence_packing" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(text, '\s+')) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS UBIGINT) AS okey
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, n_tokens, okey,
        |    CAST(okey % 8 AS INTEGER) AS shard
        |  FROM k
        |), c AS (
        |  SELECT shard, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY shard
        |      ORDER BY okey, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM s
        |)
        |SELECT shard,
        |  CAST(floor(cum_before / 2048.0) AS INTEGER) AS seq_id,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_packed,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 6) AS utilization
        |FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,
    // q200: the composed curation funnel — each stage's CTE mirrors the
    // corresponding Spark stage expression for expression.
    "q200_curation_pipeline" ->
      """WITH raw AS (
        |  SELECT doc_id, text, regexp_split_to_array(text, '\s+') AS t,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS nsp
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, text, t, CAST(len(t) AS BIGINT) AS n_tok,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS stop_n,
        |    nsp * 1000 // len(t) AS mfp
        |  FROM raw
        |), qual AS (
        |  SELECT * FROM g
        |  WHERE n_tok >= 15 AND n_tok <= 5000
        |    AND mfp >= 4000 AND mfp <= 9000 AND stop_n * 100 >= n_tok * 2
        |), ex AS (
        |  SELECT * FROM (SELECT *, row_number() OVER (
        |    PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM qual)
        |  WHERE rn = 1
        |), sp AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(t[gg.i:gg.i+7], ' ')) AS h
        |  FROM ex, UNNEST(generate_series(1, len(t), 8)) AS gg(i)
        |), sh AS (
        |  SELECT h, count(*) AS nd FROM sp GROUP BY h
        |), keepd AS (
        |  SELECT sp.doc_id FROM sp JOIN sh USING (h)
        |  GROUP BY sp.doc_id
        |  HAVING sum(CASE WHEN sh.nd = 1 THEN 1 ELSE 0 END) * 2 >= count(*)
        |), pr AS (
        |  SELECT ex.* FROM ex JOIN keepd USING (doc_id)
        |), spl AS (
        |  SELECT n_tok, '5_' || CASE
        |    WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100
        |      < 80 THEN 'train'
        |    WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100
        |      < 90 THEN 'val' ELSE 'test' END AS stage
        |  FROM pr
        |)
        |SELECT '1_raw' AS stage, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM g
        |UNION ALL SELECT '2_quality', count(*),
        |  CAST(sum(n_tok) AS BIGINT) FROM qual
        |UNION ALL SELECT '3_exact_dedup', count(*),
        |  CAST(sum(n_tok) AS BIGINT) FROM ex
        |UNION ALL SELECT '4_span_prune', count(*),
        |  CAST(sum(n_tok) AS BIGINT) FROM pr
        |UNION ALL SELECT stage, count(*),
        |  CAST(sum(n_tok) AS BIGINT) FROM spl GROUP BY stage
        |ORDER BY stage""".stripMargin,
    // q199: release manifest — order-independent XOR fingerprints in two
    // 32-bit lanes (engine-neutral md5-u32 device, no 64-bit overflow).
    "q199_release_manifest" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(CAST(concat('0x', substr(md5(text), 1, 8)) AS UBIGINT)
        |      AS BIGINT) AS hi,
        |    CAST(CAST(concat('0x', substr(md5(text), 9, 8)) AS UBIGINT)
        |      AS BIGINT) AS lo,
        |    CAST(length(text) AS BIGINT) AS nb
        |  FROM documents
        |)
        |SELECT source, count(*) AS n_docs,
        |  -- mod-2^32 multiset lane sums (xor cancels even multiplicities;
        |  -- DuckDB sums BIGINT into HUGEINT, so the sum itself never wraps)
        |  CAST(sum(hi) % 4294967296 AS BIGINT) AS fp_hi,
        |  CAST(sum(lo) % 4294967296 AS BIGINT) AS fp_lo,
        |  CAST(sum(nb) AS BIGINT) AS n_chars
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    // q198: holdout LM eval — q93's split rule, train-only counts, one
    // ln of an exact ratio per held-out bigram (q115 device).
    "q198_holdout_perplexity" ->
      """WITH d AS (
        |  SELECT CASE
        |    WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100
        |      < 80 THEN 'train'
        |    WHEN (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100
        |      < 90 THEN 'val' ELSE 'test' END AS split,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |      x -> x <> '') AS tk
        |  FROM documents
        |), b AS (
        |  SELECT split, tk[g.i] AS w1, tk[g.i + 1] AS w2
        |  FROM d, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  WHERE len(tk) >= 2
        |), cuni AS (
        |  SELECT w1, count(*) AS c1 FROM b WHERE split = 'train' GROUP BY w1
        |), cbi AS (
        |  SELECT w1, w2, count(*) AS c12 FROM b WHERE split = 'train'
        |  GROUP BY w1, w2
        |), vocab AS (
        |  SELECT count(*) AS v FROM (
        |    SELECT w1 AS w FROM b WHERE split = 'train'
        |    UNION SELECT w2 FROM b WHERE split = 'train')
        |)
        |SELECT b.split, count(*) AS n_bigrams,
        |  round(sum(CAST(round(ln(
        |      CAST(coalesce(cuni.c1, 0) + vocab.v + 1 AS DOUBLE)
        |      / CAST(coalesce(cbi.c12, 0) + 1 AS DOUBLE)) * 1000000)
        |    AS BIGINT)) / (1000000.0 * count(*)), 6) AS avg_nll
        |FROM b
        |LEFT JOIN cuni ON cuni.w1 = b.w1
        |LEFT JOIN cbi ON cbi.w1 = b.w1 AND cbi.w2 = b.w2, vocab
        |WHERE b.split != 'train'
        |GROUP BY b.split ORDER BY b.split""".stripMargin,
    // q197: Good-Turing — exact frequency-of-frequencies over trigrams,
    // single-division r* and unseen mass.
    "q197_good_turing" ->
      """WITH t AS (
        |  SELECT list_filter(regexp_split_to_array(lower(text),
        |    '[^a-z]+'), x -> x <> '') AS tk
        |  FROM documents
        |), tri AS (
        |  SELECT tk[g.i] || ' ' || tk[g.i + 1] || ' ' || tk[g.i + 2] AS g
        |  FROM t, UNNEST(generate_series(1, len(tk) - 2)) AS g(i)
        |), counts AS (
        |  SELECT g, count(*) AS c FROM tri GROUP BY g
        |), fof AS (
        |  SELECT c, count(*) AS n_r FROM counts GROUP BY c
        |), tot AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_total,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |  FROM counts
        |), grid AS (
        |  SELECT CAST(g.r AS BIGINT) AS r
        |  FROM UNNEST(generate_series(1, 8)) AS g(r)
        |)
        |SELECT grid.r, coalesce(f1.n_r, 0) AS n_r,
        |  coalesce(f2.n_r, 0) AS n_next,
        |  CASE WHEN coalesce(f1.n_r, 0) = 0 THEN NULL
        |    ELSE round(CAST((grid.r + 1) * coalesce(f2.n_r, 0) AS DOUBLE)
        |      / f1.n_r, 6) END AS r_star,
        |  round(CAST(t2.n1 AS DOUBLE) / t2.n_total, 6) AS p_unseen
        |FROM grid
        |LEFT JOIN fof f1 ON f1.c = grid.r
        |LEFT JOIN fof f2 ON f2.c = grid.r + 1, tot t2
        |ORDER BY grid.r""".stripMargin,
    // q190: lexical cosine over hashed BOW — q177's bucket device, an
    // inverted bucket join for the dots, shape-mirrored cosine.
    "q190_lexical_cosine" ->
      """WITH vec AS (
        |  SELECT doc_id, bucket, count(*) AS c FROM (
        |    SELECT doc_id,
        |      CAST(concat('0x', substr(md5(u.term), 1, 8)) AS UBIGINT)
        |        % 1024 AS bucket
        |    FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
        |      lower(text), '[^a-z]+'), x -> x <> '')) AS term
        |      FROM documents) u) b
        |  GROUP BY doc_id, bucket
        |), n2 AS (
        |  SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2
        |  FROM vec GROUP BY doc_id
        |), q AS (
        |  SELECT doc_id AS query_id, bucket, c AS cq FROM vec
        |  WHERE doc_id < 5
        |), dots AS (
        |  SELECT q.query_id, v.doc_id AS neighbor_id,
        |    CAST(sum(q.cq * v.c) AS BIGINT) AS dot
        |  FROM vec v JOIN q ON v.bucket = q.bucket
        |    AND v.doc_id != q.query_id
        |  GROUP BY q.query_id, v.doc_id
        |), sc AS (
        |  SELECT d.query_id, d.neighbor_id,
        |    round(CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))),
        |      6) AS cos
        |  FROM dots d
        |  JOIN n2 nq ON nq.doc_id = d.query_id
        |  JOIN n2 nc ON nc.doc_id = d.neighbor_id
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM sc
        |)
        |SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    // q189: dataset card — three per-source aggregates (mass, q120-style
    // fixed-point lang entropy, q165-style span sharing) joined on source.
    "q189_dataset_card" ->
      """WITH mass AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY source
        |), lc AS (
        |  SELECT source, lang, count(*) AS c FROM documents
        |  GROUP BY source, lang
        |), ent AS (
        |  SELECT source,
        |    round((CAST(round(ln(CAST(sum(c) AS DOUBLE)) * 1000000)
        |        AS BIGINT) * sum(c)
        |      - sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000)
        |        AS BIGINT)))
        |      / (1000000.0 * sum(c)), 6) AS lang_entropy
        |  FROM lc GROUP BY source
        |), d AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(tk[g.i:g.i+7], ' ')) AS h
        |  FROM (SELECT source, regexp_split_to_array(text, '\s+') AS tk
        |        FROM documents) t,
        |    UNNEST(generate_series(1, len(tk), 8)) AS g(i)
        |), ns AS (
        |  SELECT h, count(*) AS nsrc FROM d GROUP BY h
        |), sharing AS (
        |  SELECT d.source, count(*) AS n_spans,
        |    CAST(sum(CASE WHEN ns.nsrc > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_shared
        |  FROM d JOIN ns USING (h) GROUP BY d.source
        |)
        |SELECT m.source, m.n_docs, m.n_tokens,
        |  round(CAST(m.n_tokens AS DOUBLE) / m.n_docs, 2)
        |    AS mean_doc_tokens,
        |  e.lang_entropy, s.n_spans,
        |  round(CAST(s.n_shared AS DOUBLE) / s.n_spans, 6)
        |    AS shared_span_frac
        |FROM mass m JOIN ent e ON e.source = m.source
        |JOIN sharing s ON s.source = m.source
        |ORDER BY m.source""".stripMargin,
    // q187: raking/IPF — 3 unrolled row/column scaling rounds, weights
    // re-rounded to 1e-9 fixed point after every step.
    "q187_raking_weights" ->
      """WITH b AS (
        |  SELECT source, lang, count(*) AS n
        |  FROM documents GROUP BY source, lang
        |), t0 AS (
        |  SELECT source, lang, n,
        |    CAST(sum(n) OVER (PARTITION BY source) * 1000000000 AS BIGINT)
        |      AS rfp,
        |    CAST(sum(n) OVER () * 1000000000 AS BIGINT) //
        |      (SELECT count(DISTINCT lang) FROM documents) AS cfp,
        |      -- ^ DuckDB's `//` is INTEGER DIVISION (mirrors Spark DIV),
        |      --   not a comment marker (DuckDB comments are `--`)
        |    CAST(n * 1000000000 AS BIGINT) AS w
        |  FROM b
        |), r1 AS (
        |  SELECT source, lang, n, rfp, cfp,
        |    CAST(round(w * (CAST(rfp AS DOUBLE)
        |      / sum(w) OVER (PARTITION BY source))) AS BIGINT) AS w
        |  FROM t0
        |), c1 AS (
        |  SELECT source, lang, n, rfp, cfp,
        |    CAST(round(w * (CAST(cfp AS DOUBLE)
        |      / sum(w) OVER (PARTITION BY lang))) AS BIGINT) AS w
        |  FROM r1
        |), r2 AS (
        |  SELECT source, lang, n, rfp, cfp,
        |    CAST(round(w * (CAST(rfp AS DOUBLE)
        |      / sum(w) OVER (PARTITION BY source))) AS BIGINT) AS w
        |  FROM c1
        |), c2 AS (
        |  SELECT source, lang, n, rfp, cfp,
        |    CAST(round(w * (CAST(cfp AS DOUBLE)
        |      / sum(w) OVER (PARTITION BY lang))) AS BIGINT) AS w
        |  FROM r2
        |), r3 AS (
        |  SELECT source, lang, n, rfp, cfp,
        |    CAST(round(w * (CAST(rfp AS DOUBLE)
        |      / sum(w) OVER (PARTITION BY source))) AS BIGINT) AS w
        |  FROM c2
        |), c3 AS (
        |  SELECT source, lang, n, rfp, cfp,
        |    CAST(round(w * (CAST(cfp AS DOUBLE)
        |      / sum(w) OVER (PARTITION BY lang))) AS BIGINT) AS w
        |  FROM r3
        |)
        |SELECT source, lang, n AS n_docs,
        |  round(CAST(w AS DOUBLE) / 1000000000 / n, 6) AS weight
        |FROM c3 ORDER BY source, lang""".stripMargin,
    // q181: plug-in KL per source — single-ln exact-BIGINT ratios,
    // fixed-pointed before the per-source sum (the q172 device).
    "q181_source_kl" ->
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(regexp_split_to_array(
        |    lower(text), '[^a-z]+'), x -> x <> '')) AS term
        |  FROM documents
        |), pt AS (
        |  SELECT source, term, count(*) AS cs FROM tok GROUP BY source, term
        |), corpus AS (
        |  SELECT term, count(*) AS cc FROM tok GROUP BY term
        |), totals AS (
        |  SELECT CAST(sum(cc) AS BIGINT) AS nc FROM corpus
        |), ps AS (
        |  SELECT source, CAST(sum(cs) AS BIGINT) AS ns FROM pt GROUP BY source
        |)
        |SELECT pt.source, max(ps.ns) AS n_tokens, count(*) AS n_terms,
        |  round(sum(CAST(round(pt.cs * ln(
        |      CAST(pt.cs * t.nc AS DOUBLE) / CAST(c.cc * ps.ns AS DOUBLE))
        |      * 1000000) AS BIGINT)) / (1000000.0 * max(ps.ns)), 6)
        |    AS kl_nats
        |FROM pt JOIN corpus c USING (term) JOIN ps ON ps.source = pt.source,
        |  totals t
        |GROUP BY pt.source ORDER BY pt.source""".stripMargin,
    // q180: distinct-1/distinct-2 per source — exact type/token counts,
    // two correctly-rounded divisions.
    "q180_lexical_diversity" ->
      """WITH t AS (
        |  SELECT source, list_filter(regexp_split_to_array(lower(text),
        |    '[^a-z]+'), x -> x <> '') AS tk
        |  FROM documents
        |), u AS (
        |  SELECT source, unnest(tk) AS g FROM t
        |), b AS (
        |  SELECT source, tk[g.i] || ' ' || tk[g.i + 1] AS g
        |  FROM t, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |), s1 AS (
        |  SELECT source, count(*) AS types_1,
        |    CAST(sum(c) AS BIGINT) AS tokens_1
        |  FROM (SELECT source, g, count(*) AS c FROM u GROUP BY source, g)
        |  GROUP BY source
        |), s2 AS (
        |  SELECT source, count(*) AS types_2,
        |    CAST(sum(c) AS BIGINT) AS tokens_2
        |  FROM (SELECT source, g, count(*) AS c FROM b GROUP BY source, g)
        |  GROUP BY source
        |)
        |SELECT source, types_1, tokens_1,
        |  round(CAST(types_1 AS DOUBLE) / tokens_1, 6) AS distinct_1,
        |  types_2, tokens_2,
        |  round(CAST(types_2 AS DOUBLE) / tokens_2, 6) AS distinct_2
        |FROM s1 JOIN s2 USING (source) ORDER BY source""".stripMargin,
    // q178: truncation-loss curve — bounded-key aggregate over exact
    // integer token sums; loss is one shape-mirrored double expression.
    "q178_truncation_loss" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
        |  FROM documents
        |), x AS (
        |  SELECT source, n, CAST(l.l AS BIGINT) AS "limit"
        |  FROM d, UNNEST([128, 512, 2048, 4096]) AS l(l)
        |)
        |SELECT source, "limit", count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS tok_mass,
        |  CAST(sum(least(n, "limit")) AS BIGINT) AS kept,
        |  round(1.0 - CAST(sum(least(n, "limit")) AS DOUBLE) / sum(n), 6)
        |    AS loss
        |FROM x GROUP BY source, "limit"
        |ORDER BY source, "limit" """.stripMargin,
    // q177: feature hashing — the md5-u32 bucket device (q116's) mod the
    // dimension; rank ties break on bucket id.
    "q177_feature_hashing" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(u.term), 1, 8)) AS UBIGINT) % 1024
        |      AS bucket
        |  FROM (
        |    SELECT doc_id, unnest(list_filter(regexp_split_to_array(
        |      lower(text), '[^a-z]+'), x -> x <> '')) AS term
        |    FROM documents WHERE doc_id < 10) u
        |), c AS (
        |  SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, count(*) AS cnt
        |  FROM b GROUP BY doc_id, bucket
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY cnt DESC, bucket) AS INTEGER) AS rank
        |  FROM c
        |)
        |SELECT doc_id, rank, bucket, cnt FROM r WHERE rank <= 5
        |ORDER BY doc_id, rank""".stripMargin,
    // q175: Zipf fit — regression sums over 1e-4 fixed-point ln values
    // are exact integers; slope/intercept/R² are shape-mirrored doubles.
    "q175_zipf_fit" ->
      """WITH top AS (
        |  SELECT term, count(*) AS c FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z]+'), x -> x <> '')) AS term FROM documents)
        |  GROUP BY term ORDER BY c DESC, term LIMIT 1000
        |), fx AS (
        |  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC,
        |      term) AS DOUBLE)) * 10000) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(c AS DOUBLE)) * 10000) AS BIGINT) AS y
        |  FROM top
        |), s AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM fx
        |)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (n * sxx - sx * sx), 6) AS slope,
        |  round(((sy - (CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (n * sxx - sx * sx)) * sx) / n) / 10000, 6) AS intercept,
        |  round((CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy))
        |    / (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6)
        |    AS r2
        |FROM s""".stripMargin,
    // q172: DSIR selection — per-token single-ln of an exact BIGINT
    // ratio, fixed-pointed before the per-doc sum (the q115 device).
    "q172_dsir_selection" ->
      """WITH tok AS (
        |  SELECT doc_id, source = 'src0' AS is_target,
        |    unnest(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z]+'), x -> x <> '')) AS term
        |  FROM documents
        |), counts AS (
        |  SELECT term,
        |    sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
        |    sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
        |  FROM tok GROUP BY term
        |), stats AS (
        |  SELECT count(*) AS v, sum(ct) AS nt, sum(cr) AS nr FROM counts
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(CAST(round(ln(
        |      CAST((c.ct + 1) * (s.nr + s.v) AS DOUBLE)
        |      / CAST((c.cr + 1) * (s.nt + s.v) AS DOUBLE)) * 1000000)
        |    AS BIGINT)) / (1000000.0 * count(*)), 6) AS dsir_score
        |FROM tok JOIN counts c USING (term), stats s
        |WHERE NOT is_target
        |GROUP BY doc_id
        |ORDER BY dsir_score DESC, doc_id LIMIT 15""".stripMargin,
    // q171: UniMax allocation — closed-form water-filling over the
    // |langs|-row aggregate; integer half-token units everywhere except
    // the shape-mirrored equal-share/epoch divisions.
    "q171_unimax_mixture" ->
      """WITH n AS (
        |  SELECT lang, count(*) AS n_tokens FROM (
        |    SELECT lang, unnest(list_filter(regexp_split_to_array(
        |      lower(text), '[^a-z]+'), x -> x <> '')) AS w FROM documents)
        |  GROUP BY lang
        |), f AS (
        |  SELECT lang, n_tokens,
        |    row_number() OVER (ORDER BY n_tokens, lang) AS idx,
        |    count(*) OVER () AS k,
        |    3 * sum(n_tokens) OVER () AS th,
        |    coalesce(sum(n_tokens) OVER (ORDER BY n_tokens, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
        |  FROM n
        |), g AS (
        |  SELECT *, CASE WHEN 4 * n_tokens * (k - idx + 1) <= th - 4 * p
        |    THEN 1 ELSE 0 END AS flag
        |  FROM f
        |), h AS (
        |  SELECT *, min(flag) OVER (ORDER BY n_tokens, lang) = 1 AS capped
        |  FROM g
        |), i AS (
        |  SELECT *,
        |    coalesce(sum(CASE WHEN capped THEN n_tokens END) OVER (), 0)
        |      AS s_capped,
        |    coalesce(sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER (), 0)
        |      AS n_capped
        |  FROM h
        |), j AS (
        |  SELECT lang, n_tokens, capped,
        |    CASE WHEN capped THEN CAST(4 * n_tokens AS DOUBLE)
        |      ELSE CAST(th - 4 * s_capped AS DOUBLE) / (k - n_capped)
        |    END AS alloc_half
        |  FROM i
        |)
        |SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens, capped,
        |  round(alloc_half / 2.0, 2) AS alloc_tokens,
        |  round(alloc_half / (2.0 * n_tokens), 6) AS epochs
        |FROM j ORDER BY n_tokens, lang""".stripMargin,
    // q169: Heaps-law vocabulary-growth curve over 50-doc buckets; LEFT
    // join because saturated buckets add zero new words.
    "q169_vocab_growth" ->
      """WITH words AS (
        |  SELECT CAST(floor(doc_id / 50) AS BIGINT) AS bucket,
        |    unnest(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z]+'), x -> x <> '')) AS word
        |  FROM documents
        |), fs AS (
        |  SELECT word, min(bucket) AS bucket FROM words GROUP BY word
        |), nw AS (
        |  SELECT bucket, count(*) AS n_new_words FROM fs GROUP BY bucket
        |), mass AS (
        |  SELECT bucket, count(*) AS bucket_tokens FROM words GROUP BY bucket
        |), curve AS (
        |  SELECT m.bucket,
        |    CAST(coalesce(nw.n_new_words, 0) AS BIGINT) AS n_new_words,
        |    m.bucket_tokens
        |  FROM mass m LEFT JOIN nw USING (bucket)
        |), c2 AS (
        |  SELECT bucket, n_new_words,
        |    CAST(sum(n_new_words) OVER (ORDER BY bucket) AS BIGINT)
        |      AS cum_vocab,
        |    CAST(bucket_tokens AS BIGINT) AS bucket_tokens,
        |    CAST(sum(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT)
        |      AS cum_tokens
        |  FROM curve
        |)
        |SELECT bucket, n_new_words, cum_vocab, bucket_tokens, cum_tokens,
        |  round(CAST(cum_vocab AS DOUBLE) / cum_tokens, 6) AS ttr
        |FROM c2 ORDER BY bucket""".stripMargin,
    // q168: corpus encoding with the q167-learned tokenizer — the same
    // 6-round chain carrying the word key, then a word-keyed join back
    // onto the corpus and a per-language aggregate.
    "q168_bpe_encode" ->
      """WITH w0 AS (
        |  SELECT u.word, count(*) AS c FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |      x -> x <> '')) AS word FROM documents) u
        |  GROUP BY u.word
        |), v0 AS (
        |  SELECT word, array_to_string(regexp_split_to_array(word, ''), ' ')
        |    || ' </w>' AS w, c FROM w0
        |), p1 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, sum(c) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v0) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b1 AS (
        |  SELECT a, b FROM p1 ORDER BY cnt DESC, a, b LIMIT 1
        |), v1 AS (
        |  SELECT v.word, list_reduce(regexp_split_to_array(v.w, ' '),
        |    (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v0 v CROSS JOIN b1 b
        |), p2 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, sum(c) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v1) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b2 AS (
        |  SELECT a, b FROM p2 ORDER BY cnt DESC, a, b LIMIT 1
        |), v2 AS (
        |  SELECT v.word, list_reduce(regexp_split_to_array(v.w, ' '),
        |    (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v1 v CROSS JOIN b2 b
        |), p3 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, sum(c) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v2) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b3 AS (
        |  SELECT a, b FROM p3 ORDER BY cnt DESC, a, b LIMIT 1
        |), v3 AS (
        |  SELECT v.word, list_reduce(regexp_split_to_array(v.w, ' '),
        |    (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v2 v CROSS JOIN b3 b
        |), p4 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, sum(c) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v3) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b4 AS (
        |  SELECT a, b FROM p4 ORDER BY cnt DESC, a, b LIMIT 1
        |), v4 AS (
        |  SELECT v.word, list_reduce(regexp_split_to_array(v.w, ' '),
        |    (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v3 v CROSS JOIN b4 b
        |), p5 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, sum(c) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v4) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b5 AS (
        |  SELECT a, b FROM p5 ORDER BY cnt DESC, a, b LIMIT 1
        |), v5 AS (
        |  SELECT v.word, list_reduce(regexp_split_to_array(v.w, ' '),
        |    (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v4 v CROSS JOIN b5 b
        |), p6 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, sum(c) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v5) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b6 AS (
        |  SELECT a, b FROM p6 ORDER BY cnt DESC, a, b LIMIT 1
        |), v6 AS (
        |  SELECT v.word, list_reduce(regexp_split_to_array(v.w, ' '),
        |    (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v5 v CROSS JOIN b6 b
        |)
        |, enc AS (
        |  SELECT word, len(regexp_split_to_array(w, ' ')) AS n_tok FROM v6
        |), dw AS (
        |  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text),
        |    '[^a-z]+'), x -> x <> '')) AS word FROM documents
        |)
        |SELECT lang, count(*) AS n_words, CAST(sum(e.n_tok) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(length(dw.word)) AS DOUBLE) / sum(e.n_tok), 6)
        |    AS chars_per_token
        |FROM dw JOIN enc e USING (word)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // q167: BPE merge training, 6 rounds unrolled. Each block mirrors the
    // Spark loop exactly: weighted adjacent-pair counts, (cnt DESC, a, b)
    // argmax, and the same greedy string fold (list_reduce here,
    // aggregate() there) applying the merge.
    "q167_bpe_train" ->
      """WITH w0 AS (
        |  SELECT u.word, count(*) AS c FROM (
        |    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
        |      x -> x <> '')) AS word FROM documents) u
        |  GROUP BY u.word
        |), v0 AS (
        |  SELECT array_to_string(regexp_split_to_array(word, ''), ' ')
        |    || ' </w>' AS w, c FROM w0
        |), p1 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v0) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b1 AS (
        |  SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1
        |), v1 AS (
        |  SELECT list_reduce(regexp_split_to_array(v.w, ' '), (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v0 v CROSS JOIN b1 b
        |), p2 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v1) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b2 AS (
        |  SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1
        |), v2 AS (
        |  SELECT list_reduce(regexp_split_to_array(v.w, ' '), (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v1 v CROSS JOIN b2 b
        |), p3 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v2) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b3 AS (
        |  SELECT a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1
        |), v3 AS (
        |  SELECT list_reduce(regexp_split_to_array(v.w, ' '), (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v2 v CROSS JOIN b3 b
        |), p4 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v3) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b4 AS (
        |  SELECT a, b, cnt FROM p4 ORDER BY cnt DESC, a, b LIMIT 1
        |), v4 AS (
        |  SELECT list_reduce(regexp_split_to_array(v.w, ' '), (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v3 v CROSS JOIN b4 b
        |), p5 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v4) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b5 AS (
        |  SELECT a, b, cnt FROM p5 ORDER BY cnt DESC, a, b LIMIT 1
        |), v5 AS (
        |  SELECT list_reduce(regexp_split_to_array(v.w, ' '), (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v4 v CROSS JOIN b5 b
        |), p6 AS (
        |  SELECT tk[g.i] AS a, tk[g.i + 1] AS b, CAST(sum(c) AS BIGINT) AS cnt
        |  FROM (SELECT regexp_split_to_array(w, ' ') AS tk, c FROM v5) t,
        |    UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
        |  GROUP BY a, b
        |), b6 AS (
        |  SELECT a, b, cnt FROM p6 ORDER BY cnt DESC, a, b LIMIT 1
        |), v6 AS (
        |  SELECT list_reduce(regexp_split_to_array(v.w, ' '), (acc, x) -> CASE
        |    WHEN (acc = b.a OR right(acc, length(b.a) + 1) = ' ' || b.a)
        |      AND x = b.b THEN acc || b.b
        |    ELSE acc || ' ' || x END) AS w, v.c
        |  FROM v5 v CROSS JOIN b6 b
        |)
        |SELECT step, lhs, rhs, merged, pair_count FROM (
        |SELECT 1 AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b1
        |  UNION ALL SELECT 2 AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b2
        |  UNION ALL SELECT 3 AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b3
        |  UNION ALL SELECT 4 AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b4
        |  UNION ALL SELECT 5 AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b5
        |  UNION ALL SELECT 6 AS step, a AS lhs, b AS rhs, a || b AS merged, cnt AS pair_count FROM b6)
        |ORDER BY step""".stripMargin,
    "q158_filter_funnel" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(regexp_split_to_array(text, '\s+')) AS n_tok,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS nsp,
        |    -- case-folded, mirroring the Spark rule (and q200's stage 2)
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS stop_n
        |  FROM documents
        |), v AS (
        |  SELECT lang, n_tok,
        |    CASE WHEN n_tok < 15 THEN 'too_short'
        |      WHEN n_tok > 5000 THEN 'too_long'
        |      WHEN nsp * 1000 // n_tok < 4000
        |        OR nsp * 1000 // n_tok > 9000 THEN 'weird_tokens'
        |      WHEN stop_n * 100 < n_tok * 2 THEN 'low_stopword'
        |      ELSE 'pass' END AS verdict
        |  FROM s
        |)
        |SELECT lang, verdict, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM v GROUP BY lang, verdict ORDER BY lang, verdict""".stripMargin,
    "q93_train_split" ->
      """WITH b AS (
        |  SELECT n_chars,
        |    (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS bucket
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "q94_doc_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents
        |), starts AS (
        |  SELECT doc_id, t, CAST(g.i AS INTEGER) AS start
        |  FROM toks, UNNEST(generate_series(1, len(t), 40)) AS g(i)
        |)
        |SELECT doc_id, start,
        |  CAST(len(t[start:start+49]) AS INTEGER) AS n_tok,
        |  md5(array_to_string(t[start:start+49], ' ')) AS chunk_md5
        |FROM starts ORDER BY doc_id, start""".stripMargin,
    "q95_quota_sample" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents
        |)
        |SELECT lang, doc_id FROM ranked WHERE rn <= 50
        |ORDER BY lang, doc_id""".stripMargin,
    "q96_inverted_index" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id,
        |      unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
        |    FROM documents)
        |  WHERE term <> ''
        |)
        |SELECT term, count(*) AS df,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        |FROM tok GROUP BY term ORDER BY df DESC, term LIMIT 20""".stripMargin,
    "q97_pii_scrub" ->
      """SELECT event_id, event_type,
        |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS masked_props,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_masked
        |FROM events ORDER BY event_id""".stripMargin,
    "q114_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, t.term
        |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
        |  WHERE t.term <> ''
        |),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |qtok AS (SELECT doc_id, term FROM tok
        |         WHERE term IN ('merge', 'stream', 'window')),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      ln(CAST(1.0 AS DOUBLE)
        |         + (s.n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
        |      * ((tf.tf * CAST(2.2 AS DOUBLE))
        |         / (tf.tf + CAST(1.2 AS DOUBLE)
        |            * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |               + CAST(0.75 AS DOUBLE) * dl.dl / s.avgdl)))
        |      * 1000000) AS BIGINT) AS c_fp
        |  FROM tf
        |  JOIN df USING (term)
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats s
        |)
        |SELECT doc_id, CAST(SUM(c_fp) AS BIGINT) / CAST(1000000 AS DOUBLE) AS bm25
        |FROM contrib GROUP BY 1
        |ORDER BY bm25 DESC, doc_id
        |LIMIT 15""".stripMargin,
    "q115_lm_quality" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS lst
        |  FROM documents
        |), tok AS (
        |  SELECT unnest(lst) AS term FROM t
        |), cuni AS (SELECT term, count(*) AS c1 FROM tok GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM cuni),
        |big AS (
        |  SELECT doc_id, lst[CAST(g.i AS INTEGER)] AS w1,
        |         lst[CAST(g.i AS INTEGER) + 1] AS w2
        |  FROM t, UNNEST(generate_series(1, len(lst) - 1)) AS g(i)
        |  WHERE len(lst) >= 2
        |),
        |docbi AS (SELECT doc_id, w1, w2, count(*) AS n FROM big GROUP BY 1, 2, 3),
        |cbi AS (SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS c12 FROM docbi GROUP BY 1, 2),
        |contrib AS (
        |  SELECT d.doc_id, d.n,
        |    CAST(round(-ln((c.c12 + CAST(1.0 AS DOUBLE)) / (u.c1 + v.v))
        |               * 1000000) AS BIGINT) AS fp
        |  FROM docbi d
        |  JOIN cbi c USING (w1, w2)
        |  JOIN cuni u ON d.w1 = u.term
        |  CROSS JOIN v
        |)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
        |  round(CAST(SUM(n * fp) AS BIGINT)
        |        / (1000000.0 * CAST(SUM(n) AS BIGINT)), 6) AS avg_nll
        |FROM contrib GROUP BY 1
        |ORDER BY avg_nll DESC, doc_id
        |LIMIT 15""".stripMargin,
    "q116_weighted_sample" ->
      """WITH k AS (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(round(
        |      ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |           AS UBIGINT) + 0.5) / 4294967296.0)
        |      / n_chars * 1000000000000) AS BIGINT) AS key_fp
        |  FROM documents WHERE n_chars > 0
        |), r AS (
        |  SELECT lang, doc_id, n_chars, key_fp,
        |    row_number() OVER (PARTITION BY lang ORDER BY key_fp DESC, doc_id) AS rk
        |  FROM k
        |)
        |SELECT lang, doc_id, n_chars, key_fp, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
    "q120_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
        |  FROM documents
        |), cc AS (
        |  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2
        |), agg AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chs,
        |    CAST(SUM(c * CAST(round(ln(c) * 1000000) AS BIGINT)) AS BIGINT) AS s
        |  FROM cc GROUP BY 1
        |)
        |SELECT doc_id, n_chs,
        |  round((CAST(round(ln(n_chs) * 1000000) AS BIGINT) * n_chs - s)
        |        / (1000000.0 * n_chs), 6) AS entropy
        |FROM agg
        |ORDER BY entropy ASC, doc_id
        |LIMIT 15""".stripMargin,
    "q125_hybrid_retrieval" ->
      """WITH tok AS (
        |  SELECT doc_id, t.term
        |  FROM documents, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS t(term)
        |  WHERE t.term <> ''
        |),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_docs,
        |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |qtok AS (SELECT doc_id, term FROM tok
        |         WHERE term IN ('merge', 'stream', 'window')),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qtok GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qtok GROUP BY 1),
        |contrib AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      ln(CAST(1.0 AS DOUBLE)
        |         + (s.n_docs - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
        |      * ((tf.tf * CAST(2.2 AS DOUBLE))
        |         / (tf.tf + CAST(1.2 AS DOUBLE)
        |            * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
        |               + CAST(0.75 AS DOUBLE) * dl.dl / s.avgdl)))
        |      * 1000000) AS BIGINT) AS c_fp
        |  FROM tf
        |  JOIN df USING (term)
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats s
        |),
        |bm AS (SELECT doc_id,
        |         CAST(SUM(c_fp) AS BIGINT) / CAST(1000000 AS DOUBLE) AS bm25
        |       FROM contrib GROUP BY 1),
        |lexr AS (SELECT doc_id, CAST(row_number()
        |           OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_lex
        |         FROM bm WHERE doc_id != 0),
        |lex AS (SELECT doc_id, r_lex FROM lexr WHERE r_lex <= 50),
        |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
        |      FROM embeddings WHERE vec_id = 0),
        |vs AS (SELECT vec_id AS doc_id,
        |         round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe), 6) AS cos
        |       FROM embeddings, q WHERE vec_id != 0),
        |vecr AS (SELECT doc_id, CAST(row_number()
        |           OVER (ORDER BY cos DESC, doc_id) AS INTEGER) AS r_vec FROM vs),
        |vec AS (SELECT doc_id, r_vec FROM vecr WHERE r_vec <= 50)
        |SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
        |  COALESCE(r_lex, 0) AS r_lex,
        |  COALESCE(r_vec, 0) AS r_vec,
        |  round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_lex), 0)
        |        + COALESCE(CAST(1.0 AS DOUBLE) / (60 + r_vec), 0), 9) AS rrf
        |FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
        |ORDER BY rrf DESC, doc_id
        |LIMIT 15""".stripMargin,
  )
}
