package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

/** Text slice of the driver registry (text analysis and the dedup families: exact/MinHash/SimHash/set-similarity/span dedup) —
  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The
  * per-family split keeps each registry file reviewable; the driver
  * contract (one flat map) is unchanged. */
object TextRegistry {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_dedup_stats" -> (Dedup.q58DedupStats _),
    "q62_neardup_corpus" -> (Dedup.q62NearDupCorpus _),
    "q52_bpe_token_estimate" -> (TextAnalysis.q52BpeTokenEstimate _),
    "q30_text_stats" -> (TextAnalysis.q30TextStats _),
    "q204_doc_repetition" -> (TextAnalysis.q204DocRepetition _),
    "q31_lang_id" -> (TextAnalysis.q31LangId _),
    "q32_exact_dedup" -> (Dedup.q32ExactDedup _),
    "q33_fingerprint" -> (TextAnalysis.q33Fingerprint _),
    "q34_minhash_neardup" -> ((s: SparkSession, d: String) => Dedup.q34MinhashNearDup(s, d)),
    "q35_simhash_neardup" -> (Dedup.q35SimhashNearDup _),
    "q36_ngram_jaccard" -> (Dedup.q36NgramJaccard _),
    "q79_corpus_curation" -> (Extra.q79CorpusCuration _),
    "q80_sequence_packing" -> ((s: SparkSession, d: String) => Extra.q80SequencePacking(s, d)),
    "q81_repetition" -> (Extra.q81Repetition _),
    "q86_decontamination" -> ((s: SparkSession, d: String) => Dedup.q86Decontamination(s, d)),
    "q112_incremental_dedup" -> (Dedup.q112IncrementalDedup _),
    "q139_incremental_dedup_bucketed" -> (Dedup.q139IncrementalDedupBucketed _),
    "q143_minhash_neardup_table" ->
      ((s: SparkSession, d: String) => Dedup.q143MinhashNearDupMaterialized(s, d)),
    "q144_fingerprint_planted" -> (TextAnalysis.q144FingerprintPlanted _),
    "q145_simhash_planted" -> (Dedup.q145SimhashPlantedRecall _),
    "q150_incremental_neardup" -> (Dedup.q150IncrementalNearDup _),
    "q156_boilerplate_strip" ->
      ((s: SparkSession, d: String) => Corpus.q156BoilerplateStrip(s, d)),
    "q163_span_dedup" ->
      ((s: SparkSession, d: String) => Dedup.q163SpanDedup(s, d)),
    "q164_cooccurrence_pmi" ->
      ((s: SparkSession, d: String) => Corpus.q164CooccurrencePmi(s, d)),
    "q165_source_overlap" ->
      ((s: SparkSession, d: String) => Dedup.q165SourceOverlap(s, d)),
    "q182_edit_verify" ->
      ((s: SparkSession, d: String) => Dedup.q182EditVerify(s, d)),
    "q183_burstiness" ->
      ((s: SparkSession, d: String) => TextAnalysis.q183Burstiness(s, d)),
    "q184_span_novelty" ->
      ((s: SparkSession, d: String) => Dedup.q184SpanNovelty(s, d)),
    "q185_source_sketch" ->
      ((s: SparkSession, d: String) => Dedup.q185SourceSketch(s, d)),
    "q186_split_leakage" ->
      ((s: SparkSession, d: String) => Dedup.q186SplitLeakage(s, d)),
    "q121_setsim_join" -> ((s, dir) => Dedup.q121SetSimJoin(s, dir)),
    "q132_canonical_docs" -> (Dedup.q132CanonicalDocs _),
  )

  val oracleSql: Map[String, String] = Map(
    // q204: the planted repetitive docs are id-arithmetic functions of the
    // base corpus (first 6 words repeated 12x, doc_id + 500000), so the
    // oracle rebuilds the identical corpus; the flagged set must be
    // exactly the 20 planted rows plus any natural doc past 0.2 (none in
    // this fixture family — natural max ~0.04).
    "q204_doc_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, lower(text) AS text FROM documents
        |), planted AS (
        |  SELECT doc_id + 500000 AS doc_id,
        |    array_to_string(flatten(list_transform(generate_series(1, 12),
        |      i -> list_slice(regexp_split_to_array(text, '\s+'), 1, 6))),
        |      ' ') AS text
        |  FROM base WHERE doc_id < 20
        |), corpus AS (
        |  SELECT * FROM base UNION ALL SELECT * FROM planted
        |), w AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM corpus
        |), g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) >= 3 THEN list_transform(
        |      generate_series(1, len(ws) - 2),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |    ELSE [] END AS grams
        |  FROM w
        |)
        |SELECT doc_id,
        |  CAST(len(grams) AS INTEGER) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
        |  CASE WHEN len(grams) > 0
        |    THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |      / len(grams), 6) END AS dup_frac,
        |  coalesce(CASE WHEN len(grams) > 0
        |    THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
        |      / len(grams), 6) >= 0.2 END, false) AS flagged
        |FROM g ORDER BY doc_id""".stripMargin,
    "q58_dedup_stats" ->
      """WITH corpus AS (
        |  SELECT text FROM documents
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id < 30
        |)
        |SELECT count(*) AS n_docs,
        |  count(DISTINCT text) AS n_unique,
        |  count(*) - count(DISTINCT text) AS n_dup_docs,
        |  round(CAST(count(*) - count(DISTINCT text) AS DOUBLE) / count(*), 6)
        |    AS dup_rate
        |FROM corpus""".stripMargin,
    "q52_bpe_token_estimate" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
        |    AS n_pieces,
        |  CAST(list_sum(list_transform(
        |    regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'),
        |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_estimate
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q30_text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, lang, length(text) AS n_chars_measured,
        |    regexp_split_to_array(text, '\s+') AS toks,
        |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang, n_chars_measured,
        |    CAST(len(toks) AS INTEGER) AS n_tokens,
        |    CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','to','in','is','on','for','with'], x))) AS INTEGER)
        |      AS n_stopwords,
        |    CAST(n_punct AS INTEGER) AS n_punct
        |  FROM t
        |)
        |SELECT doc_id, lang, CAST(n_chars_measured AS INTEGER) AS n_chars_measured,
        |  n_tokens, n_stopwords, n_punct,
        |  round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) AS stop_ratio,
        |  round(least(1.0, n_tokens / 200.0) * 0.5
        |    + round(CAST(n_stopwords AS DOUBLE) / n_tokens, 6) * 0.3
        |    + (1.0 - least(1.0, n_punct / 20.0)) * 0.2, 6) AS quality_score
        |FROM s ORDER BY doc_id""".stripMargin,
    "q31_lang_id" ->
      """WITH p AS (
        |  SELECT doc_id, lang, ' ' || text || ' ' AS padded FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    (length(padded) - length(replace(padded, ' the ', ''))) / 5
        |      + (length(padded) - length(replace(padded, ' a ', ''))) / 3 AS score_en,
        |    (length(padded) - length(replace(padded, ' der ', ''))) / 5
        |      + (length(padded) - length(replace(padded, ' und ', ''))) / 5 AS score_de,
        |    (length(padded) - length(replace(padded, ' el ', ''))) / 4
        |      + (length(padded) - length(replace(padded, ' los ', ''))) / 5 AS score_es,
        |    (length(padded) - length(replace(padded, ' le ', ''))) / 4
        |      + (length(padded) - length(replace(padded, ' la ', ''))) / 4 AS score_fr,
        |    (length(padded) - length(replace(padded, ' de ', ''))) / 4
        |      + (length(padded) - length(replace(padded, ' shi ', ''))) / 5 AS score_zh
        |  FROM p
        |)
        |SELECT doc_id, lang,
        |  CASE
        |    WHEN score_en > 0 AND score_en >= score_de AND score_en >= score_es
        |      AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
        |    WHEN score_de > 0 AND score_de >= score_es AND score_de >= score_fr
        |      AND score_de >= score_zh THEN 'de'
        |    WHEN score_es > 0 AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
        |    WHEN score_fr > 0 AND score_fr >= score_zh THEN 'fr'
        |    WHEN score_zh > 0 THEN 'zh'
        |    ELSE 'und' END AS lang_pred,
        |  (CASE
        |    WHEN score_en > 0 AND score_en >= score_de AND score_en >= score_es
        |      AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
        |    WHEN score_de > 0 AND score_de >= score_es AND score_de >= score_fr
        |      AND score_de >= score_zh THEN 'de'
        |    WHEN score_es > 0 AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
        |    WHEN score_fr > 0 AND score_fr >= score_zh THEN 'fr'
        |    WHEN score_zh > 0 THEN 'zh'
        |    ELSE 'und' END) = lang AS is_match
        |FROM s ORDER BY doc_id""".stripMargin,
    "q32_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 30
        |)
        |SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM corpus GROUP BY text
        |ORDER BY canonical_id""".stripMargin,
    // q34: the minhash/LSH near-dup, oracle-checked on a bounded window —
    // a quadratic scan over base ids < 400 (+ planted near-copies) with the
    // exact q121 shingle semantics. Completeness of the banded candidates on
    // this corpus (every qualifying window pair has J >= 0.9) is what makes
    // the oracle equality exact; see q34MinhashNearDup scaladoc.
    "q34_minhash_neardup" -> SharedOracleSql.q34OracleRef,
    // q143 = q34's semantics with the signature side read from the
    // materialized table — the layout must be invisible in the result, so
    // it shares q34's oracle verbatim (the q139/q112 pattern).
    "q143_minhash_neardup_table" -> SharedOracleSql.q34OracleRef,
    // q144/q145: companion oracles for the hash-kernel queries q33/q35
    // (those stay no_oracle — DuckDB can't compute the kernels). The
    // INVARIANT is SQL-statable: a fingerprint/SimHash is a pure function
    // of the text, so a planted exact copy must fingerprint equal (q144)
    // and must surface from the banding pipeline at hamming 0 (q145).
    // The oracle derives the planted pairs from `documents` by the same
    // doc_id arithmetic and states the invariant's required value.
    "q144_fingerprint_planted" ->
      """SELECT doc_id AS orig_id, doc_id + 2000000 AS copy_id,
        |       true AS fp_equal
        |FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 25)
        |ORDER BY orig_id""".stripMargin,
    "q145_simhash_planted" ->
      """SELECT doc_id AS orig_id, doc_id + 2000000 AS copy_id,
        |       0 AS hamming
        |FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 25)
        |ORDER BY orig_id""".stripMargin,
    // q150: incremental near-dup — the deterministic ingest batch (15
    // one-token near-copies + 10 token-reversed new docs, derived by id
    // arithmetic) against the q34/q143 history window. Same quadratic
    // string-shingle oracle device as q34; same completeness premise
    // (qualifying pairs are near-copies, banding miss < 1e-8).
    "q150_incremental_neardup" ->
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
    // q156: rebuild the identical planted-header corpus (pure function of
    // doc_id/source), rediscover headers by (source, 6-token-prefix) df,
    // and report the strip per source — DuckDB list ops mirror the
    // slice/array_join Spark pipeline one-to-one.
    "q156_boilerplate_strip" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'hdr ' || source || ' nav home login search ' || text
        |      ELSE text END AS text
        |  FROM documents
        |), pref AS (
        |  -- fingerprint only docs LONGER than the header width (mirrors
        |  -- the Spark-side rule: sub-width duplicates are not chrome)
        |  SELECT doc_id, source, t,
        |    CASE WHEN len(t) > 6
        |      THEN md5(array_to_string(t[1:6], ' ')) END AS p
        |  FROM (SELECT doc_id, source,
        |          regexp_split_to_array(text, '\s+') AS t FROM docs)
        |), hdrs AS (
        |  SELECT source, p FROM pref WHERE p IS NOT NULL
        |  GROUP BY source, p HAVING count(*) >= 5
        |), marked AS (
        |  SELECT pref.source, len(pref.t) AS n_tok,
        |    (hdrs.p IS NOT NULL) AS is_hdr
        |  FROM pref LEFT JOIN hdrs
        |    ON pref.source = hdrs.source AND pref.p = hdrs.p
        |)
        |SELECT source, count(*) AS n_docs,
        |  count(*) FILTER (is_hdr) AS n_stripped,
        |  CAST(sum(n_tok) AS BIGINT) AS tok_before,
        |  CAST(sum(n_tok - CASE WHEN is_hdr THEN 6 ELSE 0 END) AS BIGINT)
        |    AS tok_after
        |FROM marked GROUP BY source ORDER BY source""".stripMargin,
    // q163: C4-style 8-token-span dedup. The oracle re-derives the spans
    // with the generate_series lateral (q94's device), picks the corpus-wide
    // first occurrence per span text via the same (doc_id, blk) window
    // order, and reassembles survivors with an ordered string_agg.
    "q163_span_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS tk
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, CAST((g.i - 1) / 8 AS INTEGER) AS blk,
        |    array_to_string(tk[g.i:g.i+7], ' ') AS btext
        |  FROM t, UNNEST(generate_series(1, len(tk), 8)) AS g(i)
        |), m AS (
        |  SELECT doc_id, blk, btext,
        |    row_number() OVER (PARTITION BY md5(btext)
        |      ORDER BY doc_id, blk) = 1 AS keep
        |  FROM b
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
        |  CAST(count(*) FILTER (NOT keep) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(btext, ' ' ORDER BY blk) FILTER (keep), '')
        |    AS kept_text
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q164: co-occurrence PMI. Numerator/denominator stay exact BIGINT
    // products so the single double division (then ln) is bit-identical
    // across engines.
    "q164_cooccurrence_pmi" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(text, '\s+') AS tk FROM documents
        |), u AS (
        |  SELECT unnest(tk) AS tok FROM t
        |), uni AS (
        |  SELECT tok, count(*) AS c FROM u GROUP BY tok
        |), tot AS (SELECT count(*) AS n_tok FROM u),
        |pairs AS (
        |  SELECT least(tk[g.i], tk[g.i + d.d]) AS a,
        |    greatest(tk[g.i], tk[g.i + d.d]) AS b
        |  FROM t,
        |    UNNEST(generate_series(1, len(tk))) AS g(i),
        |    UNNEST(generate_series(1, 3)) AS d(d)
        |  WHERE g.i + d.d <= len(tk)
        |), pc AS (
        |  SELECT a, b, count(*) AS c_ab FROM pairs GROUP BY a, b
        |), ptot AS (SELECT count(*) AS n_pair FROM pairs)
        |SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
        |  round(ln(CAST(c_ab * n_tok * n_tok AS DOUBLE)
        |    / CAST(n_pair * ua.c * ub.c AS DOUBLE)), 6) AS pmi
        |FROM pc, tot, ptot
        |JOIN uni ua ON ua.tok = pc.a
        |JOIN uni ub ON ub.tok = pc.b
        |WHERE c_ab >= 5
        |ORDER BY c_ab DESC, a, b LIMIT 30""".stripMargin,
    // q165: cross-source span-overlap matrix. Spans re-derived with the
    // q163 lateral; intersection counted pairwise over distinct
    // (span-md5, source) rows; jaccard is one correctly-rounded BIGINT
    // division in both engines.
    "q165_source_overlap" ->
      """WITH t AS (
        |  SELECT source, regexp_split_to_array(text, '\s+') AS tk
        |  FROM documents
        |), d AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(tk[g.i:g.i+7], ' ')) AS h
        |  FROM t, UNNEST(generate_series(1, len(tk), 8)) AS g(i)
        |), per AS (
        |  SELECT source, count(*) AS n FROM d GROUP BY source
        |)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  count(*) AS inter_spans, pa.n AS n_a, pb.n AS n_b,
        |  round(CAST(count(*) AS DOUBLE)
        |    / (pa.n + pb.n - count(*)), 6) AS jaccard
        |FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
        |JOIN per pa ON pa.source = a.source
        |JOIN per pb ON pb.source = b.source
        |GROUP BY a.source, b.source, pa.n, pb.n
        |ORDER BY inter_spans DESC, source_a, source_b LIMIT 20""".stripMargin,
    // q186: split-leakage audit — the q121 oracle chain, the q93 split
    // rule applied to both pair ids, and a 3x3-key rollup.
    "q186_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
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
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    len(list_intersect(a.sh, b.sh)) AS i, a.n AS na, b.n AS nb
        |  FROM sz a JOIN sz b ON a.doc_id < b.doc_id
        |), pr AS (
        |  SELECT a_id, b_id
        |  FROM p
        |  WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.5
        |), sp AS (
        |  SELECT
        |    CASE WHEN (ascii(substr(md5(CAST(a_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(a_id AS VARCHAR)), 2, 1))) % 100 < 80
        |      THEN 'train'
        |      WHEN (ascii(substr(md5(CAST(a_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(a_id AS VARCHAR)), 2, 1))) % 100 < 90
        |      THEN 'val' ELSE 'test' END AS sa,
        |    CASE WHEN (ascii(substr(md5(CAST(b_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(b_id AS VARCHAR)), 2, 1))) % 100 < 80
        |      THEN 'train'
        |      WHEN (ascii(substr(md5(CAST(b_id AS VARCHAR)), 1, 1)) * 31
        |      + ascii(substr(md5(CAST(b_id AS VARCHAR)), 2, 1))) % 100 < 90
        |      THEN 'val' ELSE 'test' END AS sb
        |  FROM pr
        |)
        |SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
        |  count(*) AS n_pairs,
        |  least(sa, sb) != greatest(sa, sb) AS leaked
        |FROM sp GROUP BY least(sa, sb), greatest(sa, sb)
        |ORDER BY split_a, split_b""".stripMargin,
    // q185: sketched source overlap — q165's oracle as CTE for the
    // exact side; the sketch re-derives md5-u32 minima per (source, j).
    "q185_source_sketch" ->
      """WITH t AS (
        |  SELECT source, regexp_split_to_array(text, '\s+') AS tk
        |  FROM documents
        |), d AS (
        |  SELECT DISTINCT source,
        |    md5(array_to_string(tk[g.i:g.i+7], ' ')) AS h
        |  FROM t, UNNEST(generate_series(1, len(tk), 8)) AS g(i)
        |), per AS (
        |  SELECT source, count(*) AS n FROM d GROUP BY source
        |), ex AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    count(*) AS inter_spans, pa.n AS n_a, pb.n AS n_b,
        |    round(CAST(count(*) AS DOUBLE)
        |      / (pa.n + pb.n - count(*)), 6) AS jaccard
        |  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
        |  JOIN per pa ON pa.source = a.source
        |  JOIN per pb ON pb.source = b.source
        |  GROUP BY a.source, b.source, pa.n, pb.n
        |  ORDER BY inter_spans DESC, source_a, source_b LIMIT 20
        |), c AS (
        |  SELECT source, j.j AS j,
        |    min(CAST(concat('0x', substr(md5(j.j || '_' || h), 1, 8))
        |      AS UBIGINT)) AS mv
        |  FROM d, UNNEST(generate_series(0, 63)) AS j(j)
        |  GROUP BY source, j.j
        |), m AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS BIGINT)
        |      AS matches
        |  FROM c a JOIN c b ON a.j = b.j AND a.source < b.source
        |  GROUP BY a.source, b.source
        |)
        |SELECT ex.source_a, ex.source_b, ex.inter_spans, ex.jaccard,
        |  m.matches, round(CAST(m.matches AS DOUBLE) / 64, 6) AS est_jaccard,
        |  round(abs(round(CAST(m.matches AS DOUBLE) / 64, 6) - ex.jaccard), 6)
        |    AS abs_err
        |FROM ex JOIN m USING (source_a, source_b)
        |ORDER BY ex.source_a, ex.source_b""".stripMargin,
    // q184: per-doc span novelty — q163's span lateral, distinct
    // (hash, doc) rows, per-hash doc counts, per-doc novelty ratio.
    "q184_span_novelty" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS tk
        |  FROM documents
        |), d AS (
        |  SELECT DISTINCT doc_id,
        |    md5(array_to_string(tk[g.i:g.i+7], ' ')) AS h
        |  FROM t, UNNEST(generate_series(1, len(tk), 8)) AS g(i)
        |), s AS (
        |  SELECT h, count(*) AS n_docs_with FROM d GROUP BY h
        |)
        |SELECT d.doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN s.n_docs_with = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unique,
        |  round(CAST(sum(CASE WHEN s.n_docs_with = 1 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS novelty
        |FROM d JOIN s USING (h)
        |GROUP BY d.doc_id
        |ORDER BY novelty, d.doc_id LIMIT 15""".stripMargin,
    // q183: burstiness VMR — exact BIGINT numerator/denominator, one
    // correctly-rounded division.
    "q183_burstiness" ->
      """WITH nd AS (
        |  SELECT count(*) AS n_docs FROM documents
        |), dt AS (
        |  SELECT doc_id, u.term, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_filter(regexp_split_to_array(
        |      lower(text), '[^a-z]+'), x -> x <> '')) AS term
        |    FROM documents) u
        |  GROUP BY doc_id, u.term
        |), t AS (
        |  SELECT term, count(*) AS n_docs_with,
        |    CAST(sum(c) AS BIGINT) AS total,
        |    CAST(sum(c * c) AS BIGINT) AS sum_sq
        |  FROM dt GROUP BY term
        |)
        |SELECT term, n_docs_with, total,
        |  round(CAST(nd.n_docs * sum_sq - total * total AS DOUBLE)
        |    / (nd.n_docs * total), 6) AS vmr
        |FROM t, nd
        |ORDER BY total DESC, term LIMIT 20""".stripMargin,
    // q182: levenshtein re-verify of the q121 pairs — the q121 oracle
    // wrapped as a CTE, plus text-fetch joins on the same planted corpus.
    "q182_edit_verify" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
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
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    len(list_intersect(a.sh, b.sh)) AS i, a.n AS na, b.n AS nb
        |  FROM sz a JOIN sz b ON a.doc_id < b.doc_id
        |), pr AS (
        |  SELECT a_id, b_id,
        |    round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
        |  FROM p
        |  WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.5
        |)
        |SELECT pr.a_id, pr.b_id, pr.jaccard,
        |  CAST(levenshtein(ca.text, cb.text) AS BIGINT) AS lev,
        |  round(1.0 - CAST(levenshtein(ca.text, cb.text) AS DOUBLE)
        |    / greatest(length(ca.text), length(cb.text)), 6) AS edit_sim
        |FROM pr JOIN corpus ca ON ca.doc_id = pr.a_id
        |JOIN corpus cb ON cb.doc_id = pr.b_id
        |ORDER BY pr.a_id, pr.b_id""".stripMargin,
    "q36_ngram_jaccard" ->
      """WITH orig AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents
        |  WHERE doc_id < 20
        |), near AS (
        |  SELECT doc_id, regexp_split_to_array(text || ' xtra', '\s+') AS toks
        |  FROM documents WHERE doc_id < 20
        |), os AS (
        |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS ls
        |  FROM orig
        |), ns AS (
        |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS rs
        |  FROM near
        |)
        |SELECT os.doc_id AS doc_id,
        |  round(CAST(len(list_distinct(list_intersect(ls, rs))) AS DOUBLE)
        |    / len(list_distinct(list_concat(ls, rs))), 6) AS jaccard3
        |FROM os JOIN ns ON os.doc_id = ns.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q79_corpus_curation" ->
      """WITH flagged AS (
        |  SELECT lang, doc_id,
        |    (n_chars BETWEEN 100 AND 20000 AND regexp_matches(text, '[a-z]'))
        |      AS ok_quality,
        |    row_number() OVER (
        |      PARTITION BY text,
        |        (n_chars BETWEEN 100 AND 20000 AND regexp_matches(text, '[a-z]'))
        |      ORDER BY doc_id) AS dedup_rn
        |  FROM documents
        |), f2 AS (
        |  SELECT lang, doc_id, ok_quality,
        |    (ok_quality AND dedup_rn = 1) AS ok_dedup,
        |    (ok_quality AND dedup_rn = 1 AND doc_id % 10 < 3) AS ok_sampled
        |  FROM flagged
        |)
        |SELECT lang, count(*) AS n_raw,
        |  count(*) FILTER (WHERE ok_quality) AS n_quality,
        |  count(*) FILTER (WHERE ok_dedup) AS n_deduped,
        |  count(*) FILTER (WHERE ok_sampled) AS n_sampled
        |FROM f2 GROUP BY lang ORDER BY lang""".stripMargin,
    "q80_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t
        |)
        |SELECT CAST(off // 4096 AS BIGINT) AS bin, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(sum(n_tokens) / 4096.0, 4) AS fill_rate
        |FROM o GROUP BY 1 ORDER BY bin""".stripMargin,
    "q81_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts
        |  FROM documents WHERE doc_id < 100
        |), tokens AS (
        |  SELECT doc_id, i - 1 AS idx, ts[i] AS term
        |  FROM toks, UNNEST(generate_series(1, len(ts))) AS g(i)
        |  WHERE ts[i] <> ''
        |), islands AS (
        |  SELECT doc_id, term,
        |    idx - row_number() OVER (PARTITION BY doc_id, term ORDER BY idx) AS grp
        |  FROM tokens
        |), runs AS (
        |  SELECT doc_id, max(run_len) AS max_run FROM (
        |    SELECT doc_id, term, grp, count(*) AS run_len
        |    FROM islands GROUP BY 1, 2, 3
        |  ) GROUP BY doc_id
        |), stats AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    count(DISTINCT term) AS n_distinct,
        |    round(1.0 - count(DISTINCT term) / CAST(count(*) AS DOUBLE), 4)
        |      AS rep_ratio
        |  FROM tokens GROUP BY doc_id
        |)
        |SELECT s.doc_id AS doc_id, n_tokens, n_distinct, rep_ratio, max_run
        |FROM stats s JOIN runs r ON s.doc_id = r.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q86_decontamination" ->
      """WITH docs3 AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents
        |), sh AS (
        |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
        |    for i in generate_series(1, greatest(len(toks) - 2, 1))]) AS s
        |  FROM docs3
        |), ev AS (
        |  SELECT doc_id AS eval_id, s AS es FROM sh WHERE doc_id < 5
        |), cp AS (
        |  SELECT doc_id AS corpus_id, s AS cs FROM sh WHERE doc_id >= 5
        |), ov AS (
        |  SELECT eval_id, corpus_id,
        |    round(CAST(len(list_intersect(es, cs)) AS DOUBLE) / len(es), 6)
        |      AS containment
        |  FROM ev, cp WHERE len(list_intersect(es, cs)) > 0
        |), r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY eval_id
        |    ORDER BY containment DESC, corpus_id) AS INTEGER) AS rank
        |  FROM ov WHERE containment >= 0.05
        |)
        |SELECT eval_id, rank, corpus_id, containment FROM r WHERE rank <= 3
        |ORDER BY eval_id, rank""".stripMargin,
    "q112_incremental_dedup" ->
      """WITH history AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id, text
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id, text || ' v2'
        |  FROM documents WHERE doc_id < 25
        |),
        |fresh AS (
        |  SELECT b.doc_id, b.text FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM history h WHERE h.text = b.text)
        |)
        |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text
        |FROM fresh GROUP BY text ORDER BY doc_id""".stripMargin,
    // q139 runs the same semantics through the bucketed-history confirm
    // path — the storage layout must be invisible, so it shares q112's
    // oracle verbatim.
    "q139_incremental_dedup_bucketed" ->
      """WITH history AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id, text
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id, text || ' v2'
        |  FROM documents WHERE doc_id < 25
        |),
        |fresh AS (
        |  SELECT b.doc_id, b.text FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM history h WHERE h.text = b.text)
        |)
        |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text
        |FROM fresh GROUP BY text ORDER BY doc_id""".stripMargin,
    // q62: corpus-dedup summary, oracle-checked end-to-end — the quadratic
    // shingle-Jaccard pair set (q121's oracle CTE), undirected closure via
    // a recursive CTE (the pair graph is tiny: components are near-dup
    // clusters), then n_removed = vertices whose component min-label is
    // not themselves. Feasible at the sf0.01 gate (500-doc corpus); at
    // sf0.1 this oracle is quadratic like q121's and is excluded the same
    // way. Completeness premise is the same as q34's: every qualifying
    // pair on this corpus has J >= 0.9, where banding recall is ~1.
    "q62_neardup_corpus" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
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
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM sz a JOIN sz b ON a.doc_id < b.doc_id
        |  WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / (a.n + b.n - len(list_intersect(a.sh, b.sh))), 6) >= 0.5
        |), und AS (
        |  SELECT a_id AS a, b_id AS b FROM p UNION SELECT b_id, a_id FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a WHERE r.a <> u.b
        |), lbl AS (
        |  SELECT a AS id, least(a, min(b)) AS label FROM reach GROUP BY a
        |)
        |SELECT (SELECT count(*) FROM corpus) AS n_before,
        |  (SELECT count(*) FROM corpus)
        |    - (SELECT count(*) FROM lbl WHERE label < id) AS n_after,
        |  (SELECT count(*) FROM lbl WHERE label < id) AS n_removed""".stripMargin,
    "q121_setsim_join" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
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
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    len(list_intersect(a.sh, b.sh)) AS i, a.n AS na, b.n AS nb
        |  FROM sz a JOIN sz b ON a.doc_id < b.doc_id
        |)
        |SELECT a_id, b_id,
        |  round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
        |FROM p
        |WHERE round(CAST(i AS DOUBLE) / (na + nb - i), 6) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
    // Cluster key: the oracle groups by the normalized text itself where the
    // Spark side groups by its sha2 digest — same equivalence classes, the
    // digest is pure shuffle hygiene and never reaches the output.
    "q132_canonical_docs" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |), corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text) FROM base WHERE doc_id < 20
        |  UNION ALL
        |  SELECT doc_id + 2000000, '  ' || text || '  ' FROM base
        |  WHERE doc_id < 10
        |), c AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS ckey
        |  FROM corpus
        |), r AS (
        |  SELECT doc_id, text, ckey,
        |    row_number() OVER (PARTITION BY ckey
        |      ORDER BY length(text) DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY ckey) AS n_members
        |  FROM c
        |)
        |SELECT max(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc_id,
        |  max(n_members) AS n_members,
        |  max(CASE WHEN rn = 1 THEN length(text) END) AS kept_chars,
        |  string_agg(CASE WHEN rn <> 1 THEN doc_id END, ','
        |    ORDER BY doc_id) AS dropped_ids
        |FROM r WHERE n_members > 1
        |GROUP BY ckey ORDER BY 1""".stripMargin,
  )
}
