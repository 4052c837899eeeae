package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream

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
    "q48_asof_join_native" -> (Analytics.q48AsOfJoinNative _),
    "q20_distinct_agg" -> (Analytics.q20DistinctAgg _),
    "q21_approx_distinct" -> (Analytics.q21ApproxDistinct _),
    "q22_events_hourly" -> (Analytics.q22EventsHourly _),
    "q23_streaming_hourly" -> (EventsStream.q23StreamingHourly _),
    "q24_sessions" -> (Analytics.q24Sessions _),
    "q25_sliding_windows" -> (Advanced.q25SlidingWindows _),
    "q26_percentiles" -> (Advanced.q26Percentiles _),
    "q27_cube" -> (Advanced.q27Cube _),
    "q28_partitioned_sink" -> (Advanced.q28PartitionedSink _),
    "q43_embedding_stats" -> (Advanced.q43EmbeddingStats _),
    "q44_token_frequencies" -> (Advanced.q44TokenFrequencies _),
    "q45_interval_join" -> (Advanced.q45IntervalJoin _),
    "q46_grouping_sets" -> (Advanced.q46GroupingSets _),
    "q49_stratified_sample" -> (Advanced.q49StratifiedSample _),
    "q50_json_extract" -> (Advanced.q50JsonExtract _),
    "q53_pivot" -> (Advanced.q53Pivot _),
    "q57_correlated_subquery" -> (Advanced.q57CorrelatedSubquery _),
    "q58_dedup_stats" -> (Dedup.q58DedupStats _),
    "q62_neardup_corpus" -> (Dedup.q62NearDupCorpus _),
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
    "q60_funnel" -> (EventAnalytics.q60Funnel _),
    "q61_retention" -> (EventAnalytics.q61Retention _),
    "q54_unpivot" -> (Advanced.q54Unpivot _),
    "q55_ntile" -> (Advanced.q55Ntile _),
    "q56_stats" -> (Advanced.q56Stats _),
    "q51_media_resize" -> (Multimodal.q51MediaResize _),
    "q52_bpe_token_estimate" -> (TextAnalysis.q52BpeTokenEstimate _),
    "q30_text_stats" -> (TextAnalysis.q30TextStats _),
    "q31_lang_id" -> (TextAnalysis.q31LangId _),
    "q32_exact_dedup" -> (Dedup.q32ExactDedup _),
    "q33_fingerprint" -> (TextAnalysis.q33Fingerprint _),
    "q34_minhash_neardup" -> ((s: SparkSession, d: String) => Dedup.q34MinhashNearDup(s, d)),
    "q35_simhash_neardup" -> (Dedup.q35SimhashNearDup _),
    "q36_ngram_jaccard" -> (Dedup.q36NgramJaccard _),
    "q37_topk_bruteforce" -> ((s: SparkSession, d: String) => Similarity.q37TopKBruteForce(s, d)),
    "q38_ann_lsh" -> ((s: SparkSession, d: String) => Similarity.q38AnnLsh(s, d)),
    "q39_embedding_neardup" -> (Similarity.q39EmbeddingNearDup _),
    "q42_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.q42AnnIvf(s, d)),
    "q47_topk_aggregated" -> ((s: SparkSession, d: String) => Similarity.q47TopKAggregated(s, d)),
    "q40_media_decode" -> (Multimodal.q40MediaDecode _),
    "q41_frame_sample" -> (Multimodal.q41FrameSample _),
    "q73_rolling_interval" -> (Extra.q73RollingInterval _),
    "q74_tfidf" -> (Extra.q74Tfidf _),
    "q75_only_slow_supplier" -> (Extra.q75OnlySlowSupplier _),
    "q76_equi_depth_histogram" -> (Extra.q76EquiDepthHistogram _),
    "q77_filtered_agg" -> (Extra.q77FilteredAgg _),
    "q78_daily_ohlc" -> (Extra.q78DailyOhlc _),
    "q79_corpus_curation" -> (Extra.q79CorpusCuration _),
    "q80_sequence_packing" -> ((s: SparkSession, d: String) => Extra.q80SequencePacking(s, d)),
    "q81_repetition" -> (Extra.q81Repetition _),
    "q82_streaming_sessions" -> (EventsStream.q82StreamingSessions _),
    "q83_heavy_hitters" -> ((s: SparkSession, d: String) => Extra.q83HeavyHitters(s, d)),
    "q84_range_join_bucketed" -> (Extra.q84RangeJoinBucketed _),
    "q85_interval_overlap" -> (Extra.q85IntervalOverlap _),
    "q86_decontamination" -> ((s: SparkSession, d: String) => Dedup.q86Decontamination(s, d)),
    "q87_json_roundtrip" -> (Parity.q87JsonRoundtrip _),
    "q88_orc_roundtrip" -> (Parity.q88OrcRoundtrip _),
    "q89_ratio_to_report" -> (Extra.q89RatioToReport _),
    "q90_variant" -> (Extra.q90Variant _),
    "q91_xml_roundtrip" -> (Parity.q91XmlRoundtrip _),
    "q92_incremental_agg" -> (Extra.q92IncrementalAgg _),
    "q93_train_split" -> (Corpus.q93TrainSplit _),
    "q94_doc_chunks" -> ((s: SparkSession, d: String) => Corpus.q94DocChunks(s, d)),
    "q95_quota_sample" -> ((s: SparkSession, d: String) => Corpus.q95QuotaSample(s, d)),
    "q96_inverted_index" -> (Corpus.q96InvertedIndex _),
    "q97_pii_scrub" -> (Corpus.q97PiiScrub _),
    // Approximate (PQ/ADC) candidates — no SQL oracle, like q38/q42; PqSpec
    // asserts planted-copy recall, recall@5 vs exact, pruning, determinism.
    "q98_ann_pq" -> (Pq.q98AnnPq _),
    "q99_ann_ivfpq" -> (IvfPq.q99AnnIvfPq _),
    "q100_cdc_apply" -> (Extra.q100CdcApply _),
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
    "q112_incremental_dedup" -> (Dedup.q112IncrementalDedup _),
    "q139_incremental_dedup_bucketed" -> (Dedup.q139IncrementalDedupBucketed _),
    "q140_ppm_decode" -> (Multimodal.q140PpmDecode _),
    "q141_wav_decode" -> (Multimodal.q141WavDecode _),
    "q142_video_frames" -> (Multimodal.q142VideoFrames _),
    "q143_minhash_neardup_table" ->
      ((s: SparkSession, d: String) => Dedup.q143MinhashNearDupMaterialized(s, d)),
    "q144_fingerprint_planted" -> (TextAnalysis.q144FingerprintPlanted _),
    "q145_simhash_planted" -> (Dedup.q145SimhashPlantedRecall _),
    "q146_hll_error_bound" -> (Analytics.q146HllErrorBound _),
    "q147_percentile_rank_bound" -> (Analytics.q147PercentileRankBound _),
    "q148_cms_guarantees" ->
      ((s: SparkSession, d: String) => Extra.q148CmsGuarantees(s, d)),
    "q149_ann_recall_floors" -> (Similarity.q149AnnRecallFloors _),
    "q150_incremental_neardup" -> (Dedup.q150IncrementalNearDup _),
    "q151_incremental_embedding_neardup" ->
      (Similarity.q151IncrementalEmbeddingNearDup _),
    "q152_semdedup" -> (SemDedup.q152SemDedup _),
    "q154_temperature_mixing" ->
      ((s: SparkSession, d: String) => Corpus.q154TemperatureMixing(s, d)),
    "q155_corpus_shuffle" ->
      ((s: SparkSession, d: String) => Corpus.q155CorpusShuffle(s, d)),
    "q156_boilerplate_strip" ->
      ((s: SparkSession, d: String) => Corpus.q156BoilerplateStrip(s, d)),
    "q157_streaming_dedup" -> (streaming.EventsStream.q157StreamingDedup _),
    "q158_filter_funnel" ->
      ((s: SparkSession, d: String) => ext.Quality.q158FilterFunnel(s, d)),
    "q159_schema_evolution" -> (Extra.q159SchemaEvolution _),
    "q160_lateness_audit" -> (EventAnalytics.q160LatenessAudit _),
    "q161_binaryfile_ingest" -> (Multimodal.q161BinaryFileIngest _),
    "q162_streaming_mv" -> (streaming.EventsStream.q162StreamingMv _),
    "q163_span_dedup" ->
      ((s: SparkSession, d: String) => Dedup.q163SpanDedup(s, d)),
    "q164_cooccurrence_pmi" ->
      ((s: SparkSession, d: String) => Corpus.q164CooccurrencePmi(s, d)),
    "q165_source_overlap" ->
      ((s: SparkSession, d: String) => Dedup.q165SourceOverlap(s, d)),
    "q166_kmeans" ->
      ((s: SparkSession, d: String) => KMeans.q166KMeans(s, d)),
    "q167_bpe_train" ->
      ((s: SparkSession, d: String) => Bpe.q167BpeTrain(s, d)),
    "q168_bpe_encode" ->
      ((s: SparkSession, d: String) => Bpe.q168BpeEncode(s, d)),
    "q169_vocab_growth" ->
      ((s: SparkSession, d: String) => Corpus.q169VocabGrowth(s, d)),
    "q170_hard_negatives" ->
      ((s: SparkSession, d: String) => Similarity.q170HardNegatives(s, d)),
    "q171_unimax_mixture" ->
      ((s: SparkSession, d: String) => Corpus.q171UnimaxMixture(s, d)),
    "q172_dsir_selection" ->
      ((s: SparkSession, d: String) => ext.Quality.q172DsirSelection(s, d)),
    "q173_jl_projection" ->
      ((s: SparkSession, d: String) => Similarity.q173JlProjection(s, d)),
    "q174_ann_jl" ->
      ((s: SparkSession, d: String) => Similarity.q174AnnJl(s, d)),
    "q175_zipf_fit" ->
      ((s: SparkSession, d: String) => TextAnalysis.q175ZipfFit(s, d)),
    "q176_streaming_kmeans" ->
      (streaming.KmeansMonitor.q176StreamingKmeans(_, _)),
    "q177_feature_hashing" ->
      ((s: SparkSession, d: String) => TextAnalysis.q177FeatureHashing(s, d)),
    "q178_truncation_loss" ->
      ((s: SparkSession, d: String) => Corpus.q178TruncationLoss(s, d)),
    "q179_silhouette" ->
      ((s: SparkSession, d: String) => KMeans.q179Silhouette(s, d)),
    "q180_lexical_diversity" ->
      ((s: SparkSession, d: String) => TextAnalysis.q180LexicalDiversity(s, d)),
    "q181_source_kl" ->
      ((s: SparkSession, d: String) => ext.Quality.q181SourceKl(s, d)),
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
    "q187_raking_weights" ->
      ((s: SparkSession, d: String) => Corpus.q187RakingWeights(s, d)),
    "q188_daily_anomaly" -> (EventAnalytics.q188DailyAnomaly _),
    "q189_dataset_card" ->
      ((s: SparkSession, d: String) => Corpus.q189DatasetCard(s, d)),
    "q190_lexical_cosine" ->
      ((s: SparkSession, d: String) => TextAnalysis.q190LexicalCosine(s, d)),
    "q191_decayed_activity" -> (EventAnalytics.q191DecayedActivity _),
    "q192_attribution" -> (EventAnalytics.q192Attribution _),
    "q193_benford_audit" -> (EventAnalytics.q193BenfordAudit _),
    "q194_ks_drift" ->
      ((s: SparkSession, d: String) => ext.Quality.q194KsDrift(s, d)),
    "q195_cuped_readout" -> (EventAnalytics.q195CupedReadout _),
    "q196_score_calibration" ->
      ((s: SparkSession, d: String) => ext.Quality.q196ScoreCalibration(s, d)),
    "q197_good_turing" ->
      ((s: SparkSession, d: String) => TextAnalysis.q197GoodTuring(s, d)),
    "q198_holdout_perplexity" ->
      ((s: SparkSession, d: String) => ext.Quality.q198HoldoutPerplexity(s, d)),
    "q199_release_manifest" ->
      ((s: SparkSession, d: String) => Corpus.q199ReleaseManifest(s, d)),
    "q200_curation_pipeline" ->
      ((s: SparkSession, d: String) => Corpus.q200CurationPipeline(s, d)),
    "q153_streaming_neardup_ingest" ->
      (streaming.NearDupIngest.q153StreamingNearDupIngest _),
    "q113_skyline" -> (Extra.q113Skyline _),
    "q114_bm25" -> ((s, dir) => Corpus.q114Bm25(s, dir)),
    "q115_lm_quality" -> ((s, dir) => ext.Quality.q115LmQuality(s, dir)),
    "q116_weighted_sample" -> ((s, dir) => ext.Quality.q116WeightedSample(s, dir)),
    "q117_triangles" -> (Extra.q117Triangles _),
    // Sketch rollup — no SQL oracle (DuckDB has no persistable sketch
    // type); merged==direct and error bound asserted in QualitySpec.
    "q118_sketch_rollup" -> (Extra.q118SketchRollup _),
    "q119_markov_transitions" -> (EventAnalytics.q119MarkovTransitions _),
    "q120_char_entropy" -> ((s, dir) => ext.Quality.q120CharEntropy(s, dir)),
    "q121_setsim_join" -> ((s, dir) => Dedup.q121SetSimJoin(s, dir)),
    "q122_market_basket" -> ((s, dir) => Extra.q122MarketBasket(s, dir)),
    "q123_attribution" -> (EventAnalytics.q123Attribution _),
    "q124_skew_report" -> (Extra.q124SkewReport _),
    "q125_hybrid_retrieval" -> ((s, dir) => Corpus.q125HybridRetrieval(s, dir)),
    "q126_winsorize" -> (Extra.q126Winsorize _),
    "q127_group_trend" -> (Extra.q127GroupTrend _),
    "q128_activity_islands" -> (EventAnalytics.q128ActivityIslands _),
    "q129_twap" -> (EventAnalytics.q129Twap _),
    "q130_cumulative_users" -> (EventAnalytics.q130CumulativeUsers _),
    "q131_bloom_lookup" -> (Advanced.q131BloomLookup _),
    "q132_canonical_docs" -> (Dedup.q132CanonicalDocs _),
    "q133_ab_experiment" -> (EventAnalytics.q133AbExperiment _),
    "q134_streaming_left_join" -> (EventsStream.q134StreamingLeftJoin _),
    "q135_rolling_wau" -> (EventAnalytics.q135RollingWau _),
    "q136_basket_concentration" -> (Extra.q136BasketConcentration _),
    "q137_pit_scd2" -> (Advanced.q137PitScd2 _),
    // Sliding sketch window — no SQL oracle (engine-specific sketch, like
    // q21/q118); QualitySpec bounds per-day error vs the exact q135.
    "q138_rolling_wau_sketch" -> (EventAnalytics.q138RollingWauSketch _),
  )

  /** Shared by q18 (broadcast non-equi form) and q84 (bucketized cell
    * equi-join form): identical semantics, one oracle. */
  private val rangeJoinOracleSql: String =
    """SELECT p_partkey, p_size, band
      |FROM part
      |JOIN (VALUES (0, 10, 'S'), (10, 25, 'M'), (25, 40, 'L'), (40, 100, 'XL'))
      |  AS bands(lo, hi, band)
      |  ON p_size >= lo AND p_size < hi
      |ORDER BY p_partkey""".stripMargin

  /** Shared by q24 (batch) and q82 (streaming): identical session
    * semantics, one oracle. */
  private val sessionsOracleSql: String =
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
  private val q34OracleRef: String =
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

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** q166's oracle, shared verbatim by q176 — the streaming monitor's
    * summed micro-batch deltas equal the batch report exactly. */
  private val KmeansOracleSql: String =
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

  def oracleSql: Map[String, String] = Map(
    "q176_streaming_kmeans" -> KmeansOracleSql,
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
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  p_partkey % 7 AS key_mod,
        |  p_retailprice * 1.21 AS price_vat,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  abs(p_size - 25) AS size_dist
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q18_range_join" -> rangeJoinOracleSql,
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
    "q52_bpe_token_estimate" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
        |    AS n_pieces,
        |  CAST(list_sum(list_transform(
        |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'),
        |    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_estimate
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "q22_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    "q24_sessions" -> sessionsOracleSql,
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
    "q28_partitioned_sink" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
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
    "q23_streaming_hourly" ->
      """SELECT date_trunc('hour', ts) AS bucket_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
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
    "q34_minhash_neardup" -> q34OracleRef,
    // q143 = q34's semantics with the signature side read from the
    // materialized table — the layout must be invisible in the result, so
    // it shares q34's oracle verbatim (the q139/q112 pattern).
    "q143_minhash_neardup_table" -> q34OracleRef,
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
    "q149_ann_recall_floors" ->
      """SELECT m.method, q.n_queries, true AS recall_ge_floor
        |FROM (SELECT 'ivf' AS method UNION ALL SELECT 'ivfpq'
        |      UNION ALL SELECT 'lsh' UNION ALL SELECT 'pq') m
        |CROSS JOIN (SELECT count(*) AS n_queries
        |            FROM embeddings WHERE vec_id < 8) q
        |ORDER BY m.method""".stripMargin,
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
        |  SELECT doc_id, source, t,
        |    md5(array_to_string(t[1:6], ' ')) AS p
        |  FROM (SELECT doc_id, source,
        |          regexp_split_to_array(text, '\s+') AS t FROM docs)
        |), hdrs AS (
        |  SELECT source, p FROM pref GROUP BY source, p HAVING count(*) >= 5
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
    // q157: the deduplicated stream IS the events table (fixture ids are
    // unique; the staged duplicates are re-deliveries of existing rows), so
    // the oracle is the plain per-type rollup.
    "q157_streaming_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
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
    // q162: the maintained MV must equal the batch rollup over unique
    // events (the landing dir's duplicates are re-deliveries the dedup
    // stage absorbs).
    "q162_streaming_mv" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
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
    // q166: k-means (k=4), 3 Lloyd iterations unrolled as CTE blocks.
    // Every arithmetic step mirrors the Spark side exactly: 1e-6
    // fixed-point quantization, integer squared distances, (dist, cl)
    // lexicographic tie-break, floor(sum/n) centroid updates, empty
    // clusters keeping their previous centroid via the LEFT JOIN coalesce.
    "q166_kmeans" ->
      KmeansOracleSql,
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
        |  CAST(bit_xor(hi) AS BIGINT) AS xor_hi,
        |  CAST(bit_xor(lo) AS BIGINT) AS xor_lo,
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
        |    CAST(sum(n) OVER () * 1000000000 AS BIGINT)
        |      // (SELECT count(DISTINCT lang) FROM documents) AS cfp,
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
        |    len(list_filter(regexp_split_to_array(text, '\s+'),
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
    "q152_semdedup" ->
      """SELECT vec_id + 2000000 AS dropped_id, vec_id AS kept_id,
        |  1.0 AS cos
        |FROM embeddings WHERE vec_id < 25
        |ORDER BY dropped_id""".stripMargin,
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
    "q82_streaming_sessions" -> sessionsOracleSql,
    "q84_range_join_bucketed" -> rangeJoinOracleSql,
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
    "q87_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q88_orc_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_acctbal > 0 ORDER BY c_custkey""".stripMargin,
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
    "q91_xml_roundtrip" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""".stripMargin,
    // q92: the oracle is the from-scratch recompute the incremental refresh
    // must be indistinguishable from.
    "q92_incremental_agg" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
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
        |  FROM documents
        |), r AS (
        |  SELECT lang, doc_id, n_chars, key_fp,
        |    row_number() OVER (PARTITION BY lang ORDER BY key_fp DESC, doc_id) AS rk
        |  FROM k
        |)
        |SELECT lang, doc_id, n_chars, key_fp, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
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
        |           OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_lex FROM bm),
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
