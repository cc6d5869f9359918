package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, EventAnalytics, Multimodal, Pipeline, Relational, Similarity, Streams, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` has one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` has the DuckDB-equivalent SQL for every query whose
  * semantics are expressible in portable SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2b relational / OLAP core
    "q1_agg" -> Relational.q1Agg _,
    "q2_filter_project" -> Relational.q2FilterProject _,
    "q3_join_agg" -> Relational.q3JoinAgg _,
    "q4_broadcast_join" -> Relational.q4BroadcastJoin _,
    "q5_semi_join" -> Relational.q5SemiJoin _,
    "q6_anti_join" -> Relational.q6AntiJoin _,
    "q7_window_rank" -> Relational.q7WindowRank _,
    "q8_window_running" -> Relational.q8WindowRunning _,
    "q9_topk" -> Relational.q9TopK _,
    "q10_distinct_setops" -> Relational.q10DistinctSetops _,
    "q11_rollup" -> Relational.q11Rollup _,
    "q12_case_expr" -> Relational.q12CaseExpr _,
    "q13_exists_subquery" -> Relational.q13ExistsSubquery _,
    "q14_approx_distinct" -> Relational.q14ApproxDistinct _,
    "q15_quantiles" -> Relational.q15Quantiles _,
    "q16_string_funcs" -> Relational.q16StringFuncs _,
    "q17_datetime_funcs" -> Relational.q17DatetimeFuncs _,
    "q18_having" -> Relational.q18Having _,
    "q19_cross_join_small" -> Relational.q19CrossJoinSmall _,
    "q20_union_all" -> Relational.q20UnionAll _,
    "q21_two_phase_agg" -> Relational.q21TwoPhaseAgg _,
    "q22_grouping_sets" -> Relational.q22GroupingSets _,
    "q23_pivot" -> Relational.q23Pivot _,
    "q24_scalar_subquery" -> Relational.q24ScalarSubquery _,
    "q25_ntile_dense_rank" -> Relational.q25NtileDenseRank _,
    "q26_topk_exec" -> Relational.q26TopkExec _,
    "q27_exact_distinct" -> Relational.q27ExactDistinct _,
    "q28_bloom_semi_join" -> Relational.q28BloomSemiJoin _,
    "q29_quantile_bucket" -> Relational.q29QuantileBucket _,
    "q30_range_join" -> Relational.q30RangeJoin _,
    "q31_correlated_agg" -> Relational.q31CorrelatedAgg _,
    "q32_lateral_topk" -> Relational.q32LateralTopk _,
    "q33_range_frame" -> Relational.q33RangeFrame _,
    "q34_filtered_agg" -> Relational.q34FilteredAgg _,
    "q35_percent_rank" -> Relational.q35PercentRank _,
    "q36_listagg" -> Relational.q36Listagg _,
    "q37_running_distinct" -> Relational.q37RunningDistinct _,
    "q38_merge_upsert" -> Relational.q38MergeUpsert _,
    "q39_percentile_cont" -> Relational.q39PercentileCont _,
    "q40_mode" -> Relational.q40Mode _,
    "q41_unpivot" -> Relational.q41Unpivot _,
    "q42_regr" -> Relational.q42Regr _,
    "q43_gap_fill" -> Relational.q43GapFill _,
    "q44_cube" -> Relational.q44Cube _,
    "q45_intersect" -> Relational.q45Intersect _,
    // §2a event-streaming core (Kafka log model, batch-queryable form)
    "broker_api_versions" -> Streams.brokerApiVersions _,
    "topic_metadata" -> Streams.topicMetadata _,
    "produce_offsets" -> Streams.produceOffsets _,
    "consume_fetch" -> Streams.consumeFetch _,
    "topic_fetch_pushdown" -> Streams.topicFetchPushdown _,
    "topic_partition_stats" -> Streams.topicPartitionStats _,
    "consumer_group_lag" -> Streams.consumerGroupLag _,
    "log_compaction" -> Streams.logCompaction _,
    "retention_expiry" -> Streams.retentionExpiry _,
    "stream_tumbling_agg" -> Streams.tumblingAgg _,
    "stream_sliding_agg" -> Streams.slidingAgg _,
    "stream_session_windows" -> Streams.sessionWindows _,
    "list_offsets_for_times" -> Streams.listOffsetsForTimes _,
    "asof_join" -> Streams.asofJoin _,
    "asof_join_exec" -> Streams.asofJoinExec _,
    "json_props_agg" -> Streams.jsonPropsAgg _,
    "materialized_view_agg" -> Streams.materializedViewAgg _,
    "topic_time_travel" -> Streams.topicTimeTravel _,
    "share_group_drain" -> Streams.shareGroupDrain _,
    "share_group_describe" -> Streams.shareGroupDescribe _,
    // §2h event-stream analytics
    "events_sessionize" -> EventAnalytics.sessionize _,
    "events_inter_event_gaps" -> EventAnalytics.interEventGaps _,
    "events_funnel" -> EventAnalytics.funnel _,
    "events_cohort_retention" -> EventAnalytics.cohortRetention _,
    "events_transition_matrix" -> EventAnalytics.transitionMatrix _,
    "events_rolling_daily" -> EventAnalytics.rollingDaily _,
    "events_attribution" -> EventAnalytics.attribution _,
    "events_spike_days" -> EventAnalytics.spikeDays _,
    "events_anomaly_mad" -> EventAnalytics.anomalyMad _,
    "events_cooccurrence" -> EventAnalytics.cooccurrence _,
    "events_hourly_seasonality" -> EventAnalytics.hourlySeasonality _,
    "events_user_segments" -> EventAnalytics.userSegments _,
    "events_path_conversion" -> EventAnalytics.pathConversion _,
    "events_dau_wau" -> EventAnalytics.dauWau _,
    "events_funnel_latency" -> EventAnalytics.funnelLatency _,
    "events_concentration" -> EventAnalytics.concentration _,
    "events_lifecycle_states" -> EventAnalytics.lifecycleStates _,
    "events_forecast_baseline" -> EventAnalytics.forecastBaseline _,
    "events_changepoint" -> EventAnalytics.changepoint _,
    "events_ab_test" -> EventAnalytics.abTest _,
    // §2e text analysis
    "text_tokens" -> TextAnalysis.textTokens _,
    "text_quality" -> TextAnalysis.textQuality _,
    "text_langid" -> TextAnalysis.textLangid _,
    "text_lang_confusion" -> TextAnalysis.textLangConfusion _,
    "text_fingerprint" -> TextAnalysis.textFingerprint _,
    "text_ngram_stats" -> TextAnalysis.textNgramStats _,
    "text_rare_tokens" -> TextAnalysis.textRareTokens _,
    "text_pii_scrub" -> TextAnalysis.textPiiScrub _,
    "text_repetition" -> TextAnalysis.textRepetition _,
    "text_entropy" -> TextAnalysis.textEntropy _,
    "text_keywords_tfidf" -> ((s: SparkSession, d: String) =>
      TextAnalysis.textKeywordsTfidf(s, d)),
    "text_bpe_train" -> ((s: SparkSession, d: String) =>
      TextAnalysis.textBpeTrain(s, d)),
    "text_quality_classifier" -> TextAnalysis.textQualityClassifier _,
    "text_zipf_slope" -> ((s: SparkSession, d: String) =>
      TextAnalysis.textZipfSlope(s, d)),
    "text_vocab_coverage" -> TextAnalysis.textVocabCoverage _,
    "text_kl_divergence" -> TextAnalysis.textKlDivergence _,
    "text_novelty_curve" -> TextAnalysis.textNoveltyCurve _,
    "text_code_detect" -> TextAnalysis.textCodeDetect _,
    "text_perplexity" -> ((s: SparkSession, d: String) => TextAnalysis.textPerplexity(s, d)),
    "text_perplexity_bigram" -> ((s: SparkSession, d: String) => TextAnalysis.textPerplexityBigram(s, d)),
    "text_bm25_topk" -> ((s: SparkSession, d: String) => TextAnalysis.textBm25TopK(s, d)),
    // §2c deduplication
    "dedup_exact" -> Dedup.dedupExact _,
    "dedup_exact_normalized" -> Dedup.dedupExactNormalized _,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccard _,
    "dedup_minhash_lsh" -> Dedup.dedupMinhashLsh _,
    "dedup_simhash" -> Dedup.dedupSimhash _,
    "dedup_embedding_cosine" -> Dedup.dedupEmbeddingCosine _,
    "dedup_cluster_cc" -> Dedup.dedupClusterCC _,
    "dedup_embedding_cc" -> Dedup.dedupEmbeddingCC _,
    "decontaminate_ngram" -> Dedup.decontaminateNgram _,
    "decontaminate_embedding" -> Dedup.decontaminateEmbedding _,
    "decontaminate_containment" -> Dedup.decontaminateContainment _,
    "dedup_span_exact" -> Dedup.dedupSpanExact _,
    "dedup_threshold_sweep" -> Dedup.dedupThresholdSweep _,
    "dedup_incremental_bloom" -> Dedup.dedupIncrementalBloom _,
    // §2d similarity search
    "ann_bruteforce_topk" -> Similarity.annBruteforceTopk _,
    "ann_hybrid_search" -> Similarity.annHybridSearch _,
    "ann_filtered_topk" -> Similarity.annFilteredTopk _,
    "ann_lsh_topk" -> Similarity.annLshTopk _,
    "ann_ivf_topk" -> Similarity.annIvfTopk _,
    "ann_pq_topk" -> Similarity.annPqTopk _,
    "ann_ivfpq_topk" -> Similarity.annIvfPqTopk _,
    "ann_ivf_kmeans_topk" -> Similarity.annIvfKmeansTopk _,
    "ann_range_search" -> Similarity.annRangeSearch _,
    "ann_mips_topk" -> Similarity.annMipsTopk _,
    "graph_pagerank" -> ((s: SparkSession, d: String) =>
      Similarity.graphPagerank(s, d)),
    "emb_quantize_int8" -> Similarity.embQuantizeInt8 _,
    "emb_dim_stats" -> Similarity.embDimStats _,
    "knn_pairs" -> Similarity.knnPairs _,
    "ann_recall_audit" -> Similarity.annRecallAudit _,
    // §2f multimodal plumbing (decode stubbed)
    "mm_features" -> Multimodal.mmFeatures _,
    "mm_phash_dedup" -> Multimodal.mmPhashDedup _,
    "mm_audio_energy" -> Multimodal.mmAudioEnergy _,
    "mm_frame_pipeline" -> Multimodal.mmFramePipeline _,
    "mm_scene_cuts" -> Multimodal.mmSceneCuts _,
    "mm_phash_hamming" -> Multimodal.mmPhashHamming _,
    // §2g end-to-end training-data pipeline compositions
    "pipeline_clean_corpus" -> Pipeline.cleanCorpus _,
    "pipeline_train_test_split" -> Pipeline.trainTestSplit _,
    "pipeline_seq_packing" -> Pipeline.seqPacking _,
    "pipeline_stratified_sample" -> Pipeline.stratifiedSample _,
    "pipeline_token_budget" -> Pipeline.tokenBudget _,
    "pipeline_dataset_card" -> Pipeline.datasetCard _,
    "pipeline_data_mixture" -> Pipeline.dataMixture _,
    "pipeline_mixture_epochs" -> ((s: SparkSession, d: String) =>
      Pipeline.mixtureEpochs(s, d)),
    "pipeline_global_shuffle" -> ((s: SparkSession, d: String) => Pipeline.globalShuffle(s, d)),
    "docs_chunking" -> Pipeline.docsChunking _,
    "pipeline_e2e_corpus" -> Pipeline.pipelineE2ECorpus _,
    "pipeline_quality_report" -> Pipeline.qualityReport _,
    "pipeline_dedup_survivors" -> Pipeline.dedupSurvivors _,
    "pipeline_span_scrub" -> Pipeline.spanScrub _,
    "pipeline_curriculum" -> Pipeline.curriculum _,
    "pipeline_contamination_matrix" -> Pipeline.contaminationMatrix _
  )

  def oracleSql: Map[String, String] =
    Oracles.relational ++ OraclesStreams.streams ++ OraclesPipeline.pipeline ++
      OraclesEvents.events
}
