package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B: relational / OLAP core
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplier _),
    "q_broadcast_dim" -> (Relational.qBroadcastDim _),
    "q_semi_join" -> (Relational.qSemiJoin _),
    "q_anti_join" -> (Relational.qAntiJoin _),
    "q_window_rank" -> (Relational.qWindowRank _),
    "q_rollup" -> (Relational.qRollup _),
    "q_percentiles" -> (Relational.qPercentiles _),
    "q_distinct_agg" -> (Relational.qDistinctAgg _),
    "q_conditional_agg" -> (Relational.qConditionalAgg _),
    "q_union_except" -> (Relational.qUnionExcept _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_approx_percentiles" -> (Relational.qApproxPercentiles _),
    "q_topk_custom" -> (Relational.qTopKCustom _),
    "q_intersect" -> (Relational.qIntersect _),
    "q_datetime" -> (Relational.qDatetime _),
    "q_pivot" -> (Relational.qPivot _),
    // A: telemetry / monitoring (the reference's surface)
    "mon_registry_lookup" -> (Monitoring.registryLookup _),
    "mon_latest_status" -> (Monitoring.latestStatus _),
    "mon_window_sum" -> (Monitoring.windowSum _),
    "mon_window_stats" -> (Monitoring.windowStats _),
    "mon_consecutive_failures" -> (Monitoring.consecutiveFailures _),
    "mon_sessionize" -> (Monitoring.sessionize _),
    "mon_uptime_ratio" -> (Monitoring.uptimeRatio _),
    "mon_alert_windows" -> (Monitoring.alertWindows _),
    "mon_escalation_batch" -> (Monitoring.escalationBatch _),
    "mon_top_error_devices" -> (Monitoring.topErrorDevices _),
    "mon_json_props" -> (Monitoring.jsonProps _),
    "mon_asof_last_success" -> (Monitoring.asofLastSuccess _),
    "mon_escalation_windowed" -> (Monitoring.escalationWindowed _),
    "mon_incident_retries" -> ((s: SparkSession, d: String) =>
      Monitoring.incidentRetries(s, d)),
    "mon_value_histogram" -> (Monitoring.valueHistogram _),
    "mon_moving_avg" -> (Monitoring.movingAvg _),
    "mon_rate_of_change" -> (Monitoring.rateOfChange _),
    "mon_incident_context" -> (Monitoring.incidentContext _),
    "mon_top_error_devices_approx" -> ((s: SparkSession, d: String) =>
      Monitoring.topErrorDevicesApprox(s, d)),
    "mon_mttr" -> (Monitoring.mttr _),
    "q_string_agg" -> (Relational.qStringAgg _),
    "q_salted_join" -> (Relational.qSaltedJoin _),
    "q_bloom_join" -> (Relational.qBloomJoin _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_scalar_subquery" -> (Relational.qScalarSubquery _),
    // C: dedup
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_minhash_lsh" -> (Dedup.dedupMinhashLsh _),
    "dedup_minhash_indexed" -> (Dedup.dedupMinhashIndexed _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_simhash_indexed" -> (Dedup.dedupSimhashIndexed _),
    "ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_embedding" -> (Dedup.dedupEmbedding _),
    "dedup_semantic" -> ((s: SparkSession, d: String) => Dedup.dedupSemantic(s, d)),
    "dedup_semantic_fixed" -> ((s: SparkSession, d: String) =>
      Dedup.dedupSemanticFixed(s, d)),
    "dedup_substring" -> (Dedup.dedupSubstring _),
    "dedup_substring_scrub" -> (Dedup.dedupSubstringScrub _),
    "dedup_substring_drop" -> (Dedup.dedupSubstringDrop _),
    // D: similarity search
    "ann_brute_topk" -> ((s: SparkSession, d: String) => Similarity.annBruteTopK(s, d)),
    "ann_brute_int8" -> ((s: SparkSession, d: String) => Similarity.annBruteInt8(s, d)),
    "ann_lsh" -> ((s: SparkSession, d: String) => Similarity.annLsh(s, d)),
    "ann_ivf" -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "knn_join" -> ((s: SparkSession, d: String) => Similarity.knnJoin(s, d)),
    "vec_norms" -> (Similarity.vecNorms _),
    "ann_recall" -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    // F: multimodal
    "mm_manifest" -> (Multimodal.mmManifest _),
    "mm_frame_sample" -> (Multimodal.mmFrameSample _),
    "mm_codec_stats" -> (Multimodal.mmCodecStats _),
    "mm_frame_features" -> (Multimodal.mmFrameFeatures _),
    "mm_resize" -> (Multimodal.mmResize _),
    // A12 batch replay of the streaming state machine (same kernel).
    // ts → epoch micros + consec_fails → BIGINT for the oracle hash
    // (SURVEY §4: never emit raw timestamps; match DuckDB count types).
    "mon_escalation_replay" -> ((s: SparkSession, d: String) =>
      graft.streaming.HealthMonitor.replayBatch(s, d).toDF()
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.expr("unix_micros(ts)").as("ts_us"),
          org.apache.spark.sql.functions.col("action"),
          org.apache.spark.sql.functions.col("consec_fails").cast("long")
            .as("consec_fails"))
        .orderBy("user_id", "ts_us", "action")),
    // C+E composition: training-data curation pipeline
    "pipeline_curate" -> (Curation.pipelineCurate _),
    "pipeline_curate_full" -> (Curation.curate _),
    "pipeline_curate_v2" -> (Curation.pipelineCurateV2 _),
    "decontaminate" -> (Curation.decontamQuery _),
    "decontaminate_fuzzy" -> (Curation.decontamFuzzyQuery _),
    "pack_sequences" -> (Curation.packSequencesQuery _),
    "mix_sample" -> (Curation.mixSampleQuery _),
    "mix_epochs" -> (Curation.mixEpochsQuery _),
    "shuffle_sequences" -> (Curation.shuffleSequencesQuery _),
    "domain_cap" -> (Curation.domainCapQuery _),
    "q_asof_join" -> (Joins.asofJoinQuery _),
    "q_range_join" -> (Joins.rangeJoinQuery _),
    "quality_rank_cut" -> (Curation.qualityRankCutQuery _),
    "pipeline_train_mix" -> ((s: SparkSession, d: String) =>
      Curation.pipelineTrainMix(s, d)),
    // E: text analysis
    "text_tokens" -> (TextAnalysis.textTokens _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "text_langid" -> (TextAnalysis.textLangId _),
    "text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "word_freq_topk" -> (TextAnalysis.wordFreqTopK _),
    "tfidf_top" -> ((s: SparkSession, d: String) => TextAnalysis.tfIdfTop(s, d)),
    "text_repetition" -> (TextAnalysis.textRepetition _),
    "text_pii_scrub" -> (TextAnalysis.textPiiScrub _),
    "word_freq_topk_approx" -> ((s: SparkSession, d: String) =>
      TextAnalysis.wordFreqTopKApprox(s, d)),
    "corpus_stats" -> (TextAnalysis.corpusStats _),
    "text_lm_score" -> (TextAnalysis.textLmScore _),
    "boilerplate_frac" -> ((s: SparkSession, d: String) =>
      TextAnalysis.boilerplateFrac(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Relational.q1PricingSummarySql,
    "q3_shipping_priority" -> Relational.q3ShippingPrioritySql,
    "q5_local_supplier" -> Relational.q5LocalSupplierSql,
    "q_broadcast_dim" -> Relational.qBroadcastDimSql,
    "q_semi_join" -> Relational.qSemiJoinSql,
    "q_anti_join" -> Relational.qAntiJoinSql,
    "q_window_rank" -> Relational.qWindowRankSql,
    "q_rollup" -> Relational.qRollupSql,
    "q_percentiles" -> Relational.qPercentilesSql,
    "q_distinct_agg" -> Relational.qDistinctAggSql,
    "q_conditional_agg" -> Relational.qConditionalAggSql,
    "q_union_except" -> Relational.qUnionExceptSql,
    "q_topk_custom" -> Relational.qTopKCustomSql,
    "q_intersect" -> Relational.qIntersectSql,
    "q_datetime" -> Relational.qDatetimeSql,
    "q_pivot" -> Relational.qPivotSql,
    "mon_registry_lookup" -> Monitoring.registryLookupSql,
    "mon_latest_status" -> Monitoring.latestStatusSql,
    "mon_window_sum" -> Monitoring.windowSumSql,
    "mon_window_stats" -> Monitoring.windowStatsSql,
    "mon_consecutive_failures" -> Monitoring.consecutiveFailuresSql,
    "mon_sessionize" -> Monitoring.sessionizeSql,
    "mon_uptime_ratio" -> Monitoring.uptimeRatioSql,
    "mon_alert_windows" -> Monitoring.alertWindowsSql,
    "mon_escalation_batch" -> Monitoring.escalationBatchSql,
    "mon_top_error_devices" -> Monitoring.topErrorDevicesSql,
    "mon_json_props" -> Monitoring.jsonPropsSql,
    "mon_asof_last_success" -> Monitoring.asofLastSuccessSql,
    "mon_escalation_windowed" -> Monitoring.escalationWindowedSql,
    "mon_incident_retries" -> Monitoring.incidentRetriesSql,
    "mon_value_histogram" -> Monitoring.valueHistogramSql,
    "mon_moving_avg" -> Monitoring.movingAvgSql,
    "mon_rate_of_change" -> Monitoring.rateOfChangeSql,
    "mon_incident_context" -> Monitoring.incidentContextSql,
    "mon_mttr" -> Monitoring.mttrSql,
    "q_string_agg" -> Relational.qStringAggSql,
    "q_salted_join" -> Relational.qSaltedJoinSql,
    "q_bloom_join" -> Relational.qBloomJoinSql,
    "q_grouping_sets" -> Relational.qGroupingSetsSql,
    "q_scalar_subquery" -> Relational.qScalarSubquerySql,
    "mm_manifest" -> Multimodal.mmManifestSql,
    "mm_codec_stats" -> Multimodal.mmCodecStatsSql,
    "mm_resize" -> Multimodal.mmResizeSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "dedup_semantic_fixed" -> Dedup.dedupSemanticFixedSql,
    "dedup_substring" -> Dedup.dedupSubstringSql,
    "dedup_substring_scrub" -> Dedup.dedupSubstringScrubSql,
    "dedup_substring_drop" -> Dedup.dedupSubstringDropSql,
    "ann_brute_topk" -> Similarity.annBruteTopKSql,
    "knn_join" -> Similarity.knnJoinSql,
    "vec_norms" -> Similarity.vecNormsSql,
    "pipeline_curate" -> Curation.pipelineCurateSql,
    "decontaminate" -> Curation.decontamSql,
    "decontaminate_fuzzy" -> Curation.decontamFuzzySql,
    "pack_sequences" -> Curation.packSequencesSql,
    "mix_sample" -> Curation.mixSampleSql,
    "mix_epochs" -> Curation.mixEpochsSql,
    "shuffle_sequences" -> Curation.shuffleSequencesSql,
    "domain_cap" -> Curation.domainCapSql,
    "q_asof_join" -> Joins.asofJoinSql,
    "q_range_join" -> Joins.rangeJoinSql,
    "quality_rank_cut" -> Curation.qualityRankCutSql,
    "pipeline_train_mix" -> Curation.pipelineTrainMixSql,
    "boilerplate_frac" -> TextAnalysis.boilerplateFracSql,
    "pipeline_curate_v2" -> Curation.pipelineCurateV2Sql,
    "text_tokens" -> TextAnalysis.textTokensSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "word_freq_topk" -> TextAnalysis.wordFreqTopKSql,
    "text_repetition" -> TextAnalysis.textRepetitionSql,
    "text_pii_scrub" -> TextAnalysis.textPiiScrubSql,
    "corpus_stats" -> TextAnalysis.corpusStatsSql,
    "tfidf_top" -> TextAnalysis.tfIdfTopSql,
    "text_lm_score" -> TextAnalysis.textLmScoreSql,
    "mon_escalation_replay" -> graft.streaming.HealthMonitor.replaySql,
  )
}
