package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Writes PLANS.md: the formatted physical plan of each headline query
  * at sf0.001 — the reviewable evidence that filters push down, dims
  * broadcast, and exchanges are minimal/reused (PlanSpec asserts these
  * properties; this artifact shows them).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("graft-plans", cores = 4)
    val sf = "/root/testdata/sf0.001"
    val headline = Seq(
      "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
      "q_broadcast_dim", "q_topk_custom", "mon_window_sum",
      "mon_consecutive_failures", "mon_asof_last_success",
      "mon_incident_context", "dedup_minhash_lsh", "dedup_minhash_indexed",
      "ngram_jaccard", "dedup_substring", "dedup_substring_drop",
      "decontaminate_fuzzy",
      // dedup_semantic / dedup_semantic_fixed are omitted like
      // pipeline_train_mix below: centroid collect + bounded-pair stats
      // + the CC fast path all run eagerly at construction, so the
      // dumped plan would show only the final cells-join-components tail
      "ann_brute_topk", "knn_join", "pipeline_curate", "pipeline_curate_v2",
      // pipeline_train_mix / pipeline_train_epochs are omitted: their
      // eager stage pins mean the dumped plan would show only the
      // final pack stage over a checkpoint scan — the per-stage shapes
      // are the C6a/C12/C13/C14 (+C24/C23 for epochs) entries above
      "decontaminate", "pack_sequences", "mix_sample", "boilerplate_frac",
      "q_asof_join", "q_range_join", "q_corr", "domain_cap",
      "shuffle_sequences", "mix_epochs", "mon_ewma", "mon_zscore_outliers",
      "mon_seasonal_deviation",
      // round 7: tfidf_top / text_lm_score / mon_burn_rate /
      // budget_select pin an intermediate eagerly, so their dumps show
      // the post-pin tail (the interesting property — the row-local
      // TokenCounts stage replacing the tf exchange — is the pinned
      // stage's plan, asserted by PlanSpec instead)
      "mon_cusum", "mon_heartbeat_gaps", "q_cube", "q_exists_corr",
      "q_window_range", "text_entropy", "text_readability",
      "mm_scene_cuts",
      // round 8 (text_bm25 is excluded like tfidf_top — its pinned
      // postings stage runs eagerly at construction, so the dump would
      // show only the scoring tail)
      "mon_never_reported", "mon_status_flaps", "q_funnel",
      "q_retention_cohorts", "chunk_documents", "mm_frame_features",
      // round 8 wave 2 (embed_cluster is excluded like dedup_semantic —
      // the cached centroid train runs eagerly at construction)
      "q_rolling_dau", "q_rolling_dau_approx", "q_event_paths",
      "q_profile", "q_copurchase", "mon_cross_corr", "mm_dedup_frames",
      "q_top_movers", "q_heatmap", "ann_filtered", "mm_audio_levels",
      // round 8 wave 3 (mon_gap_fill / corpus_drift / embed_drift /
      // lm_buckets pin their multi-consumer stage eagerly — the
      // zero-re-scan property is PlanSpec's gap-fill audit)
      "split_assign", "split_leak_audit", "mm_shots", "mm_audio_silence",
      "ann_radius",
      // round 8 wave 4
      "mon_window_percentiles", "mon_fleet_health", "mon_mad_outliers",
      "curate_funnel", "q_skew_report", "knn_eval", "dedup_cluster_stats",
      // round 9 (dsir_score / dsir_select / dedup_keep_best /
      // mon_error_pareto pin their multi-consumer stage eagerly — the
      // dumps would show only the post-pin tail; pipeline_embed_search
      // collects its panel at construction)
      "q_returned_customers", "q_nation_trade", "mon_cross_corr_anomalies",
      // round 9 wave 3 (word_cooccurrence / mix_report pin their count
      // frames eagerly; pack_report / q_value_tiers run on the
      // stratifiedPrefixSum machinery whose subtotals collect at
      // construction — the PlanSpec prefix-sum audits cover that shape)
      "q_market_share", "mm_motion_profile", "mon_downtime_sla",
      // round 9 continuation (ann_hybrid pins its postings index per
      // corpus version at construction — the probe-broadcast property
      // is PlanSpec's hybrid audit; ann_mmr's pool re-rank is a typed
      // flatMapGroups over a constant pool)
      "q_late_orders", "q_promo_share", "q_order_count_dist",
      "q_large_orders", "q_idle_customers", "mon_capacity_forecast",
      "oversample_rare", "text_script_profile", "contamination_report",
      // round 9 wave 5: the remaining TPC-H classics + tokenizer stats
      "q_min_cost_supplier", "q_product_profit", "q_top_supplier",
      "q_supplier_counts", "q_small_qty_revenue", "q_disjunctive_revenue",
      "q_blocking_supplier", "text_bpe_pairs", "text_zipf",
      // round 9 waves 7-12 (bpe_train/bpe_apply/knn_clusters/
      // shuffle_audit pin or iterate eagerly at construction — their
      // dumps would show only a post-pin tail; the ensemble's member
      // kernels are the A31/A36/A52 entries above)
      "mon_level_shift", "text_keywords", "length_buckets",
      "mm_training_clips", "mm_quality_gate", "knn_graph",
      "knn_graph_ivf",
      // round 10 (tokenizer_fertility / ann_rerank / embed_cluster_lloyd
      // build or iterate on cached/eager stages at construction —
      // post-pin tails only; curriculum_order / pack_curriculum run on
      // the stratifiedPrefixSum machinery whose subtotals collect at
      // construction, audited by PlanSpec's no-SinglePartition check)
      "q_forecast_revenue", "gopher_rules", "repetition_rules",
      "text_ngram_diversity", "mm_silence_trim", "mm_loudness_norm",
      "mon_error_budget", "embed_outliers", "pipeline_massivetext",
      // round 11 (quality_classifier / budget_select_bpe pin their
      // feature/scored frames eagerly — post-pin tails only; the BPE
      // mix/cap variants build the cached piece frame at construction;
      // pipeline_curate_gated collects its recall report up front).
      // decontaminate_bloom's dump IS the interesting artifact: the
      // corpus gram scan filtered by the codegen'd bloom probe before
      // the confirm join.
      "mon_incident_pairs", "decontaminate_bloom",
      // round 12 (the IVF graph-consumer entries train the quantizer
      // and pin edges eagerly — post-pin tails only; the unigram
      // admission trio builds the cached E32b piece frame at
      // construction). classifier_report's dump IS the artifact: the
      // 7-literal grid broadcast onto the heldout slice, SMJ-free.
      "classifier_report",
      // rounds 13-14 (these landed in PLANS.md by hand last round —
      // r15 folds them into THIS list so regeneration cannot silently
      // drop them again; entries that stage a model/verdict frame
      // eagerly at construction dump their post-pin serve tail, which
      // is the part a reader audits)
      "ann_projected_ivf", "budget_select_calibrated",
      "calibrated_sample", "classifier_calibration", "cluster_budget",
      "cluster_sample", "code_by_source", "data_card",
      "dedup_recall_report_sampled", "knn_graph_recall_sampled",
      "knn_graph_refined", "mix_anneal", "mix_temperature_apply",
      "mm_av_sync", "mm_topk_escalate", "mon_alarm_verify",
      "mon_alarm_verify_curve", "mon_alarm_verify_report",
      "mon_alarm_verify_tuned", "mon_series_search",
      "mon_window_percentiles_approx", "normalize_impact",
      "pipeline_curate_norm", "pipeline_curate_predicted",
      "pipeline_curate_prod", "pipeline_curate_routed",
      "sentiment_by_source", "shard_manifest", "text_code_score",
      "text_normalize", "text_sentiment",
      // round 15 (pipeline_curate_crawl/certified and the lang ledger
      // stage their model/shards eagerly at construction — post-pin
      // tails only, PlanSpec pins the crawl chain's exchange budget;
      // these two are pure lazy plans)
      "text_html_extract", "mm_fragment_gaps",
      // round 16: the robust extractor (one-Project CSE shape the
      // DupGate allowance documents), the mm packers (cost projection
      // + the C63 prefix-sum kernel; adaptive adds only CASE
      // arithmetic), and the media card's three-kernel composition
      "html_extract_robust", "crawl_quarantine_report",
      "mm_pack_interleaved", "mm_pack_adaptive", "mm_pack_report",
      "mm_data_card")
    val sb = new StringBuilder
    sb.append("# Physical plans (sf0.001, formatted explain)\n\n")
    sb.append("Generated by `graft.tools.DumpPlans`; regenerate after plan-")
    sb.append("affecting changes. PlanSpec asserts the load-bearing\n")
    sb.append("properties (pushdown, broadcast, exchange reuse, codegen).\n")
    headline.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      sb.append(s"\n## $name\n\n```\n")
      // normalize run-specific temp paths (the staged LSH index lives
      // in a fresh temp dir per JVM) so regeneration diffs only when a
      // plan actually changes
      sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .replaceAll("graft-([a-z-]+)[0-9]+", "graft-$1<tmp>"))
      sb.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${headline.size} plans)")
    spark.stop()
  }
}
