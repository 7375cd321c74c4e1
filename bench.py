"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is built and fully executed (collect for small results,
count-after-materialize for large ones) with a warm SparkSession; the first
query absorbs JVM/codegen warmup, so a tiny warmup run precedes timing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY


def _steal_jiffies() -> int:
    """Cumulative hypervisor steal time — this box shows sporadic
    multi-minute throttle windows (observed: identical queries 5-40x
    slower mid-suite, fast again after). Reporting the per-run steal
    delta makes a throttled benchmark run self-identifying."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0

#: Headline set: the heavy relational plans + each pipeline/LLM operator
#: family representative. Names must exist in REGISTRY.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "agg_distinct_counts",
    "agg_rollup",
    "join_left_outer",
    "join_theta_range",
    "join_asof",
    "window_topk_per_group",
    "window_running_sum",
    "window_session_10m",
    "window_tumbling_hourly",
    "window_sliding_1h_30m",
    "window_range_frame",
    "q9_profit_by_nation",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "events_funnel_conversion",
    "pipeline_exact_dedup",
    "pipeline_topn_latest",
    "text_quality_score",
    "text_lang_id",
    "text_tfidf_top_terms",
    "text_zscore_by_lang",
    "events_retention_cohorts",
    "text_simhash",
    "text_rolling_hash",
    "dedup_minhash_candidates",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "dedup_embedding_neardup",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "multimodal_binary_stats",
    "curation_decontaminate",
    "curation_chunk_windows",
    "curation_token_estimate",
    "events_gaps_islands",
    "events_first_touch",
    "text_bigrams_top",
    "join_range_banded",
    "window_hourly_uniques",
    "window_running_distinct",
    "events_transition_matrix",
    "curation_repetition_filter",
    "text_bpe_token_count",
    "sim_kmeans_assign",
    "events_path_trigrams",
    "agg_percentile_ranks",
    "sim_gemm_topk",
    "sim_semdedup",
    "join_bloom_prefiltered",
    "events_ewma_smooth",
    "dedup_incremental_minhash",
    "graph_triangle_count",
    "sim_quantized_topk",
    "text_unigram_logprob",
    "agg_rollup_cascade",
    "window_rolling_median",
    "events_cusum_drift",
    "agg_countmin_heavy_hitters",
    "join_record_linkage",
    "storage_zorder_layout",
    "curation_span_dedup",
    "graph_clustering_coeff",
    "events_autocorrelation",
    "graph_kcore_peel",
    "graph_label_propagation",
    "sim_dbscan",
    "customer_survival_km",
    "lineitem_price_index",
    "agg_spearman_corr",
    "text_kneser_ney_bigram",
    "agg_equidepth_histogram",
    "text_oov_rate",
    "curation_quantile_normalize",
    "window_ohlc_resample",
    "orders_growth_accounting",
    "sim_kmeans_update",
    "events_bootstrap_ci",
    "dedup_common_spans",
    "graph_modularity",
    "text_collocation_llr",
    "agg_mann_whitney_u",
    "events_cuped_adjustment",
    "feature_point_in_time_join",
    "curation_length_batching",
    "sim_pq_adc_topk",
    "curation_dedup_decision",
    "events_psi_drift",
    "dedup_url_canonical",
    "curation_contrastive_batches",
    "scan_weblog_grok",
    "text_unicode_clean",
    "dedup_homoglyph_skeleton",
    "curation_l_diversity",
    "multimodal_audio_vad_segments",
    "stream_watermark_late_drop",
    "scalar_timezone_suite",
    "curation_perplexity_filter",
    "curation_instruction_dedup",
    "graph_weighted_sssp",
    "events_markov_removal_effect",
    "multimodal_frame_containment_dedup",
    "sim_pq_train_codebooks",
    "lineitem_croston_forecast",
    "events_uplift_tlearner",
    "scan_fixed_width",
    "pipeline_profile_drift",
    "agg_welch_ttest",
    "graph_personalized_pagerank",
    "curation_language_rebalance",
    "multimodal_audio_resample",
    "subquery_any_all",
    "dedup_weighted_minhash",
    "dedup_weighted_jaccard_verified",
    "text_unigram_viterbi_segment",
    "multimodal_image_patches",
    "graph_bipartite_projection",
    "events_dtw_distance",
    "sim_binary_sign_topk",
    "curation_drop_provenance",
    "curation_kcenter_coreset",
    "sim_hamming_reranked",
    "orders_holt_winters_weekly",
    "scan_csv_multiline",
    "events_shapley_attribution",
    "events_capped_sessionize",
    "agg_simpsons_reversal",
    "text_span_corruption",
    "stream_capped_sessionize",
    "events_regression_discontinuity",
    "agg_poisson_gof",
    "pipeline_crypto_shred",
    "storage_hidden_partition_transforms",
    "events_alert_debounce",
    "text_trending_terms",
    "pipeline_totals_reconciliation",
    "events_interval_union",
    "scalar_business_days",
    "agg_tail_pot_gpd",
    "agg_trimmed_mean",
    "multimodal_image_sharpness",
    "agg_bitmap_audience_overlap",
    "events_mantel_haenszel",
    "pipeline_write_audit_publish",
    "sim_embedding_whitening",
    "agg_energy_distance",
    "scan_gzip_jsonl",
    "agg_gumbel_block_maxima",
    "join_waterfall_enrichment",
    "events_exponential_survival_mle",
    "graph_partition_conductance",
    "text_watermark_greenlist_detect",
    "join_null_aware_anti_in",
    "events_retention_powerlaw_fit",
    "agg_wilcoxon_signed_rank",
    "graph_harmonic_centrality",
    "events_circular_hour_stats",
    "customer_decile_migration",
    "agg_ljung_box",
    "pipeline_audit_hash_chain",
    "sim_jl_projection_distortion",
    "agg_mann_kendall",
    "agg_theil_sen_trend",
    "text_langid_macro_f1",
    "agg_runs_test",
    "agg_kruskal_wallis",
    "agg_levene_test",
    "dedup_cdc_chunks",
    "feature_gini_best_split",
    "feature_chi2_term_selection",
    "agg_cohens_d",
    "agg_cliffs_delta",
    "agg_goodman_kruskal_gamma",
    "agg_cramers_v",
    "pipeline_source_freshness_alert",
    "window_rolling_corr",
    "agg_somers_d",
    "agg_kendall_tau_c",
    "pipeline_sampled_integrity_audit",
    # round 5
    "scan_delta_log_table",
    "scan_delta_time_travel",
    "scan_iceberg_table",
    "scan_iceberg_time_travel",
    "curation_gopher_quality_rules",
    "curation_dsir_importance",
    "scan_iceberg_partition_pruned",
    "agg_kmv_intersection",
    "sim_hybrid_rrf_retrieval",
    "sim_mips_topk",
    "curation_soft_dedup_weights",
    "scan_delta_checkpoint",
    "pipeline_delta_export_merge",
    "pipeline_iceberg_export_merge",
    "stream_delta_append_sink",
    "agg_ddsketch_quantiles",
    "scan_iceberg_equality_deletes",
    "scan_iceberg_positional_deletes",
    "dedup_lsh_scurve_eval",
    # round 6
    "scan_delta_deletion_vectors",
    "scan_iceberg_field_id_rename",
    "scan_iceberg_deflate_metadata",
    "scan_delta_column_mapping",
    "scan_iceberg_metrics_pruned",
    "pipeline_dedup_delta_dv",
    "pipeline_delta_vacuum",
    "scan_iceberg_hidden_partition",
    "pipeline_delta_change_feed",
    "scan_iceberg_incremental",
    "curation_cluster_keep_best",
    "pipeline_delta_optimize",
    "pipeline_iceberg_expire",
    "stream_delta_source_tail",
    "pipeline_delta_restore",
    "pipeline_iceberg_rollback",
    "dedup_embedding_neardup_banded",
    "scan_delta_stats_pruned",
    # round 7
    "scan_iceberg_v3_dv",
    "curation_mixture_doremi",
    "pipeline_iceberg_dv_delete",
    "scan_delta_checkpoint_v2",
    "scan_iceberg_v3_row_lineage",
    "scan_iceberg_branch_tag",
    "pipeline_iceberg_pos_to_dv",
    "pipeline_delta_version_checksum",
    "scan_delta_type_widening",
    "scan_iceberg_default_values",
    "storage_iceberg_metadata_tables",
    "scan_delta_ict_time_travel",
    "pipeline_uniform_dual_publish",
    "scan_delta_row_tracking",
    "stream_iceberg_append_sink",
    "stream_iceberg_source_tail",
    "pipeline_delta_cdf_dv",
    "pipeline_delta_optimize_zorder",
    "scan_delta_partition_pruned",
    "pipeline_iceberg_rewrite_files",
    "pipeline_iceberg_changelog",
    "pipeline_delta_check_constraints",
    "pipeline_uniform_reverse",
    "stream_delta_cdf_tail",
    "pipeline_delta_shallow_clone",
    "pipeline_iceberg_orphan_files",
    "scan_delta_generated_partition",
    "storage_iceberg_puffin_stats",
    "storage_iceberg_partition_stats",
    # round-8: TracIn-lite influence family + retrieval-eval additions
    "influence_tracin_proponents",
    "influence_self_memorization",
    "curation_semantic_decontaminate",
    "rerank_cross_encoder_eval",
    "events_bradley_terry",
    # round-9: RLHF pair construction + multi-judge agreement + evals
    "events_dpo_pairs",
    "agg_krippendorff_alpha",
    "eval_pass_at_k",
    "eval_reward_calibration_ece",
    "eval_rouge2_pairs",
    "events_duel_winrate_matrix",
    "eval_reward_length_bias",
    "eval_best_of_n_reward",
    # round-10: tokenizer EM M-step + length-controlled win rate +
    # per-lang fertility + KTO labels
    "text_unigram_em_mstep",
    "eval_lc_winrate",
    "text_tokenizer_fertility",
    "events_kto_labels",
    "eval_judge_position_bias",
    "curation_sampling_temperature",
    "eval_distinct_ngrams",
    "curation_chinchilla_allocation",
]


WARMUP_SF_DIR = "/root/testdata/sf0.001"
_REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))


def run_query(spark, name: str, sf_dir: str) -> tuple[float, bool]:
    """(seconds, warm_artifacts) — warm is True when the FIRST timed run
    consumed a pre-populated artifact cache (pair table / cluster
    assignment / weighted-LSH candidates), i.e. its number is a
    composition-consumer cost, not a cold end-to-end cost. Recorded so
    cross-round ratio computations can separate cache wins from plan
    wins."""
    from news_ingestion_data_pipeline_spark.plans import artifact_cache
    # Each query measured independently: operators that persist
    # intermediates (LSH band tables, shingle tables) would otherwise
    # accumulate in storage memory across the suite, squeezing execution
    # memory for later shuffles into spill (measured 4s → 55s on the
    # embedding-neardup query once earlier persists piled up).
    spark.catalog.clearCache()
    # Steady-state measurement: run the same plan shape once at the tiny SF
    # first so codegen compilation/planning is paid outside the timed window
    # (a cluster runs a query shape thousands of times; compile-once is the
    # regime that matters). The timed run still plans + executes fully at
    # the target SF.
    if WARMUP_SF_DIR != sf_dir:
        REGISTRY[name].fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    def timed() -> float:
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        # noop sink materializes EVERY output column (count() would let
        # Catalyst prune projections and under-measure) without driver
        # collection.
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    artifact_cache.drain()  # warmup-run events are not attribution

    def drained_warm() -> bool:
        return any(kind == "hit" for _, kind in artifact_cache.drain())

    sec = timed()
    # warm accumulates across EVERY timed run: in min-of-N mode a
    # producer query's first run is the cache miss and runs 2..N are
    # hits, so the recorded minimum is cache-assisted even though run 1
    # wasn't — sampling only the first drain mislabeled exactly those
    # queries as cold (events_dpo_pairs read 0.47 s min with no warm
    # attribution before this fix).
    warm = drained_warm()
    # Heavy queries are where one-off scheduler/IO hiccups hide (observed:
    # a 7s query spiking to 35s exactly once in a 52-query suite on an
    # otherwise idle box). Best-of-two on anything slow enough to matter
    # bounds that noise without re-running the cheap majority.
    # In min-of-N mode the repeat loop below already bounds noise; running
    # the adaptive retry too would make slow queries min-of-(N+1) while the
    # artifact records N — cross-round ratio readers would get an
    # understated sample count for exactly the queries the mode exists for.
    if sec > 3.0 and _REPEATS == 1:
        sec = min(sec, timed())
        warm = drained_warm() or warm
    # SPARK_GRAFT_BENCH_REPEATS=N (default 1): min-of-N timed runs per
    # query — the fallback measurement mode for a box under BURSTY
    # hypervisor steal, where any single pass is contaminated somewhere
    # but each query gets at least one clean window across N passes.
    # The artifact records the mode (meta["repeats"]), so cross-round
    # ratio readers know min-of-N numbers are being compared.
    # RECORDING RULE (r11 verdict item 3): a closing min-of-N artifact
    # whose meta["cpu_steal_sec"] exceeds ~150 s is NOT recordable as a
    # round's reference — both r11 closing attempts ran at 877-1,607
    # steal-s (vs r10's 59.7) and poisoned every cross-round attribution.
    # Wait for a quiet window (tools/quiet_run.sh) and re-run instead.
    for _ in range(_REPEATS - 1):
        sec = min(sec, timed())
        warm = drained_warm() or warm
    return sec, warm


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warmup: tiny end-to-end pass to pay JVM + codegen startup once
    REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
    # warm the OS page cache for the target SF once — the suite measures
    # engine compute, not first-touch disk reads
    for fname in sorted(os.listdir(sf_dir)):
        if fname.endswith(".parquet"):
            with open(os.path.join(sf_dir, fname), "rb") as f:
                while f.read(1 << 22):
                    pass

    steal0 = _steal_jiffies()
    timings: dict[str, float] = {}
    warm_artifacts: list[str] = []
    for name in BENCH_QUERIES:
        sec, warm = run_query(spark, name, sf_dir)
        timings[name] = round(sec, 3)
        if warm:
            warm_artifacts.append(name)
        print(
            f"# {name}: {sec:.2f}s" + (" [warm-artifacts]" if warm else ""),
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    meta = {
        "metric": "headline_suite_total_sec",
        "value": total,
        "unit": "sec",
        # cold-only total: warm-artifact queries (their first timed run
        # consumed a composition cache) excluded, so cross-round ratios
        # can separate cache wins from plan wins (r7 verdict ask)
        "cold_total_sec": round(
            sum(v for n, v in timings.items() if n not in warm_artifacts), 3
        ),
        "n_warm_artifacts": len(warm_artifacts),
        "n_queries": len(timings),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # hypervisor steal during the run, in cpu-seconds (USER_HZ
        # jiffies / 100): nonzero-large means the run was throttled
        # by the host and over-reads every timing
        "cpu_steal_sec": round((_steal_jiffies() - steal0) / 100, 1),
        "repeats": _REPEATS,
    }
    # Full per-query detail goes to a repo file; the stdout one-liner must
    # fit the driver's 2000-char tail buffer or it records parsed: null
    # (BENCH_r02/r03 were truncated exactly this way). Keep the TPC-H-ish
    # headline queries plus the slowest of the rest, dropping fast ones
    # until the line fits.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as f:
        json.dump(
            {**meta, "queries": timings, "warm_artifacts": warm_artifacts},
            f, indent=1, sort_keys=True,
        )
    headline = [n for n in timings if n.startswith("q")]
    rest = sorted(
        (n for n in timings if not n.startswith("q")),
        key=lambda n: -timings[n],
    )
    keep = headline + rest
    # empty-timings / oversized-headline fallbacks: always have a line
    line = json.dumps({**meta, "queries": {}}, separators=(",", ":"))
    while keep:
        cand = json.dumps(
            {**meta, "queries": {n: timings[n] for n in keep}},
            separators=(",", ":"),
        )
        if len(cand) <= 1900:
            line = cand
            break
        keep.pop()  # drop the fastest remaining non-headline query
    if len(line) > 1900:  # even the queries-free meta is too big
        line = json.dumps(
            {"metric": meta.get("metric"), "value": meta.get("value"),
             "unit": "sec"},
            separators=(",", ":"),
        )
    print(line)


if __name__ == "__main__":
    main()
