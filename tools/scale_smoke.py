"""Scale smoke: do the headline plans scale ~linearly when the facts grow 8×?

Builds /tmp/spark_graft_scale8 by unioning sf0.1's fact tables 8 times with
key offsets (each copy joins/sessionizes within itself — same join
selectivity, 8× the rows; dims are shared), then times a query set at 1×
and 8× and prints the ratios. A plan that would die at 100 TB (quadratic
pair growth, driver collect, single-partition sort) shows up here as a
ratio far above ~8.

Document/dedup ops get their own mode (``--docs``): naive replication
manufactures a pathological every-doc-has-8-near-dups corpus, so each
copy is instead transformed by a structure-preserving bijection —
text through a per-copy character cipher (a character bijection maps
5-gram shingle sets bijectively, so WITHIN-copy Jaccard/minhash
structure is exactly preserved while cross-copy overlap collapses to
noise), embeddings through a per-copy diagonal ±1 orthogonal transform
((Dx)·(Dy) = x·y, so within-copy cosine geometry is exact while
cross-copy dots decorrelate). The result is 8 independent same-shape
corpora in one table: duplicate counts, candidate pairs and bucket
structure all grow ~linearly, which is the scaling question.

Usage: python tools/scale_smoke.py [n_copies]
       python tools/scale_smoke.py --docs [n_copies]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY

BASE = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale8"
KEY_OFFSET = 1 << 33

#: fact table → columns to offset per copy (keys that must stay
#: copy-local so joins/sessions keep their selectivity)
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "events": ["event_id", "user_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part", "documents", "embeddings"]

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    "window_session_10m",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_gaps_islands",
    "agg_percentile_ranks",
    "agg_countmin_heavy_hitters",
    "agg_kmv_distinct",
    "storage_zorder_layout",
    "events_autocorrelation",
    "window_rolling_slope",
    "events_attribution_ushape",
    "events_funnel_windowed",
    "customer_survival_km",
    "orders_cohort_ltv",
    "graph_kcore_peel",
    "graph_label_propagation",
    "lineitem_price_index",
    "agg_spearman_corr",
    "agg_equidepth_histogram",
    "feature_target_encode_loo",
    "events_bootstrap_ci",
    "events_psi_drift",
    "agg_ks_two_sample",
    "events_changepoint_binseg",
    "window_gap_fill_interp",
    "graph_modularity",
    "agg_kmv_union_merge",
    "agg_theil_decomposition",
    "storage_partition_stats",
    "profile_join_key_skew",
    "events_cuped_adjustment",
    "events_cuped_two_arm",
    "agg_permutation_test",
    "events_group_sequential",
    "agg_mutual_information",
    "agg_rolling_origin_cv",
    "agg_hdr_latency_percentiles",
    "pipeline_referential_integrity",
    "events_haar_energy",
    "agg_spc_individuals_chart",
    "events_forecast_reconciliation",
    "join_asof_tolerance",
    "orders_repeat_purchase_curve",
    "agg_mcnemar_paired",
    "events_anova_weekday",
    "agg_chi_square_independence",
    "agg_ks_two_sample",
    "scalar_timezone_suite",
    "graph_weighted_sssp",
    "events_markov_removal_effect",
    "lineitem_croston_forecast",
    "events_uplift_tlearner",
    "scan_fixed_width",
    "pipeline_profile_drift",
    "agg_welch_ttest",
    "graph_personalized_pagerank",
    "events_dtw_distance",
    "graph_bipartite_projection",
    "orders_holt_winters_weekly",
    "subquery_any_all",
    "events_shapley_attribution",
    "events_capped_sessionize",
    "agg_simpsons_reversal",
    "events_regression_discontinuity",
    "agg_poisson_gof",
    "events_alert_debounce",
    "text_trending_terms",
    "pipeline_totals_reconciliation",
    "events_interval_union",
    "scalar_business_days",
    "agg_tail_pot_gpd",
    "agg_trimmed_mean",
    "agg_bitmap_audience_overlap",
    "events_mantel_haenszel",
    "agg_energy_distance",
    "agg_gumbel_block_maxima",
    "join_waterfall_enrichment",
    "events_exponential_survival_mle",
    "graph_partition_conductance",
    "text_watermark_greenlist_detect",
    "join_null_aware_anti_in",
    "events_retention_powerlaw_fit",
    "agg_wilcoxon_signed_rank",
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
    # round-5 additions (fact-table queries only; documents/embeddings
    # are DIMS in this harness - their scaling evidence is the
    # sf0.01 -> sf0.1 bench ratio)
    "agg_kmv_intersection",
    "stream_delta_append_sink",
    "agg_ddsketch_quantiles",
    # round-8 global-window decompositions (fact-table side)
    "customer_gini_spend",
    "events_time_to_convert",
    "events_stratified_att",
    "events_out_of_order_profile",
    "agg_fisher_exact_2x2",
    # round-9: the remaining r8 rewrites, enrolled from the one-off
    # tools/r8_smoke.py so their 0.9-2.3x evidence re-measures every round
    "customer_rfm_segments",
    "events_bradley_terry",
    "lineitem_abc_classification",
    "orders_abc_xyz_grid",
    "agg_mann_whitney_u",
    "agg_conformal_interval",
    "events_peak_concurrency",
    # round-9 new family (events-driven)
    "events_dpo_pairs",
    "agg_krippendorff_alpha",
    "eval_pass_at_k",
    "events_duel_winrate_matrix",
    "eval_best_of_n_reward",
    # round-10 (events-driven)
    "events_kto_labels",
    "eval_judge_position_bias",
]


OUT_DOCS = "/tmp/spark_graft_scale8_docs"

#: the expensive dedup/similarity family (documents/embeddings-driven)
DOC_QUERIES = [
    "dedup_ngram_jaccard",
    "curation_soft_dedup_weights",
    "curation_dedup_decision",
    "dedup_weighted_jaccard_verified",
    "dedup_minhash_candidates",
    "dedup_minhash_verified",
    "dedup_simhash_hamming",
    "dedup_connected_clusters",
    "dedup_embedding_neardup",
    "sim_lsh_topk",
    "sim_cosine_topk",
    "text_bpe_token_count",
    "curation_cluster_keep_best",
    "pipeline_dedup_delta_dv",
    "dedup_embedding_neardup_banded",
    "curation_mixture_doremi",
    # round-8 global-window decompositions (documents side)
    "curation_quantile_normalize",
    "text_textrank_keywords",
    # round-9: enrolled from the one-off tools/r8_smoke.py — the r8
    # rewrites and the r8-new embeddings family (the 8x docs fixture's
    # per-copy orthogonal transform preserves within-copy dot geometry)
    "curation_quality_token_tradeoff",
    "curation_pack_sequences",
    "text_vocab_coverage",
    "curation_dataset_card",
    "agg_approx_top_k",
    "text_bpe_merge_step",
    "influence_tracin_proponents",
    "influence_self_memorization",
    "curation_semantic_decontaminate",
    "rerank_cross_encoder_eval",
    # round-9 (embeddings/documents-driven)
    "eval_reward_calibration_ece",
    "eval_rouge2_pairs",
    "eval_reward_length_bias",
    # round-10 (documents/embeddings-driven)
    "text_unigram_em_mstep",
    "eval_lc_winrate",
    "text_tokenizer_fertility",
    "curation_sampling_temperature",
    "eval_distinct_ngrams",
    "curation_chinchilla_allocation",
]

_AL = "abcdefghijklmnopqrstuvwxyz"


def build_docs(spark, n_copies: int) -> None:
    """OUT_DOCS = documents/embeddings replicated n× through structure-
    preserving bijections (see module docstring); facts and small dims
    copied 1× so every registered query still runs."""
    from news_ingestion_data_pipeline_spark.tables import load_table

    docs = load_table(spark, BASE, "documents")
    copies = []
    for i in range(n_copies):
        rot = _AL[i % 26:] + _AL[: i % 26]
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * KEY_OFFSET)
        ).withColumn(
            "text",
            F.translate(
                F.col("text"), _AL + _AL.upper(), rot + rot.upper()
            ),
        )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    out.write.mode("overwrite").parquet(f"{OUT_DOCS}/documents.parquet")

    emb = load_table(spark, BASE, "embeddings")
    copies = []
    for i in range(n_copies):
        # diagonal +-1 orthogonal transform keyed by (copy, dim):
        # within-copy dot products exact, cross-copy decorrelated
        sign = lambda idx, i=i: F.when(  # noqa: E731
            F.crc32(F.concat(F.lit(f"ss{i}_"), idx.cast("string"))) % 2
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        # plain closure capture: the lambda is evaluated eagerly inside
        # withColumn, and a default arg would bump its arity past the
        # (element, index) signature F.transform expects
        c = emb.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * KEY_OFFSET)
        ).withColumn(
            "embedding",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, idx: (x * sign(idx)).cast("float"),  # noqa: B023
            ),
        )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionAll(c)
    out.write.mode("overwrite").parquet(f"{OUT_DOCS}/embeddings.parquet")

    for name in list(FACTS) + [
        d for d in DIMS if d not in ("documents", "embeddings")
    ]:
        load_table(spark, BASE, name).write.mode("overwrite").parquet(
            f"{OUT_DOCS}/{name}.parquet"
        )


def main_docs() -> None:
    args = [a for a in sys.argv[1:] if a != "--docs"]
    n_copies = int(args[0]) if args else 8
    spark = get_spark("scale_smoke_docs")
    print(f"# building {n_copies}x docs/embeddings at {OUT_DOCS}",
          file=sys.stderr)
    build_docs(spark, n_copies)
    print(f"{'query':34s} {'1x':>7s} {'8x':>8s} {'ratio':>6s}")
    for name in DOC_QUERIES:
        time_query(spark, name, "/root/testdata/sf0.001")  # warm the shape
        t1 = time_query(spark, name, BASE)
        t8 = time_query(spark, name, OUT_DOCS)
        print(f"{name:34s} {t1:6.2f}s {t8:7.2f}s {t8 / t1:5.1f}x")


def build(spark, n_copies: int) -> None:
    from news_ingestion_data_pipeline_spark.tables import load_table

    for name, keys in FACTS.items():
        df = load_table(spark, BASE, name)
        copies = []
        for i in range(n_copies):
            c = df
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_OFFSET))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    for name in DIMS:
        load_table(spark, BASE, name).write.mode("overwrite").parquet(
            f"{OUT}/{name}.parquet"
        )


def time_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("scale_smoke")
    print(f"# building {n_copies}x facts at {OUT}", file=sys.stderr)
    build(spark, n_copies)
    print(f"{'query':34s} {'1x':>7s} {'8x':>8s} {'ratio':>6s}")
    for name in QUERIES:
        time_query(spark, name, "/root/testdata/sf0.001")  # warm the shape
        t1 = time_query(spark, name, BASE)
        t8 = time_query(spark, name, OUT)
        print(f"{name:34s} {t1:6.2f}s {t8:7.2f}s {t8 / t1:5.1f}x")


if __name__ == "__main__":
    if "--docs" in sys.argv:
        main_docs()
    else:
        main()
