"""Targeted 8x scale smoke for the round-8 global-window decompositions.

Reuses tools/scale_smoke.py's fixture builders (8x facts with key
offsets, 8x structure-preserving docs) and times ONLY the queries whose
plans changed this round, printing 1x vs 8x ratios. A decomposition that
silently kept a single-partition funnel shows up as a ratio far above
~8 (the frame grows 8x AND serializes); the two-pass forms should track
data growth.

Usage: python tools/r8_smoke.py [--docs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from news_ingestion_data_pipeline_spark import get_spark
from tools.scale_smoke import BASE, OUT, OUT_DOCS, build, build_docs, time_query

FACT_QUERIES = [
    "customer_gini_spend",
    "customer_decile_migration",
    "agg_kruskal_wallis",
    "agg_wilcoxon_signed_rank",
    "events_time_to_convert",
    "events_stratified_att",
    "events_out_of_order_profile",
    "agg_ks_two_sample",
    "agg_fisher_exact_2x2",
    "customer_rfm_segments",
    "events_bradley_terry",
    "lineitem_abc_classification",
    "orders_abc_xyz_grid",
    "agg_mann_whitney_u",
    "agg_cliffs_delta",
    "agg_conformal_interval",
    "events_peak_concurrency",
    "profile_join_key_skew",
]

DOC_QUERIES = [
    "curation_quantile_normalize",
    "curation_quality_token_tradeoff",
    "curation_pack_sequences",
    "text_vocab_coverage",
    "curation_dataset_card",
    "agg_approx_top_k",
    "text_bpe_merge_step",
    "text_textrank_keywords",
    # round-8 new family (embeddings-driven; the 8x docs fixture's
    # per-copy orthogonal transform preserves within-copy dot geometry)
    "influence_tracin_proponents",
    "influence_self_memorization",
    "curation_semantic_decontaminate",
    "rerank_cross_encoder_eval",
]


def run(names, out_dir, builder, tag):
    spark = get_spark(f"r8_smoke_{tag}")
    if not os.path.isdir(out_dir):
        print(f"# building 8x {tag} at {out_dir}", file=sys.stderr)
        builder(spark, 8)
    print(f"{'query':34s} {'1x':>7s} {'8x':>8s} {'ratio':>6s}")
    for name in names:
        time_query(spark, name, "/root/testdata/sf0.001")  # warm the shape
        t1 = time_query(spark, name, BASE)
        t8 = time_query(spark, name, out_dir)
        print(f"{name:34s} {t1:6.2f}s {t8:7.2f}s {t8 / t1:5.1f}x", flush=True)


if __name__ == "__main__":
    if "--docs" in sys.argv:
        run(DOC_QUERIES, OUT_DOCS, build_docs, "docs")
    else:
        run(FACT_QUERIES, OUT, build, "facts")
