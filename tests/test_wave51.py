"""Invariants for wave 51 (LSH recall eval, join-skew profile,
k-anonymity, Theil decomposition)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_lsh_recall_bounds_and_macro(spark):
    rows = REGISTRY["sim_lsh_recall_eval"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_hit <= r.n_exact <= 5
        assert abs(r.recall - round(r.n_hit / r.n_exact, 4)) < 1e-9
    macro = sum(r.recall for r in rows) / len(rows)
    # the AND-OR multi-probe construction was measured at ~0.9 recall;
    # anything below 0.5 means the index or the eval broke
    assert macro >= 0.5, macro


def test_join_key_skew_matches_python(spark):
    rows = REGISTRY["profile_join_key_skew"].fn(spark, SF_SMOKE).collect()
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_partkey").collect()
    counts: dict = defaultdict(int)
    for r in li:
        counts[r.l_partkey] += 1
    pairs = {k: n * n for k, n in counts.items()}
    total = sum(pairs.values())
    expect = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.l_partkey, r.est_pairs) for r in rows] == expect
    cum = 0
    for r in rows:
        cum += r.est_pairs
        assert abs(r.share - round(r.est_pairs / total, 6)) < 1e-9
        assert abs(r.cum_share - round(cum / total, 6)) < 1e-9


def test_k_anonymity_covers_all_docs(spark):
    rows = REGISTRY["curation_k_anonymity"].fn(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.k for r in rows) == n_docs
    for r in rows:
        assert r.at_risk == (r.k < 5)
        assert r.k >= 1


def test_theil_decomposition_reconstructs_total(spark):
    rows = REGISTRY["agg_theil_decomposition"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    ys = [r.o_totalprice for r in orders]
    mu = sum(ys) / len(ys)
    t_total = sum((y / mu) * math.log(y / mu) for y in ys) / len(ys)
    # income-share-weighted within + between must reconstruct total Theil
    recon = sum(r.income_share * r.theil_within + r.between_contrib for r in rows)
    assert abs(recon - t_total) < 1e-3, (recon, t_total)
    assert abs(sum(r.income_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.theil_within >= -1e-9  # Theil is non-negative
