"""Invariants for wave 111 (weighted SSSP, Markov removal effect)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_sssp_seeds_zero_and_triangle_inequality_vs_bfs(spark):
    dist = {
        r.user_id: r.dist
        for r in REGISTRY["graph_weighted_sssp"].fn(spark, SF_SMOKE).collect()
    }
    assert dist, "seed set reaches at least itself"
    for uid, d in dist.items():
        if uid % 50 == 0:
            assert d == 0
        else:
            assert d > 0
    # every weighted distance is bounded below by cheapest-edge * hops
    # and above by 1000 * hops (edge costs are in [1, 500] given ns>=2)
    hops = {
        r.user_id: r.dist
        for r in REGISTRY["graph_bfs_distances"].fn(spark, SF_SMOKE).collect()
    }
    for uid, d in dist.items():
        if uid in hops and hops[uid] > 0:
            assert d <= 500 * hops[uid]


def test_removal_effect_base_dominates(spark):
    rows = REGISTRY["events_markov_removal_effect"].fn(spark, SF_SMOKE).collect()
    channels = {r.channel for r in rows}
    assert "purchase" not in channels and "__base__" not in channels
    assert len(rows) == 4
    for r in rows:
        # removing a channel can only lose probability mass
        assert 0.0 <= r.removal_effect <= 1.0 + 1e-9
        assert 0.0 <= r.p_removed <= 1.0
