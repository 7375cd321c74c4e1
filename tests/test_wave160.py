"""Invariants for wave 160 (KMV intersection, hybrid RRF retrieval)."""

from __future__ import annotations

import hashlib
import re

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _h01(k: str) -> float:
    return int(hashlib.md5(k.encode()).hexdigest()[:15], 16) / float(1 << 60)


def test_kmv_intersection_matches_python(spark):
    row = REGISTRY["agg_kmv_intersection"].fn(spark, SF_SMOKE).collect()[0]
    from news_ingestion_data_pipeline_spark.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    import datetime

    def day(ts):
        return (
            datetime.datetime.fromtimestamp(ts / 1_000_000_000, datetime.UTC)
            .strftime("%Y-%m-%d")
            if isinstance(ts, int)
            else ts.strftime("%Y-%m-%d")
        )

    sets = {"click": set(), "view": set()}
    for r in ev:
        if r.event_type in sets:
            sets[r.event_type].add(f"{r.user_id}@{day(r.ts)}")
    a, b = sets["click"], sets["view"]
    assert row.exact_a == len(a)
    assert row.exact_b == len(b)
    assert row.exact_intersection == len(a & b)
    # replay the sketch algebra
    ska = sorted(_h01(k) for k in a)[:32]
    skb = sorted(_h01(k) for k in b)[:32]
    merged = sorted(set(ska) | set(skb))[:32]
    m_both = sum(1 for h in merged if h in set(ska) and h in set(skb))
    jac = m_both / len(merged)
    u_est = len(merged) if len(merged) < 32 else 31 / merged[-1]
    assert abs(row.jaccard_est - round(jac, 4)) < 1e-12
    assert abs(row.intersection_est - round(jac * u_est, 4)) < 1e-12
    # the estimate should be in the neighborhood of truth
    if len(a & b) > 0:
        assert 0 < row.intersection_est


def test_hybrid_rrf_fuses_both_modalities(spark):
    out = REGISTRY["sim_hybrid_rrf_retrieval"].fn(spark, SF_SMOKE).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(by_q) == [0, 1, 2, 3, 4]
    for q, rows in by_q.items():
        assert len(rows) == 10
        ranks = sorted(r.fused_rank for r in rows)
        assert ranks == list(range(1, 11))
        # fused scores non-increasing with rank
        srt = sorted(rows, key=lambda r: r.fused_rank)
        for x, y in zip(srt, srt[1:]):
            assert x.rrf >= y.rrf
        # a doc ranked #1 by both rankers would score 2/(60+1); every rrf
        # must be positive and below that ceiling
        for r in rows:
            assert 0 < r.rrf <= 2 / 61 + 1e-12
