"""Invariants for wave 161 (MIPS reduction, soft dedup weights)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_mips_transform_preserves_rank(spark):
    rows = REGISTRY["sim_mips_topk"].fn(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert sorted(by_q) == [0, 1, 2, 3, 4]
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, 11))
        # dot order and transformed-cosine order agree (the reduction)
        dots = [r.dot for r in rs]
        cost = [r.cos_t for r in rs]
        assert dots == sorted(dots, reverse=True)
        assert cost == sorted(cost, reverse=True)
        # cos_t = dot / (M * |q|): positive dot -> positive cos_t
        for r in rs:
            assert (r.dot > 0) == (r.cos_t > 0)


def test_soft_dedup_weights_semantics(spark):
    out = {r.doc_id: r for r in
           REGISTRY["curation_soft_dedup_weights"].fn(spark, SF_SMOKE).collect()}
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    deg = {}
    for p in pairs:
        deg[p.id_a] = deg.get(p.id_a, 0) + 1
        deg[p.id_b] = deg.get(p.id_b, 0) + 1
    assert len(out) == 500
    for doc_id, r in out.items():
        assert r.n_near == deg.get(doc_id, 0)
        assert abs(r.weight - round(1.0 / (1 + r.n_near), 6)) < 1e-12
        assert r.eff_tokens <= r.n_tokens + 1e-9
    # near-dups exist in the fixture corpus, so weights must discriminate
    assert any(r.n_near > 0 for r in out.values())
    assert any(r.n_near == 0 for r in out.values())
