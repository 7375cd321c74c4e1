"""Invariants for wave 123 (k-center coreset, hamming rerank)."""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _load_emb(spark):
    return {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }


def test_kcenter_matches_greedy_python(spark):
    rows = sorted(
        REGISTRY["curation_kcenter_coreset"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.step,
    )
    emb = _load_emb(spark)
    centers = [0]
    md = {i: float(((v - emb[0]) ** 2).sum()) for i, v in emb.items()}
    assert rows[0].center_id == 0 and rows[0].sqdist_at_pick is None
    for k in range(1, 10):
        # tie order: max d, then MIN id
        best_d = max(md.values())
        pick_id = min(i for i, d in md.items() if d == best_d)
        assert rows[k].center_id == pick_id
        assert abs(rows[k].sqdist_at_pick - round(best_d, 6)) < 1e-9
        cv = emb[pick_id]
        for i, v in emb.items():
            md[i] = min(md[i], float(((v - cv) ** 2).sum()))
        centers.append(pick_id)
    # picks are distinct and max-min radius is non-increasing
    assert len(set(r.center_id for r in rows)) == 10
    ds = [r.sqdist_at_pick for r in rows[1:]]
    assert all(a >= b for a, b in zip(ds, ds[1:]))


def test_hamming_rerank_shortlist_contains_exact_top1(spark):
    rows = REGISTRY["sim_hamming_reranked"].fn(spark, SF_SMOKE).collect()
    emb = _load_emb(spark)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(10))
    for qid, lst in by_q.items():
        lst.sort(key=lambda r: r.rank)
        # rerank output is cosine-sorted
        cs = [r.cosine for r in lst]
        assert cs == sorted(cs, reverse=True)
        # every returned neighbor's cosine matches numpy within rounding
        qv = emb[qid]
        for r in lst:
            nv = emb[r.nid]
            cos = float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
            assert abs(r.cosine - round(cos, 6)) < 1e-6
