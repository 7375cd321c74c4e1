"""Invariants for wave 87 (NDCG eval)."""

from __future__ import annotations

import math

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_ndcg_matches_numpy(spark):
    rows = {r.query_id: r for r in REGISTRY["sim_ndcg_eval"].fn(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {e.vec_id: np.array(e.embedding, dtype=np.float64) for e in emb}
    labels = {e.vec_id: e.label for e in emb}
    disc = [round(1.0 / math.log2(r + 1), 9) for r in range(1, 6)]
    assert set(rows) == {v for v in vecs if v < 10}
    for qid in rows:
        qv = vecs[qid]
        scored = sorted(
            (
                -round(
                    float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 6
                ),
                vid,
            )
            for vid, v in vecs.items()
            if vid != qid
        )
        top = [vid for _, vid in scored[:5]]
        rels = [1 if labels[v] == labels[qid] else 0 for v in top]
        dcg = sum(r_ * d for r_, d in zip(rels, disc))
        n_rel = sum(rels)
        idcg = sum(disc[:n_rel])
        r = rows[qid]
        assert r.n_relevant_in_topk == n_rel
        assert abs(r.dcg - dcg) < 1e-6
        assert abs(r.idcg - idcg) < 1e-6
        want = 0.0 if idcg == 0 else dcg / idcg
        assert abs(r.ndcg - want) < 1e-6
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9  # ideal is an upper bound
