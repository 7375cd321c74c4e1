"""Invariants for wave 80 (triplet violations)."""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_triplet_violations_match_numpy(spark):
    rows = {r.anchor_id: r for r in REGISTRY["sim_triplet_violations"].fn(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {e.vec_id: np.array(e.embedding, dtype=np.float64) for e in emb}
    labels = {e.vec_id: e.label for e in emb}
    anchors = [v for v in vecs if v % 37 == 0]
    checked = 0
    for a in anchors:
        av = vecs[a]
        pos, neg = None, None
        for o, v in vecs.items():
            if o == a:
                continue
            cs = round(
                float(av @ v / (np.linalg.norm(av) * np.linalg.norm(v))), 6
            )
            if labels[o] == labels[a]:
                pos = cs if pos is None else max(pos, cs)
            else:
                neg = cs if neg is None else max(neg, cs)
        if pos is None or neg is None:
            assert a not in rows
            continue
        r = rows[a]
        assert abs(r.pos_sim - pos) < 1e-9
        assert abs(r.neg_sim - neg) < 1e-9
        assert abs(r.sim_margin - round(pos - neg, 6)) < 1e-9
        assert r.violated == (pos < neg + 0.05)
        assert r.anchor_label == labels[a]
        checked += 1
    assert checked == len(rows)
    assert checked > 0
