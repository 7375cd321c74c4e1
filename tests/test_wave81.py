"""Invariants for wave 81 (embedding dim stats, char entropy)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_embedding_dim_stats_match_numpy(spark):
    rows = {r.dim: r for r in REGISTRY["sim_embedding_dim_stats"].fn(spark, SF_SMOKE).collect()}
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    arr = np.array([e.embedding for e in emb], dtype=np.float64).round(9)
    assert set(rows) == set(range(1, 65))
    var_total = arr.var(axis=0).sum()
    share_sum = 0.0
    for d in range(64):
        r = rows[d + 1]
        assert abs(r.mean_val - arr[:, d].mean()) < 1e-5
        assert abs(r.var_val - arr[:, d].var()) < 1e-5
        assert abs(r.var_share - arr[:, d].var() / var_total) < 1e-4
        assert r.dead == (arr[:, d].var() < 1e-4) or abs(arr[:, d].var() - 1e-4) < 1e-6
        share_sum += r.var_share
    assert abs(share_sum - 1.0) < 1e-3


def test_char_entropy_matches_python(spark):
    rows = {r.doc_id: r for r in REGISTRY["text_char_entropy"].fn(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    checked = 0
    for d in docs:
        if not d.text:
            continue
        counts = Counter(d.text.lower())
        n = sum(counts.values())
        h = -sum(
            c * round(math.log2(c / n), 9) for c in counts.values()
        ) / n
        r = rows[d.doc_id]
        assert r.n_chars == n
        assert r.n_distinct_chars == len(counts)
        assert abs(r.entropy_bits_per_char - h) < 1e-4
        ceiling = round(math.log2(max(len(counts), 2)), 9)
        assert abs(r.entropy_efficiency - h / ceiling) < 1e-4
        assert 0.0 <= r.entropy_efficiency <= 1.0 + 1e-9
        checked += 1
    assert checked == len(rows)
