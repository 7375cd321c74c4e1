"""Invariants for wave 122 (binary sign top-k, drop provenance)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_binary_topk_matches_numpy_hamming(spark):
    import numpy as np

    rows = REGISTRY["sim_binary_sign_topk"].fn(spark, SF_SMOKE).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    bits = {i: (v > 0) for i, v in emb.items()}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == set(range(10))
    for qid, lst in by_q.items():
        dists = sorted(
            (int((bits[qid] ^ b).sum()), nid)
            for nid, b in bits.items()
            if nid != qid
        )[:5]
        got = [(r.hamming, r.nid) for r in sorted(lst, key=lambda r: r.rank)]
        assert got == dists
        # ranks are 1..5, distances nondecreasing
        assert [r.rank for r in sorted(lst, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]


def test_drop_provenance_partitions_corpus(spark):
    rows = REGISTRY["curation_drop_provenance"].fn(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs
    verdicts = {r.verdict for r in rows}
    assert verdicts <= {"empty", "too_short", "junk_digits", "exact_duplicate", "kept"}
    assert "kept" in verdicts
    # first-gate semantics: anything labeled too_short really is short
    for r in rows:
        if r.verdict == "too_short":
            assert r.n_tokens < 10
        if r.verdict == "kept":
            assert r.n_tokens >= 10
