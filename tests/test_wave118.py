"""Invariants for wave 118 (weighted MinHash + exact weighted Jaccard)."""

from __future__ import annotations

from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _norm_tokens(text):
    import re

    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    return [w for w in re.split(r"\s+", t.strip()) if w]


def test_weighted_jaccard_certificates_exact(spark):
    rows = REGISTRY["dedup_weighted_jaccard_verified"].fn(spark, SF_SMOKE).collect()
    assert rows
    docs = {
        d.doc_id: Counter(_norm_tokens(d.text))
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    for r in rows[:50]:
        ca, cb = docs[r.id_a], docs[r.id_b]
        wmin = sum(min(ca[t], cb[t]) for t in ca.keys() & cb.keys())
        wmax = sum(ca.values()) + sum(cb.values()) - wmin
        assert (r.wmin, r.wmax) == (wmin, wmax)
        assert r.wjaccard_milli == (1000 * wmin) // wmax
        assert r.wjaccard_milli >= 550


def test_weighted_candidates_are_weight_sensitive(spark):
    cand = REGISTRY["dedup_weighted_minhash"].fn(spark, SF_SMOKE).collect()
    assert cand
    assert all(r.n_bands_matched >= 3 for r in cand)
    # every verified survivor must appear in the candidate set
    verified = REGISTRY["dedup_weighted_jaccard_verified"].fn(spark, SF_SMOKE).collect()
    cset = {(r.id_a, r.id_b) for r in cand}
    assert all((v.id_a, v.id_b) in cset for v in verified)
