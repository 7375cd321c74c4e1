"""Invariants for wave 52 (PSI drift, KS two-sample, near-dup provenance)."""

from __future__ import annotations

import math

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _halves(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    a = [r.value for r in ev if r.ts.day <= 15]
    b = [r.value for r in ev if r.ts.day > 15]
    return a, b


def test_psi_matches_numpy(spark):
    rows = REGISTRY["events_psi_drift"].fn(spark, SF_SMOKE).collect()
    a, b = _halves(spark)
    allv = a + b
    lo, hi = min(allv), max(allv)
    width = (hi - lo) / 10
    ca, cb = [0] * 10, [0] * 10
    for v in a:
        ca[min(int((v - lo) // width), 9)] += 1
    for v in b:
        cb[min(int((v - lo) // width), 9)] += 1
    assert len(rows) == 10
    psi = 0.0
    for r in rows:
        assert r.n_ref == ca[r.bin] and r.n_live == cb[r.bin]
        pa = (ca[r.bin] + 1) / (len(a) + 10)
        pb = (cb[r.bin] + 1) / (len(b) + 10)
        want = (pb - pa) * math.log(pb / pa)
        assert abs(r.psi_contrib - want) < 1e-4
        psi += r.psi_contrib
    assert psi >= -1e-9  # PSI is a sum of non-negative terms up to rounding


def test_ks_matches_numpy(spark):
    [r] = REGISTRY["agg_ks_two_sample"].fn(spark, SF_SMOKE).collect()
    a, b = _halves(spark)
    assert (r.n1, r.n2) == (len(a), len(b))
    pooled = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    d = np.abs(f1 - f2)
    assert abs(r.ks_stat - d.max()) < 1e-6
    assert 0.0 <= r.ks_stat <= 1.0
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert abs(r.critical_05 - crit) < 1e-6
    assert r.reject_05 == (r.ks_stat > round(crit, 6) or r.ks_stat > crit)


def test_neardup_by_source_consistent_with_pairs(spark):
    rows = REGISTRY["curation_neardup_by_source"].fn(spark, SF_SMOKE).collect()
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.source
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "source").collect()
    }
    assert sum(r.n_pairs for r in rows) == len(pairs)
    assert abs(sum(r.pair_share for r in rows) - 1.0) < 1e-3
    from collections import defaultdict

    agg = defaultdict(list)
    for p in pairs:
        sa, sb = docs[p.id_a], docs[p.id_b]
        agg[(min(sa, sb), max(sa, sb))].append(p.jaccard)
    for r in rows:
        js = agg[(r.source_lo, r.source_hi)]
        assert r.n_pairs == len(js)
        assert abs(r.avg_jaccard - sum(js) / len(js)) < 1e-4
        assert r.within_source == (r.source_lo == r.source_hi)
