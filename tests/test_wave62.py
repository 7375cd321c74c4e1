"""Invariants for wave 62 (chi-square independence, dedup decision)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_chi_square_matches_numpy(spark):
    [r] = REGISTRY["agg_chi_square_independence"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type").collect()
    obs = defaultdict(int)
    for e in ev:
        obs[(e.event_type, e.ts.weekday())] += 1
    rows = sorted({k[0] for k in obs})
    cols = sorted({k[1] for k in obs})
    O = np.array([[obs.get((a, b), 0) for b in cols] for a in rows], dtype=float)
    E = O.sum(axis=1, keepdims=True) * O.sum(axis=0, keepdims=True) / O.sum()
    # the engine sums only over OBSERVED cells; with this dense fixture
    # every cell is observed, so the statistics coincide
    assert (O > 0).all()
    chi2 = float(((O - E) ** 2 / E).sum())
    assert r.n == int(O.sum())
    assert r.dof == (len(rows) - 1) * (len(cols) - 1)
    assert abs(r.chi2 - chi2) < max(1e-3, 1e-5 * chi2)
    v = (chi2 / (O.sum() * min(len(rows) - 1, len(cols) - 1))) ** 0.5
    assert abs(r.cramers_v - v) < 1e-5
    assert 0.0 <= r.cramers_v <= 1.0


def test_dedup_decision_consistent_with_sources(spark):
    rows = REGISTRY["curation_dedup_decision"].fn(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    pairs = REGISTRY["dedup_ngram_jaccard"].fn(spark, SF_SMOKE).collect()
    near_losers = {p.id_b for p in pairs}
    for r in rows:
        assert r.near_dup == (r.doc_id in near_losers)
        if r.exact_dup:
            assert r.decision == "drop:exact"
        elif r.near_dup:
            assert r.decision == "drop:near"
        else:
            assert r.decision == "keep"
    # keepers must survive: for every dropped near-dup, its pair's lower
    # id must not itself be transitively dropped as 'near' for the same
    # pair (the min side of a pair is never in near_losers for that pair)
    kept = {r.doc_id for r in rows if r.decision == "keep"}
    assert kept, "some documents must survive"
