"""Invariants for wave 61 (ANOVA, coverage radius)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_anova_matches_scipy_formula(spark):
    [r] = REGISTRY["events_anova_weekday"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    groups = defaultdict(list)
    for e in ev:
        groups[e.ts.weekday()].append(e.value)
    k = len(groups)
    n = sum(len(g) for g in groups.values())
    grand = sum(sum(g) for g in groups.values()) / n
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups.values())
    ssw = sum(sum((x - np.mean(g)) ** 2 for x in g) for g in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.k_groups, r.n) == (k, n)
    assert (r.df_between, r.df_within) == (k - 1, n - k)
    assert abs(r.f_stat - f) < max(1e-3, 1e-4 * f)
    assert abs(r.eta_squared - ssb / (ssb + ssw)) < 1e-4
    assert 0.0 <= r.eta_squared <= 1.0
    assert r.f_stat >= 0.0


def test_coverage_radius_matches_numpy(spark):
    [r] = REGISTRY["sim_coverage_radius"].fn(spark, SF_SMOKE).collect()
    sel = {
        x.neighbor_id
        for x in REGISTRY["sim_mmr_diversified"].fn(spark, SF_SMOKE).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {e.vec_id: np.array(e.embedding, dtype=np.float64) for e in emb}
    best = []
    for vid, v in vecs.items():
        if vid in sel:
            continue
        best.append(
            max(
                round(
                    float(
                        v @ vecs[s] / (np.linalg.norm(v) * np.linalg.norm(vecs[s]))
                    ),
                    6,
                )
                for s in sel
            )
        )
    assert r.k_selected == len(sel) == 5
    assert r.n_covered_corpus == len(best)
    assert abs(r.min_coverage - min(best)) < 1e-6
    assert abs(r.mean_coverage - sum(best) / len(best)) < 1e-5
    assert abs(
        r.frac_above_half - sum(1 for b in best if b >= 0.5) / len(best)
    ) < 1e-6
    assert r.min_coverage <= r.mean_coverage
