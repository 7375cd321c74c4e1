"""Invariants for wave 169 (LSH S-curve calibration)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_scurve_tracks_analytic(spark):
    rows = sorted(
        REGISTRY["dedup_lsh_scurve_eval"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.decile,
    )
    assert rows, "no intersecting pairs at smoke SF"
    # analytic curve is monotone in the decile
    an = [r.analytic_rate for r in rows]
    assert an == sorted(an)
    for r in rows:
        assert 0 <= r.empirical_rate <= 1
        assert r.n_candidates <= r.n_pairs
        # calibration: empirical within a loose absolute band of analytic
        # (sampling noise at small n; top decile must be near-certain)
        if r.n_pairs >= 50:
            assert abs(r.empirical_rate - r.analytic_rate) < 0.15, r
    top = rows[-1]
    if top.decile == 9:
        assert top.empirical_rate >= 0.9
