"""Invariants for wave 85 (Benjamini-Hochberg FDR)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _phi_inv_complement(p):
    # inverse survival via bisection against math.erf (test-side only)
    lo, hi = 0.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if (1 - math.erf(mid / math.sqrt(2))) / 1 > p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2


def test_bh_fdr_matches_python(spark):
    rows = sorted(
        REGISTRY["agg_bh_fdr_correction"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.rnk,
    )
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type").collect()
    counts = defaultdict(int)
    for e in ev:
        counts[(e.user_id, e.event_type)] += 1
    types = sorted({e.event_type for e in ev})
    zs = {}
    for t_ in types:
        g1 = np.array(
            [c for (u, tt), c in counts.items() if tt == t_ and u % 2 == 1]
        )
        g0 = np.array(
            [c for (u, tt), c in counts.items() if tt == t_ and u % 2 == 0]
        )
        se = math.sqrt(g1.var() / len(g1) + g0.var() / len(g0))
        zs[t_] = round((g1.mean() - g0.mean()) / se, 6)
    ranked = sorted(zs.items(), key=lambda kv: (-abs(kv[1]), kv[0]))
    assert [r.event_type for r in rows] == [t_ for t_, _ in ranked]
    # thresholds match the exact inverse normal to ~1e-5
    for r in rows:
        # the helper's (1 - erf(z/sqrt2)) IS the two-sided p — pass full alpha
        want = _phi_inv_complement(0.1 * r.rnk / 5)
        assert abs(r.bh_z_threshold - want) < 1e-4
        assert abs(r.z - zs[r.event_type]) < 2e-2
    # step-up: significant set is exactly ranks <= max passing rank
    passing = [r.rnk for r in rows if abs(r.z) >= r.bh_z_threshold]
    k = max(passing) if passing else 0
    for r in rows:
        assert r.significant_fdr == (r.rnk <= k)
    # BH thresholds loosen with rank (step-up shape)
    ths = [r.bh_z_threshold for r in rows]
    assert all(a >= b for a, b in zip(ths, ths[1:]))
    # FDR flag is never more permissive than naive only when k covers it
    for r in rows:
        if r.significant_fdr and r.rnk == 1:
            assert abs(r.z) >= r.bh_z_threshold
