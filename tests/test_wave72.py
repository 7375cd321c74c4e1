"""Invariants for wave 72 (permutation test, Haar energy)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_permutation_test_matches_python(spark):
    [r] = REGISTRY["agg_permutation_test"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value").collect()
    y = defaultdict(float)
    for e in ev:
        y[e.user_id] += e.value
    y = {u: round(v, 6) for u, v in y.items()}
    users = sorted(y)
    obs = np.mean([y[u] for u in users if u % 2 == 1]) - np.mean(
        [y[u] for u in users if u % 2 == 0]
    )
    assert r.n_users == len(users)
    assert abs(r.obs_diff - obs) < 1e-4

    def flip(u, b):
        return int(hashlib.md5(f"{u}#{b}".encode()).hexdigest()[:13], 16) % 2

    diffs = []
    for b in range(64):
        g1 = [y[u] for u in users if flip(u, b) == 1]
        g0 = [y[u] for u in users if flip(u, b) == 0]
        diffs.append(np.mean(g1) - np.mean(g0))
    extreme = sum(1 for d in diffs if round(abs(d), 9) >= round(abs(obs), 9))
    assert abs(r.p_value - (1 + extreme) / 65) < 1e-4
    assert abs(r.mean_abs_perm_diff - np.mean(np.abs(diffs))) < 1e-4
    assert 0.0 < r.p_value <= 1.0


def test_haar_energy_parseval(spark):
    rows = {r.level: r for r in REGISTRY["events_haar_energy"].fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    by_day = defaultdict(list)
    for e in ev:
        by_day[e.ts.strftime("%Y-%m-%d")].append(e.value)
    series = np.array([np.mean(by_day[d]) for d in sorted(by_day)])[:16]
    v = series.copy()
    energies = {}
    for level in range(1, 5):
        a = v[0::2] + v[1::2]
        d = v[0::2] - v[1::2]
        energies[level] = float((d**2).sum())
        v = a
    approx_energy = float((v**2).sum())
    assert set(rows) == {1, 2, 3, 4}
    for level, e in energies.items():
        assert abs(rows[level].energy - e) < max(1e-3, 1e-5 * e), level
        assert rows[level].n_coeffs == 16 >> level
    # Parseval for the unnormalized (sum, diff) butterfly:
    # sum(x^2) = sum_k E_k / 2^k + A^2 / 2^L
    lhs = float((series**2).sum())
    rhs = sum(energies[k] / 2**k for k in energies) + approx_energy / 16
    assert abs(lhs - rhs) < 1e-6 * max(1.0, lhs)
    shares = sum(rows[k].detail_share for k in rows)
    assert abs(shares - 1.0) < 1e-4  # detail shares are normalized
