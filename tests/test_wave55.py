"""Invariants for wave 55 (point-in-time join, Mann-Whitney U, power)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_point_in_time_join_matches_python(spark):
    rows = REGISTRY["feature_point_in_time_join"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append(o)
    got = {r.o_orderkey: r for r in rows}
    assert len(got) == len(orders)
    for cust, os_ in by_cust.items():
        for o in os_:
            d0 = o.o_orderdate.toordinal()
            in_frame = [
                p for p in os_ if 0 <= d0 - p.o_orderdate.toordinal() <= 90
            ]
            r = got[o.o_orderkey]
            assert r.prior_orders_90d == len(in_frame) - 1
            want = sum(round(p.o_totalprice, 2) for p in in_frame) - round(
                o.o_totalprice, 2
            )
            assert abs(r.prior_spend_90d - want) < 1e-6
            # leakage safety: the feature never includes the row itself
            assert r.prior_orders_90d >= 0


def test_mann_whitney_matches_scipy_formula(spark):
    [r] = REGISTRY["agg_mann_whitney_u"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    a = np.array([e.value for e in ev if e.ts.day <= 15])
    b = np.array([e.value for e in ev if e.ts.day > 15])
    pooled = np.concatenate([a, b])
    order = pooled.argsort(kind="mergesort")
    ranks = np.empty(len(pooled))
    # midranks with ties
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r1 = ranks[: len(a)].sum()
    u1 = r1 - len(a) * (len(a) + 1) / 2
    assert (r.n1, r.n2) == (len(a), len(b))
    assert abs(r.u1 - u1) < 1e-2
    assert abs(r.auc - u1 / (len(a) * len(b))) < 1e-5
    assert 0.0 <= r.auc <= 1.0
    # z consistent with scipy's tie-corrected normal approximation
    n = len(a) + len(b)
    _, counts = np.unique(pooled, return_counts=True)
    tie = (counts**3 - counts).sum()
    var = len(a) * len(b) / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - len(a) * len(b) / 2) / math.sqrt(var)
    assert abs(r.z - z) < 1e-4


def test_power_analysis_monotone_and_formula(spark):
    rows = REGISTRY["events_power_analysis"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("value").collect()
    vals = np.array([e.value for e in ev])
    mean, var = vals.mean(), vals.var()
    assert [r.rel_mde for r in rows] == [0.01, 0.02, 0.05, 0.10]
    prev = None
    for r in rows:
        assert abs(r.metric_mean - mean) < 1e-3
        assert abs(r.metric_var - var) < max(1e-3, 1e-5 * var)
        want = math.ceil(
            2 * var * (1.959963984540054 + 0.8416212335729143) ** 2
            / (r.rel_mde * mean) ** 2
        )
        assert abs(r.n_per_arm - want) <= 1
        if prev is not None:
            assert r.n_per_arm < prev  # larger MDE needs fewer samples
        prev = r.n_per_arm
        assert r.feasible_now == (2 * r.n_per_arm <= len(vals))
