"""Invariants for wave 146 (Mann-Kendall, Theil-Sen)."""

from __future__ import annotations

import math
from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _series(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    from datetime import date

    counts = Counter()
    for o in orders:
        m = date(o.o_orderdate.year, o.o_orderdate.month, 1)
        counts[(m - date(1970, 1, 1)).days] += 1
    return sorted(counts.items())


def test_mann_kendall_matches_python(spark):
    row = REGISTRY["agg_mann_kendall"].fn(spark, SF_SMOKE).collect()[0]
    series = _series(spark)
    xs = [x for _, x in series]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs)
    tie_adj = sum(t * (t - 1) * (2 * t + 5) for t in ties.values() if t > 1)
    var = (n * (n - 1) * (2 * n + 5) - tie_adj) / 18
    z = ((s - 1) if s > 0 else (s + 1) if s < 0 else 0) / math.sqrt(var) if s != 0 else 0.0
    assert row.n_points == n
    assert row.mk_s == s
    assert abs(row.mk_var - var) < 1e-9
    assert abs(row.mk_z - z) < 1e-9


def test_theil_sen_matches_python(spark):
    row = REGISTRY["agg_theil_sen_trend"].fn(spark, SF_SMOKE).collect()[0]
    series = _series(spark)
    slopes = sorted(
        (
            (xs2 - xs1) / (t2 - t1),
            t1,
            t2,
        )
        for i, (t1, xs1) in enumerate(series)
        for (t2, xs2) in series[i + 1 :]
    )
    ms = [m for m, _, _ in slopes]
    np_ = len(ms)
    if np_ % 2 == 1:
        b = ms[(np_ - 1) // 2]
    else:
        b = (ms[np_ // 2 - 1] + ms[np_ // 2]) / 2
    xs = sorted(x for _, x in series)
    ts = sorted(t for t, _ in series)

    def med(v):
        k = len(v)
        return v[k // 2] if k % 2 else (v[k // 2 - 1] + v[k // 2]) / 2

    assert row.n_points == len(series)
    assert abs(row.theil_sen_slope - b) < 1e-12
    assert abs(row.theil_sen_intercept - (med(xs) - b * med(ts))) < 1e-9
