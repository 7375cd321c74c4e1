"""Invariants for wave 148 (Kruskal-Wallis, Brown-Forsythe)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _groups(spark):
    per = defaultdict(list)
    for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect():
        per[o.o_orderpriority].append(round(o.o_totalprice, 2))
    return per


def test_kruskal_wallis_matches_scipy_formula(spark):
    row = REGISTRY["agg_kruskal_wallis"].fn(spark, SF_SMOKE).collect()[0]
    per = _groups(spark)
    allv = sorted(v for vs in per.values() for v in vs)
    n = len(allv)
    # average ranks
    rank_of = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        rank_of[allv[i]] = round((i + 1 + j) / 2, 6)
        i = j
    sum_r2n = 0.0
    for g, vs in per.items():
        rj = sum(rank_of[v] for v in vs)
        sum_r2n += round(rj * rj / len(vs), 6)
    from collections import Counter

    ties = Counter(allv)
    tie_adj = sum(t**3 - t for t in ties.values() if t > 1)
    h = (12.0 / (n * (n + 1)) * sum_r2n - 3 * (n + 1)) / (
        1 - tie_adj / (n**3 - n)
    )
    assert row.k_groups == 5 and row.n_total == n
    assert abs(row.kw_h - h) < 1e-6
    assert row.kw_h >= 0


def test_brown_forsythe_matches_numpy(spark):
    row = REGISTRY["agg_levene_test"].fn(spark, SF_SMOKE).collect()[0]
    per = _groups(spark)
    zs = {}
    for g, vs in per.items():
        med = float(np.median(vs))
        zs[g] = [round(abs(v - med), 6) for v in vs]
    n = sum(len(z) for z in zs.values())
    k = len(zs)
    sz_all = sum(sum(z) for z in zs.values())
    sum_m2 = sum(round(sum(z) ** 2 / len(z), 6) for z in zs.values())
    szz_all = sum(sum(x * x for x in z) for z in zs.values())
    between = (sum_m2 - sz_all**2 / n) / (k - 1)
    within = (szz_all - sum_m2) / (n - k)
    assert (row.k_groups, row.n_total) == (k, n)
    assert abs(row.bf_f - between / within) < 1e-6
    assert row.bf_f >= 0
