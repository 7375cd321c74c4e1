"""Invariants for wave 155 (Somers' D, tau-c)."""

from __future__ import annotations

from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _pair_counts(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cells = Counter(
        (int(o.o_orderpriority[0]), min(int(o.o_totalprice) // 50000, 9))
        for o in orders
    )
    c = d = tx = ty = 0
    items = list(cells.items())
    for i, ((p1, v1), n1) in enumerate(items):
        for (p2, v2), n2 in items[i + 1 :]:
            if (p1 < p2 and v1 < v2) or (p1 > p2 and v1 > v2):
                c += n1 * n2
            elif (p1 < p2 and v1 > v2) or (p1 > p2 and v1 < v2):
                d += n1 * n2
            elif p1 == p2:
                tx += n1 * n2
            else:
                ty += n1 * n2
    return c, d, tx, ty, sum(cells.values())


def test_somers_d_matches_python(spark):
    row = REGISTRY["agg_somers_d"].fn(spark, SF_SMOKE).collect()[0]
    c, d, tx, ty, n = _pair_counts(spark)
    assert (row.concordant, row.discordant, row.ties_value_only) == (c, d, ty)
    assert abs(row.somers_d - (c - d) / (c + d + ty)) < 1e-12
    assert -1 <= row.somers_d <= 1


def test_tau_c_matches_python_and_consistent_with_gamma(spark):
    row = REGISTRY["agg_kendall_tau_c"].fn(spark, SF_SMOKE).collect()[0]
    c, d, tx, ty, n = _pair_counts(spark)
    tau_c = 2 * 5 * (c - d) / (n * n * 4)
    assert (row.concordant, row.discordant, row.n_total) == (c, d, n)
    assert abs(row.tau_c - tau_c) < 1e-12
    # same-sign family: gamma, somers, tau-c all share sign(C - D)
    gamma = REGISTRY["agg_goodman_kruskal_gamma"].fn(spark, SF_SMOKE).collect()[0]
    if c != d:
        assert (gamma.gk_gamma > 0) == (row.tau_c > 0)
