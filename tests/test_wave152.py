"""Invariants for wave 152 (GK gamma, Cramer's V)."""

from __future__ import annotations

import math
from collections import Counter

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_gk_gamma_matches_python(spark):
    row = REGISTRY["agg_goodman_kruskal_gamma"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    pts = [
        (int(o.o_orderpriority[0]), min(int(o.o_totalprice) // 50000, 9))
        for o in orders
    ]
    cells = Counter(pts)
    c = d = 0
    items = list(cells.items())
    for i, ((p1, v1), n1) in enumerate(items):
        for (p2, v2), n2 in items[i + 1 :]:
            if (p1 < p2 and v1 < v2) or (p1 > p2 and v1 > v2):
                c += n1 * n2
            elif (p1 < p2 and v1 > v2) or (p1 > p2 and v1 < v2):
                d += n1 * n2
    assert (row.concordant, row.discordant) == (c, d)
    assert abs(row.gk_gamma - (c - d) / (c + d)) < 1e-12
    assert -1 <= row.gk_gamma <= 1


def test_cramers_v_matches_python(spark):
    row = REGISTRY["agg_cramers_v"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    seg = {
        cst.c_custkey: cst.c_mktsegment
        for cst in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    }
    obs = Counter(
        (o.o_orderpriority, seg[o.o_custkey])
        for o in orders
        if o.o_custkey in seg
    )
    n = sum(obs.values())
    pr_m = Counter()
    sg_m = Counter()
    for (p, s), k in obs.items():
        pr_m[p] += k
        sg_m[s] += k
    chi = 0.0
    for p in pr_m:
        for s in sg_m:
            e = pr_m[p] * sg_m[s] / n
            chi += round((obs.get((p, s), 0) - e) ** 2 / e, 9)
    v = math.sqrt(chi / (n * (min(len(pr_m), len(sg_m)) - 1)))
    assert row.n_total == n
    assert abs(row.chi2 - chi) < 1e-6
    assert abs(row.cramers_v - v) < 1e-9
    assert 0 <= row.cramers_v <= 1
