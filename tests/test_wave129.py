"""Invariants for wave 129 (regression discontinuity, Poisson GOF)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_rd_matches_numpy_ols(spark):
    row = REGISTRY["events_regression_discontinuity"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    for side_val, a_got, b_got in (
        (1, row.intercept_right, row.slope_right),
        (0, row.intercept_left, row.slope_left),
    ):
        pts = [
            (o.o_custkey % 100 - 50, o.o_totalprice)
            for o in orders
            if 20 <= o.o_custkey % 100 <= 79
            and (o.o_custkey % 100 >= 50) == bool(side_val)
        ]
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        b = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() ** 2))
        a = (y.sum() - b * x.sum()) / len(x)
        assert abs(a_got - a) < 1e-6 * max(1, abs(a))
        assert abs(b_got - b) < 1e-6 * max(1, abs(b))
    assert abs(row.rd_effect - (row.intercept_right - row.intercept_left)) < 1e-9


def test_poisson_gof_matches_python(spark):
    from pyspark.sql import functions as F

    row = REGISTRY["agg_poisson_gof"].fn(spark, SF_SMOKE).collect()[0]
    pud = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("day"),
        )
        .groupBy("user_id", "day")
        .count()
        .collect()
    )
    ks = Counter(min(r["count"], 12) for r in pud)
    n_total = sum(ks.values())
    lam = sum(k * n for k, n in ks.items()) / n_total
    chi = 0.0
    for k in range(13):
        if k < 12:
            p = math.exp(-lam) * lam**k / math.factorial(k)
        else:
            p = 1.0 - sum(
                math.exp(-lam) * lam**j / math.factorial(j) for j in range(12)
            )
        p = round(p, 9)
        e = n_total * p
        chi += round((ks.get(k, 0) - e) ** 2 / max(e, 1e-12), 9)
    assert row.n_cells_total == n_total
    assert row.dof == 11
    assert abs(row.chi_square - chi) < 1e-6
