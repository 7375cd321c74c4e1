"""Invariants for wave 151 (Cohen's d, Cliff's delta)."""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _two_groups(spark):
    xs, ys = [], []
    for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect():
        if o.o_orderpriority == "1-URGENT":
            xs.append(round(o.o_totalprice, 2))
        elif o.o_orderpriority == "5-LOW":
            ys.append(round(o.o_totalprice, 2))
    return np.array(xs), np.array(ys)


def test_cohens_d_matches_numpy(spark):
    row = REGISTRY["agg_cohens_d"].fn(spark, SF_SMOKE).collect()[0]
    xs, ys = _two_groups(spark)
    n1, n2 = len(xs), len(ys)
    pooled = np.sqrt(
        ((xs.var(ddof=0) * n1) + (ys.var(ddof=0) * n2)) / (n1 + n2 - 2)
    )
    d = (xs.mean() - ys.mean()) / pooled
    assert (row.n_urgent, row.n_low) == (n1, n2)
    assert abs(row.cohens_d - d) < 1e-9
    assert abs(row.cohens_d) < 1.0  # synthetic groups are similar


def test_cliffs_delta_matches_quadratic(spark):
    row = REGISTRY["agg_cliffs_delta"].fn(spark, SF_SMOKE).collect()[0]
    xs, ys = _two_groups(spark)
    gt = sum(int((x > ys).sum()) for x in xs)
    lt = sum(int((x < ys).sum()) for x in xs)
    assert (row.n_x, row.n_y) == (len(xs), len(ys))
    assert (row.pairs_x_greater, row.pairs_y_greater) == (gt, lt)
    assert abs(row.cliffs_delta - (gt - lt) / (len(xs) * len(ys))) < 1e-12
    assert -1 <= row.cliffs_delta <= 1
