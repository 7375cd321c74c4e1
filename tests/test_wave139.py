"""Invariants for wave 139 (survival MLE, partition conductance)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_survival_mle_matches_python(spark):
    row = REGISTRY["events_exponential_survival_mle"].fn(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    ).collect()
    per = defaultdict(lambda: [None, None, None])  # t0, t_purchase, t_last
    for e in ev:
        u = per[e.user_id]
        u[0] = e.us if u[0] is None else min(u[0], e.us)
        u[2] = e.us if u[2] is None else max(u[2], e.us)
        if e.event_type == "purchase":
            u[1] = e.us if u[1] is None else min(u[1], e.us)
    d = tot = n = 0
    for t0, tp, tl in per.values():
        if tl <= t0:
            continue
        n += 1
        if tp is not None and tp > t0:
            d += 1
            tot += tp - t0
        else:
            tot += tl - t0
    assert (row.n, row.n_events, row.n_censored) == (n, d, n - d)
    lam = d / (tot / 3.6e9)
    assert abs(row.lambda_per_hour - lam) < 1e-9
    assert abs(row.median_hours - math.log(2) / lam) < 1e-9
    assert abs(row.surv_24h - math.exp(-lam * 24)) < 1e-12
    assert 0 < row.surv_24h < 1


def test_conductance_bounds_and_volumes(spark):
    rows = REGISTRY["graph_partition_conductance"].fn(spark, SF_SMOKE).collect()
    assert rows
    total_vol = sum(r.volume for r in rows)
    for r in rows:
        assert 0 <= r.cut_edges <= r.volume
        expect = (1000 * r.cut_edges) // min(r.volume, total_vol - r.volume)
        assert r.conductance_milli == expect
        # the mod-partition null model should not be a perfect community
        assert r.conductance_milli > 0 or r.cut_edges == 0
