"""Invariants for wave 141 (NOT IN nulls, retention power law)."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_null_trap_fires_and_rewrite_works(spark):
    row = REGISTRY["join_null_aware_anti_in"].fn(spark, SF_SMOKE).collect()[0]
    assert row.null_trap_fired is True
    assert row.n_not_in_with_null == 0
    # the clean rewrite returns the true complement
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cust = {
        c.c_custkey
        for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
        if c.c_custkey % 100 != 0
    }
    expect = sum(1 for o in orders if o.o_custkey not in cust)
    assert row.n_not_in_without_null == expect
    assert row.n_orders == len(orders)


def test_retention_fit_matches_python(spark):
    row = REGISTRY["events_retention_powerlaw_fit"].fn(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
    ).collect()
    first = {}
    for e in ev:
        first[e.user_id] = min(first.get(e.user_id, e.d), e.d)
    active = defaultdict(set)
    for e in ev:
        k = e.d - first[e.user_id]
        if 1 <= k <= 14:
            active[k].add(e.user_id)
    n_users = len(first)
    pts = [
        (round(math.log(k), 9), round(math.log(len(u) / n_users), 9))
        for k, u in active.items()
    ]
    assert row.n_points == len(pts)
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    assert abs(row.powerlaw_b - b) < 1e-6
    assert abs(row.powerlaw_ln_a - a) < 1e-6
    # retention decays: slope must be negative-ish or flat, never rising fast
    assert row.powerlaw_b < 0.5
