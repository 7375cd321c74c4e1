"""Invariants for wave 73 (HDR percentiles, referential integrity)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_hdr_percentiles_match_python(spark):
    rows = {r.p: r for r in REGISTRY["agg_hdr_latency_percentiles"].fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    gaps = []
    for es in by_user.values():
        es.sort(key=lambda e: (e.ts, e.event_id))
        for a, b in zip(es, es[1:]):
            g = int(b.ts.timestamp() * 1e6) - int(a.ts.timestamp() * 1e6)
            if g > 0:
                gaps.append(g)
    gaps.sort()
    assert set(rows) == {0.5, 0.9, 0.99}
    for p, r in rows.items():
        exact = gaps[math.ceil(p * len(gaps)) - 1]
        assert abs(r.exact_sec - exact / 1e6) < 1e-5
        bkt = r.hdr_bucket_log2
        # HDR guarantee: the exact percentile lies inside its bucket
        assert 2**bkt <= exact < 2 ** (bkt + 1)
        assert 1.0 - 1e-9 <= r.exact_over_bucket < 2.0
        assert abs(r.hdr_lower_bound_sec - 2**bkt / 1e6) < 1e-5
    assert rows[0.5].exact_sec <= rows[0.9].exact_sec <= rows[0.99].exact_sec


def test_referential_integrity_matches_python(spark):
    rows = {r.check_name: r for r in REGISTRY["pipeline_referential_integrity"].fn(spark, SF_SMOKE).collect()}
    li = {r.l_orderkey for r in load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey").collect()}
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey").collect()
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey").collect()
    nations = {r.n_nationkey for r in load_table(spark, SF_SMOKE, "nation").select("n_nationkey").collect()}
    okeys = {o.o_orderkey for o in orders}
    ocusts = {o.o_custkey for o in orders}
    ckeys = {c.c_custkey for c in cust}
    li_rows = load_table(spark, SF_SMOKE, "lineitem").count()
    bad_li = sum(
        1
        for r in load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey").collect()
        if r.l_orderkey not in okeys
    )
    assert rows["lineitem_without_order"].n_violations == bad_li
    assert rows["lineitem_without_order"].n_total == li_rows
    assert rows["order_without_customer"].n_violations == sum(
        1 for o in orders if o.o_custkey not in ckeys
    )
    assert rows["customer_without_nation"].n_violations == sum(
        1 for c in cust if c.c_nationkey not in nations
    )
    assert rows["customer_without_orders"].n_violations == sum(
        1 for c in cust if c.c_custkey not in ocusts
    )
    for r in rows.values():
        assert r.passed == (r.n_violations == 0)
        assert abs(r.violation_rate - r.n_violations / r.n_total) < 1e-9
    # the synthetic star schema is referentially clean on true FK checks
    assert rows["lineitem_without_order"].passed
    assert rows["order_without_customer"].passed
    assert rows["customer_without_nation"].passed
