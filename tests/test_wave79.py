"""Invariants for wave 79 (phrase search, fulfillment latency)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_phrase_search_matches_python(spark):
    rows = {r.doc_id: r for r in REGISTRY["text_phrase_search_positional"].fn(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    expect = {}
    for d in docs:
        tk = d.text.strip().lower().split(" ")
        hits = [
            i + 1
            for i in range(len(tk) - 1)
            if tk[i] == "hash" and tk[i + 1] == "join"
        ]
        if hits:
            expect[d.doc_id] = (len(hits), hits[0])
    assert set(rows) == set(expect)
    assert expect, "phrase must occur in the fixture corpus"
    for did, (n, first) in expect.items():
        assert rows[did].n_occurrences == n
        assert rows[did].first_pos == first


def test_fulfillment_latency_matches_python(spark):
    rows = {r.o_orderpriority: r for r in REGISTRY["orders_fulfillment_latency"].fn(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_shipdate").collect()
    orders = {
        o.o_orderkey: (o.o_orderpriority, o.o_orderdate)
        for o in load_table(spark, SF_SMOKE, "orders").select(
            "o_orderkey", "o_orderpriority", "o_orderdate"
        ).collect()
    }
    per_order = defaultdict(list)
    for x in li:
        if x.l_orderkey in orders:
            per_order[x.l_orderkey].append(x.l_shipdate)
    by_prio = defaultdict(list)
    for ok, ships in per_order.items():
        prio, od = orders[ok]
        lags = [(s - od).total_seconds() // 86400 for s in ships]
        by_prio[prio].append((ok, min(lags), max(lags)))
    assert set(rows) == set(by_prio)
    for prio, entries in by_prio.items():
        entries.sort(key=lambda e: (e[1], e[0]))
        firsts = [e[1] for e in entries]
        r = rows[prio]
        assert r.n_orders == len(entries)
        assert r.median_first_ship_days == firsts[(len(firsts) + 1) // 2 - 1]
        assert r.p95_first_ship_days == firsts[math.ceil(len(firsts) * 0.95) - 1]
        span = sum(e[2] - e[1] for e in entries) / len(entries)
        assert abs(r.mean_ship_span_days - span) < 1e-6
        sla = sum(1 for f in firsts if f <= 30) / len(firsts)
        assert abs(r.frac_shipped_30d - sla) < 1e-6
        assert 0.0 <= r.frac_shipped_30d <= 1.0
