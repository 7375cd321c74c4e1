"""Invariants for wave 68 (as-of tolerance, repeat-purchase curve)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_asof_tolerance_matches_python(spark):
    rows = {r.event_id: r for r in REGISTRY["join_asof_tolerance"].fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).collect()
    views = defaultdict(list)
    for e in ev:
        if e.event_type == "view":
            views[e.user_id].append(e)
    for u in views:
        views[u].sort(key=lambda e: e.ts)
    purchases = [e for e in ev if e.event_type == "purchase"]
    assert len(rows) == len(purchases)
    for p in purchases:
        prior = [v for v in views.get(p.user_id, []) if v.ts <= p.ts]
        r = rows[p.event_id]
        if not prior:
            assert r.last_view_ts is None and not r.dropped_stale
            continue
        last = prior[-1]
        stale = (p.ts - last.ts).total_seconds() > 120 * 60
        if stale:
            assert r.last_view_ts is None and r.dropped_stale
        else:
            assert r.last_view_ts == last.ts.strftime("%Y-%m-%d %H:%M:%S")
            assert abs(r.last_view_value - last.value) < 1e-9
            assert not r.dropped_stale


def test_repeat_purchase_curve_matches_python(spark):
    rows = {r.k: r for r in REGISTRY["orders_repeat_purchase_curve"].fn(spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders").select("o_custkey").collect()
    counts = defaultdict(int)
    for o in orders:
        counts[o.o_custkey] += 1
    n_cust = len(counts)
    assert set(rows) == set(range(1, 11))
    prev = None
    for k in range(1, 11):
        at_k = sum(1 for c in counts.values() if c >= k)
        at_k1 = sum(1 for c in counts.values() if c >= k + 1)
        r = rows[k]
        assert r.n_customers_at_k == at_k
        assert abs(r.frac_customers - at_k / n_cust) < 1e-6
        if at_k:
            assert abs(r.next_order_prob - at_k1 / at_k) < 1e-6
        else:
            assert r.next_order_prob is None
        if prev is not None:
            assert r.n_customers_at_k <= prev  # survival is monotone
        prev = r.n_customers_at_k
    assert rows[1].frac_customers == 1.0  # every customer has >= 1 order
