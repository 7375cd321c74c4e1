"""Invariants for wave 83 (out-of-order profile, revenue bridge)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_out_of_order_profile_matches_python(spark):
    rows = {r.p: r for r in REGISTRY["events_out_of_order_profile"].fn(spark, SF_SMOKE).collect()}
    ev = sorted(
        load_table(spark, SF_SMOKE, "events").select("event_id", "ts").collect(),
        key=lambda e: e.event_id,
    )
    max_seen = None
    lates = []
    for e in ev:
        us = int(e.ts.timestamp() * 1e6)
        if max_seen is None or us >= max_seen:
            lates.append(0)
        else:
            lates.append(max_seen - us)
        max_seen = us if max_seen is None else max(max_seen, us)
    lates.sort()
    n = len(lates)
    frac = sum(1 for x in lates if x > 0) / n
    assert set(rows) == {0.5, 0.95, 0.99}
    for p, r in rows.items():
        assert r.n_events == n
        assert abs(r.frac_out_of_order - frac) < 1e-6
        want = lates[math.ceil(p * n) - 1] / 60e6
        assert abs(r.lateness_minutes - want) < 1e-5
    assert rows[0.5].lateness_minutes <= rows[0.99].lateness_minutes


def test_revenue_bridge_identity(spark):
    rows = REGISTRY["orders_revenue_bridge"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()
    agg = defaultdict(lambda: [0, 0.0])
    for o in orders:
        if o.o_orderdate.year in (1995, 1996):
            k = (o.o_orderpriority, o.o_orderdate.year)
            agg[k][0] += 1
            agg[k][1] += round(o.o_totalprice, 2)
    assert rows, "both years must contain orders"
    for r in rows:
        v0, r0 = agg[(r.prio, 1995)]
        v1, r1 = agg[(r.prio, 1996)]
        assert (r.orders_1995, r.orders_1996) == (v0, v1)
        assert abs(r.revenue_change - (r1 - r0)) < 1e-2
        # the additive identity: volume + value + mix == total change
        recon = r.volume_effect + r.value_effect + r.mix_effect
        assert abs(recon - r.revenue_change) < 1e-2
