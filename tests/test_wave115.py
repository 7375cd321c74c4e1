"""Invariants for wave 115 (WOE/IV, Kleinberg bursts)."""

from __future__ import annotations

import math

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_woe_iv_matches_python(spark):
    rows = REGISTRY["feature_woe_iv"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    cells = {}
    for o in orders:
        b = min(int(o.o_totalprice) // 100000, 4)
        g, bad = cells.get(b, (0, 0))
        if o.o_orderpriority == "1-URGENT":
            cells[b] = (g, bad + 1)
        else:
            cells[b] = (g + 1, bad)
    g_tot = sum(g for g, _ in cells.values())
    b_tot = sum(b for _, b in cells.values())
    k = len(cells)
    iv = 0.0
    expected = {}
    for b, (g, bad) in cells.items():
        gs = (g + 0.5) / (g_tot + 0.5 * k)
        bs = (bad + 0.5) / (b_tot + 0.5 * k)
        woe = round(math.log(gs / bs), 9)
        iv += round(gs - bs, 9) * woe
        expected[b] = (g, bad, woe)
    assert len(rows) == k
    for r in rows:
        g, bad, woe = expected[r.bin]
        assert (r.n_good, r.n_bad) == (g, bad)
        assert abs(r.woe - woe) < 1e-9
        assert abs(r.iv_total - iv) < 1e-9
    # IV is nonnegative by Gibbs' inequality (up to smoothing wiggle)
    assert rows[0].iv_total > -1e-6


def test_kleinberg_bursts_match_python_viterbi(spark):
    rows = REGISTRY["events_kleinberg_bursts"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    from pyspark.sql import functions as F

    from news_ingestion_data_pipeline_spark.tables import load_table

    events = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        "ts",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    ).collect()
    series = {}
    for e in events:
        series.setdefault(e.event_type, []).append((e.ts, e.event_id, e.us))
    for r in rows:
        us = [u for _, _, u in sorted(series[r.event_type])]
        xs = [(b - a) / 1e6 for a, b in zip(us, us[1:])]
        n = len(xs)
        assert r.n_gaps == n
        span = (us[-1] - us[0]) / 1e6
        lam0 = n / span
        lam1 = 2.0 * lam0
        l0 = round(math.log(lam0), 9)
        l1 = round(math.log(lam1), 9)
        g = 1.0 * round(math.log(float(n)), 9)
        c0, c1, nb = 0.0, g, 0.0
        for x in xs:
            n0 = min(c0, c1) + (lam0 * x - l0)
            n1 = min(c1, c0 + g) + (lam1 * x - l1)
            nb += 1.0 if n1 < n0 else 0.0
            c0, c1 = n0, n1
        assert r.n_burst_steps == int(nb)
        assert abs(r.cost_base - c0) < 1e-4
        assert abs(r.cost_burst - c1) < 1e-4
        assert math.isfinite(r.cost_base) and math.isfinite(r.cost_burst)
