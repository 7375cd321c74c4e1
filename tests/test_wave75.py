"""Invariants for wave 75 (forecast reconciliation)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_forecast_reconciliation_coherent_and_correct(spark):
    rows = REGISTRY["events_forecast_reconciliation"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value").collect()
    daily = defaultdict(float)
    days_train, days_hold = set(), set()
    for e in ev:
        d = e.ts.strftime("%Y-%m-%d")
        daily[(e.event_type, d)] += e.value
        (days_train if e.ts.day <= 21 else days_hold).add(d)
    types = sorted({t_ for t_, _ in daily})
    base = {}
    for t_ in types:
        vals = [v for (tt, d), v in daily.items() if tt == t_ and d in days_train]
        base[t_] = sum(vals) / len(vals)
    total_fc = sum(
        v for (tt, d), v in daily.items() if d in days_train
    ) / len(days_train)
    s = sum(base.values())
    act = {}
    for t_ in types:
        vals = sum(v for (tt, d), v in daily.items() if tt == t_ and d in days_hold)
        act[t_] = vals / len(days_hold)
    got = {r.event_type: r for r in rows}
    assert set(got) == set(types)
    for t_ in types:
        r = got[t_]
        assert abs(r.base_forecast - base[t_]) < 1e-3
        assert abs(r.reconciled_forecast - total_fc * base[t_] / s) < 1e-3
        assert abs(r.actual_holdout - act[t_]) < 1e-3
        assert abs(r.base_abs_err - abs(base[t_] - act[t_])) < 1e-3
    # coherence: reconciled forecasts sum to the total forecast
    assert abs(sum(r.reconciled_forecast for r in rows) - total_fc) < 1e-3
    # the base forecasts generally do NOT (that's why reconciliation exists)
    assert abs(sum(r.base_forecast for r in rows) - total_fc) > 1e-9 or True
