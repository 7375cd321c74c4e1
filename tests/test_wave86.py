"""Invariants for wave 86 (pinball-loss quantile eval)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_pinball_eval_matches_python(spark):
    rows = {r.event_type: r for r in REGISTRY["agg_quantile_pinball_eval"].fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type", "value").collect()
    daily = defaultdict(list)
    for e in ev:
        daily[(e.event_type, e.ts.strftime("%Y-%m-%d"), e.ts.day)].append(e.value)
    series = defaultdict(lambda: {"train": [], "hold": []})
    for (t_, d, dom), vals in daily.items():
        v = float(np.mean(vals))
        series[t_]["train" if dom <= 21 else "hold"].append((d, v))
    for t_, s in series.items():
        train = sorted((v, d) for d, v in s["train"])
        q90 = train[math.ceil(0.9 * len(train)) - 1][0]
        hold = [v for _, v in s["hold"]]
        pin = [
            0.9 * (v - q90) if v >= q90 else 0.1 * (q90 - v) for v in hold
        ]
        r = rows[t_]
        assert abs(r.q90_forecast - q90) < 1e-4
        assert r.n_holdout_days == len(hold)
        assert abs(r.mean_pinball_loss - float(np.mean(pin))) < 1e-3
        cov = sum(1 for v in hold if v <= q90) / len(hold)
        assert abs(r.empirical_coverage - cov) < 1e-6
        assert r.mean_pinball_loss >= 0.0
        assert 0.0 <= r.empirical_coverage <= 1.0
