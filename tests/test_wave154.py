"""Invariants for wave 154 (rolling cross-correlation)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_rolling_corr_matches_python(spark):
    from pyspark.sql import functions as F

    rows = REGISTRY["window_rolling_corr"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "h"
        ),
        "event_type",
    ).collect()
    hourly = defaultdict(lambda: [0, 0])
    for e in ev:
        hourly[e.h]  # hours with only other event types still emit a row
        if e.event_type == "click":
            hourly[e.h][0] += 1
        elif e.event_type == "view":
            hourly[e.h][1] += 1
    series = sorted(hourly.items())
    got = {r.hour: r for r in rows}
    assert set(got) == {h for h, _ in series}
    for idx, (h, _) in enumerate(series):
        win = series[max(0, idx - 23) : idx + 1]
        n = len(win)
        r = got[h]
        assert r.n_window == n
        xs = [x for _, (x, _) in win]
        ys = [y for _, (_, y) in win]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        if n >= 24 and n * sxx - sx * sx > 0 and n * syy - sy * sy > 0:
            c = (n * sxy - sx * sy) / (
                math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            )
            assert abs(r.rolling_corr - round(c, 6)) < 1e-9
            assert -1 - 1e-9 <= r.rolling_corr <= 1 + 1e-9
        else:
            assert r.rolling_corr is None
