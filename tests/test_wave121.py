"""Invariants for wave 121 (DTW distance)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _dtw_py(xa, xb):
    big = 1 << 55
    prev = [0] + [big] * len(xb)
    for a in xa:
        row = [big]
        for j, b in enumerate(xb, start=1):
            row.append(abs(a - b) + min(prev[j], prev[j - 1], row[j - 1]))
        prev = row
    return prev[len(xb)]


def test_dtw_matches_python_and_axioms(spark):
    rows = REGISTRY["events_dtw_distance"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias(
            "day"
        ),
    ).collect()
    days = [e.day for e in ev]
    d0, d1 = min(days), max(days)
    counts = Counter((e.event_type, e.day) for e in ev)
    series = {
        tname: [counts.get((tname, d), 0) for d in range(d0, d1 + 1)]
        for tname in {e.event_type for e in ev}
    }
    for r in rows:
        xa, xb = series[r.type_a], series[r.type_b]
        assert r.n_days == d1 - d0 + 1 == len(xa)
        expect = _dtw_py(xa, xb)
        assert r.dtw_dist == expect
        # DTW lower bound: |sum(a) - sum(b)| <= n * max-shift... use the
        # coarse bound dtw >= |total_a - total_b| / n is NOT an axiom;
        # use dtw <= sum|a_i - b_i| (the no-warp path upper bound)
        assert r.dtw_dist <= sum(abs(a - b) for a, b in zip(xa, xb))
        assert r.dtw_dist >= 0
