"""Invariants for wave 97 (update-mode emissions, rolling horizons)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_update_mode_emits_cumulative_history(spark):
    rows = REGISTRY["stream_update_mode_emissions"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    totals = defaultdict(int)
    for e in ev:
        totals[e.event_type] += 1
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.event_type].append(r.n_events)
    assert set(by_key) == set(totals)
    for k, counts in by_key.items():
        counts.sort()
        # strictly increasing cumulative snapshots, last one = batch total
        assert counts == sorted(set(counts))
        assert counts[-1] == totals[k]
        # at most one emission per micro-batch (4 files)
        assert 1 <= len(counts) <= 4


def test_rolling_horizons_nesting_and_totals(spark):
    rows = REGISTRY["feature_rolling_horizons"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    per_day = defaultdict(int)
    for e in ev:
        ts = e.ts
        if isinstance(ts, int):
            ts = dt.datetime.fromtimestamp(ts / 1e9, dt.timezone.utc)
        per_day[(e.user_id, ts.strftime("%Y-%m-%d"))] += 1
    assert len(rows) == len(per_day)
    for r in rows:
        assert r.n_1d == per_day[(r.user_id, r.day)]
        assert r.n_1d <= r.n_7d <= r.n_28d
        assert abs(r.v_1d) <= abs(r.v_7d) + 1e-9 or r.n_7d > r.n_1d
    # spot-check one 7d window by brute force
    r = max(rows, key=lambda r: r.n_7d)
    d0 = dt.datetime.strptime(r.day, "%Y-%m-%d").date()
    want = sum(
        c
        for (u, day), c in per_day.items()
        if u == r.user_id
        and 0 <= (d0 - dt.datetime.strptime(day, "%Y-%m-%d").date()).days <= 6
    )
    assert r.n_7d == want
