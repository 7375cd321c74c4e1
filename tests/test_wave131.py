"""Invariants for wave 131 (hidden partitioning, alert debounce)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_hidden_partitioning_prunes_and_answers(spark):
    row = REGISTRY["storage_hidden_partition_transforms"].fn(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "value",
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
    ).collect()
    d0 = min(e.d for e in ev)
    lo, hi = d0 + 3, d0 + 9
    tb = int(hashlib.md5(b"42").hexdigest()[:4], 16) % 4
    hits = [e for e in ev if e.user_id == 42 and lo <= e.d <= hi]
    assert row.n_rows == len(hits)
    # pruning truth: exactly the live (day, bucket-of-42) partitions read
    live = {
        (e.d, int(hashlib.md5(str(e.user_id).encode()).hexdigest()[:4], 16) % 4)
        for e in ev
        if lo <= e.d <= hi
    }
    expect_files = len({d for d, b in live if b == tb})
    assert row.n_files_read == expect_files
    # the pruned read is a small fraction of all live partitions
    assert row.n_files_read <= len(live) / 2


def test_alert_debounce_every_third_consecutive(spark):
    rows = {
        r.user_id: r
        for r in REGISTRY["events_alert_debounce"].fn(spark, SF_SMOKE).collect()
    }
    assert rows
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id, e.value))
    for uid, evs in per_user.items():
        run = 0
        alerts = []
        for ts, _, v in sorted(evs):
            if v > 60:
                run += 1
                if run % 3 == 0:
                    alerts.append(ts)
            else:
                run = 0
        if alerts:
            r = rows[uid]
            assert r.n_alerts == len(alerts)
            assert r.first_alert_ts == min(alerts).strftime("%Y-%m-%d %H:%M:%S")
        else:
            assert uid not in rows
