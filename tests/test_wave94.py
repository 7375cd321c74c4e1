"""Invariants for wave 94 (append-mode watermark late-data drops)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_watermark_drop_is_a_strict_subset_of_batch(spark):
    rows = REGISTRY["stream_watermark_late_drop"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events_total = ev.count()
    drained = sum(r.n_events for r in rows)
    # the watermark must have dropped late rows AND withheld the trailing
    # open window — strictly fewer events than the batch answer
    assert 0 < drained < n_events_total
    # windows are exact hours and never later than global max - 30 min
    import datetime as dt

    mx = ev.selectExpr("max(ts) AS m").collect()[0].m
    if isinstance(mx, int):  # nanosAsLong fallback
        mx = dt.datetime.fromtimestamp(mx / 1e9, dt.timezone.utc).replace(
            tzinfo=None
        )
    final_wm = mx - dt.timedelta(minutes=30)
    for r in rows:
        ws = dt.datetime.strptime(r.window_start, "%Y-%m-%d %H:%M:%S")
        assert ws.minute == 0 and ws.second == 0
        assert ws + dt.timedelta(hours=1) <= final_wm


def test_watermark_drop_deterministic_rerun(spark):
    a = REGISTRY["stream_watermark_late_drop"].fn(spark, SF_SMOKE).collect()
    b = REGISTRY["stream_watermark_late_drop"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
