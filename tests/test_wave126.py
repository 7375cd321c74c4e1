"""Invariants for wave 126 (capped sessionize, Simpson's reversal)."""

from __future__ import annotations

from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_capped_sessionize_matches_python(spark):
    from pyspark.sql import functions as F

    rows = {
        r.user_id: r
        for r in REGISTRY["events_capped_sessionize"].fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    ).collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id, e.us))
    for uid, evs in per_user.items():
        us = [u for _, _, u in sorted(evs)]
        ns, cnt, last = 0, 0, None
        for u in us:
            if ns == 0 or u - last > 600_000_000 or cnt >= 20:
                ns, cnt = ns + 1, 1
            else:
                cnt += 1
            last = u
        r = rows[uid]
        assert (r.n_events, r.n_sessions, r.last_session_len) == (
            len(us),
            ns,
            cnt,
        )
        # the cap binds: no session may exceed 20 events, so at least
        # ceil(n/20) sessions exist
        assert r.n_sessions >= -(-len(us) // 20)


def test_simpsons_gaps_consistent(spark):
    rows = REGISTRY["agg_simpsons_reversal"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    pooled = {r.pooled_gap for r in rows}
    assert len(pooled) == 1  # replicated constant
    for r in rows:
        flip = (r.seg_gap > 0) != (r.pooled_gap > 0)
        if r.seg_gap != 0 and r.pooled_gap != 0:
            assert r.reversal == flip
