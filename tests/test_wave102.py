"""Invariants for wave 102 (refetch scheduling, robots compliance)."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _us(ts):
    if isinstance(ts, int):
        return ts // 1000
    return int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)


def test_refetch_schedule_matches_python(spark):
    rows = REGISTRY["pipeline_refetch_schedule"].fn(spark, SF_SMOKE).collect()
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    per = defaultdict(list)
    for e in ev:
        per[e.event_type].append(_us(e.ts))
    now = max(u for us in per.values() for u in us)
    want = {}
    for s, us in per.items():
        if len(us) < 2:
            continue
        gap = (max(us) - min(us)) // (len(us) - 1)
        want[s] = (len(us), gap // 1_000_000, max(us) + gap < now, gap)
    assert {r.stream for r in rows} == set(want)
    for r in rows:
        n, gap_sec, overdue, _ = want[r.stream]
        assert (r.n_seen, r.avg_gap_sec, r.overdue) == (n, gap_sec, overdue)
    # rank ordering: overdue first, then by raw gap, then name
    ordered = sorted(
        want.items(), key=lambda kv: (not kv[1][2], kv[1][3], kv[0])
    )
    assert [r.stream for r in sorted(rows, key=lambda r: r.fetch_rank)] == [
        s for s, _ in ordered
    ]


def test_robots_audit_prefix_semantics(spark):
    rows = REGISTRY["pipeline_robots_compliance_audit"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0, None])
    for d in docs:
        num = int(d.source[3:])
        prefix = f"/docs/{num % 5}"
        path = f"/docs/{d.doc_id % 50}" + ("/" if d.doc_id % 5 == 0 else "")
        a = per[d.source]
        a[0] += 1
        if path.startswith(prefix):
            a[1] += 1
            a[2] = path if a[2] is None else min(a[2], path)
    assert {r.source for r in rows} == set(per)
    for r in rows:
        n, v, first = per[r.source]
        assert (r.n_urls, r.n_violations, r.first_offending_path) == (n, v, first)
        # /docs/4 must also match /docs/40..49 (real robots prefix rule)
        assert abs(r.violation_pct - round(v * 100.0 / n, 4)) < 1e-9
    assert any(r.n_violations > 0 for r in rows)
