"""Invariants for wave 60 (interval overlap join, readability)."""

from __future__ import annotations

import re
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_interval_overlap_matches_python(spark):
    rows = REGISTRY["join_interval_overlap"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "ts"
    ).collect()
    GAP = 600_000_000
    us = lambda t: int(t.timestamp() * 1_000_000)  # noqa: E731
    # sessions for scoped users
    by_user = defaultdict(list)
    for e in ev:
        if e.user_id % 10 == 0:
            by_user[e.user_id].append((us(e.ts), e.event_id))
    sessions = []
    for uid, pts in by_user.items():
        pts.sort()
        sess_no = 0
        start = end = None
        prev = None
        for t_, _ in pts:
            if prev is None or t_ - prev > GAP:
                if start is not None:
                    sessions.append((uid, sess_no, start, end + GAP))
                sess_no += 1
                start = t_
            end = t_
            prev = t_
        sessions.append((uid, sess_no, start, end + GAP))
    # incidents: top-20 busiest hours
    hours = defaultdict(int)
    for e in ev:
        hours[us(e.ts.replace(minute=0, second=0, microsecond=0))] += 1
    top = sorted(hours.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    incidents = [
        (rank + 1, h, h + 3_600_000_000) for rank, (h, _) in enumerate(top)
    ]
    expect = set()
    for uid, sess, s0, s1 in sessions:
        for rank, h0, h1 in incidents:
            ov = min(s1, h1) - max(s0, h0)
            if ov > 0:
                expect.add((uid, sess, rank, max(s0, h0), ov))
    got = {(r.user_id, r.sess, r.incident_rank, r.overlap_start_us, r.overlap_us) for r in rows}
    assert got == expect
    assert got, "fixture should produce at least one overlap"


def test_readability_matches_python(spark):
    rows = REGISTRY["text_readability_fk"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    got = {r.doc_id: r for r in rows}
    checked = 0
    for d in docs:
        txt = d.text.strip().lower()
        if not txt:
            continue
        words = txt.split(" ")
        syls = [max(len(re.findall(r"[aeiouy]+", w)), 1) for w in words]
        r = got[d.doc_id]
        assert r.n_words == len(words)
        assert r.n_syllables == sum(syls)
        spw = sum(syls) / len(words)
        assert abs(r.flesch_ease - (206.835 - 1.015 * len(words) - 84.6 * spw)) < 1e-2
        assert abs(r.fk_grade - (0.39 * len(words) + 11.8 * spw - 15.59)) < 1e-2
        assert abs(r.polysyl_frac - sum(1 for s in syls if s >= 3) / len(words)) < 1e-5
        checked += 1
    assert checked == len(got)
