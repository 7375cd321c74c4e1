"""Model-based invariants for wave 50 (common spans, KMV merge,
changepoint, linear interpolation): each operator recomputed in plain
Python/numpy on collected sf0.001 data and compared row for row.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_common_spans_matches_python_model(spark):
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in REGISTRY["dedup_common_spans"].fn(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    K, MIN_TOK, DF_CAP = 8, 12, 10
    postings = defaultdict(list)  # gh -> [(doc_id, pos)]
    for r in docs:
        tk = r.text.split(" ")
        for i in range(len(tk) - K + 1):
            gh = hashlib.md5(" ".join(tk[i : i + K]).encode()).hexdigest()[:16]
            postings[gh].append((r.doc_id, i + 1))
    hits = defaultdict(set)  # (da, db, delta) -> {pa}
    for gh, plist in postings.items():
        if not 2 <= len({d for d, _ in plist}) <= DF_CAP:
            continue
        for da, pa in plist:
            for db, pb in plist:
                if da < db:
                    hits[(da, db, pa - pb)].add(pa)
    expect = set()
    for (da, db, delta), pas in hits.items():
        run: list = []
        for pa in sorted(pas) + [None]:
            if run and (pa is None or pa != run[-1] + 1):
                span = len(run) + K - 1
                if span >= MIN_TOK:
                    expect.add((da, db, run[0], run[0] - delta, span))
                run = []
            run.append(pa)
    assert got == expect
    assert got, "fixture corpus should contain at least one shared span"


def test_kmv_union_merge_matches_python_model(spark):
    rows = {
        r.source: r
        for r in REGISTRY["agg_kmv_union_merge"].fn(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id", "ts").collect()
    K = 32
    by_type = defaultdict(set)
    for r in ev:
        by_type[r.event_type].add(f"{r.user_id}@{r.ts.strftime('%Y-%m-%d')}")

    def h01(k: str) -> float:
        return int(hashlib.md5(k.encode()).hexdigest()[:15], 16) / float(1 << 60)

    def est(hs: list[float]) -> float:
        hs = sorted(hs)[:K]
        return float(len(hs)) if len(hs) < K else (K - 1) / hs[-1]

    sketches = {}
    for et, keys in by_type.items():
        hs = sorted(h01(k) for k in keys)[:K]
        sketches[et] = hs
        r = rows[et]
        assert r.exact_distinct == len(keys)
        assert abs(r.kmv_estimate - round(est([h01(k) for k in keys]), 4)) < 1e-9
    merged = sorted(set(h for hs in sketches.values() for h in hs))[:K]
    all_keys = set().union(*by_type.values())
    r = rows["ALL(merged)"]
    assert r.exact_distinct == len(all_keys)
    assert abs(r.kmv_estimate - round(est(merged), 4)) < 1e-9
    # merge property: union-of-sketches bottom-k == bottom-k of the union
    assert merged == sorted(h01(k) for k in all_keys)[:K]


def test_changepoint_matches_numpy_bruteforce(spark):
    [r] = REGISTRY["events_changepoint_binseg"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    by_day = defaultdict(list)
    for e in ev:
        by_day[e.ts.strftime("%Y-%m-%d")].append(e.value)
    days = sorted(by_day)
    best = None
    for i in range(1, len(days)):
        left = np.concatenate([by_day[d] for d in days[:i]])
        right = np.concatenate([by_day[d] for d in days[i:]])
        sse = float(np.sum((left - left.mean()) ** 2) + np.sum((right - right.mean()) ** 2))
        if best is None or sse < best[0] - 1e-9:
            best = (sse, days[i - 1], left, right)
    sse, day, left, right = best
    assert r.split_day == day
    assert r.n_left == len(left) and r.n_right == len(right)
    assert abs(r.mean_left - left.mean()) < 1e-4
    assert abs(r.mean_right - right.mean()) < 1e-4
    assert abs(r.sse_split - sse) < max(1e-3, 1e-6 * sse)
    assert r.gain >= -1e-9


def test_gap_fill_interp_matches_numpy(spark):
    rows = REGISTRY["window_gap_fill_interp"].fn(spark, SF_SMOKE).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    assert by_user, "scoped users must exist"
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.hour)
        xs = [i for i, r in enumerate(rs) if not r.was_gap]
        ys = [rs[i].avg_value for i in xs]
        interp = np.interp(range(len(rs)), xs, ys)
        for r, want in zip(rs, interp):
            assert abs(r.value_interp - want) < 1e-4, (uid, r.hour)
        for r in rs:
            if not r.was_gap:
                assert abs(r.value_interp - r.avg_value) < 1e-6
