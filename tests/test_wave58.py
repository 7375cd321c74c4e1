"""Invariants for wave 58 (Markov absorption)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_markov_absorption_matches_numpy(spark):
    rows = REGISTRY["events_markov_absorption"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    counts = defaultdict(lambda: defaultdict(int))
    for es in by_user.values():
        es.sort(key=lambda e: (e.ts, e.event_id))
        for prev, cur in zip(es, es[1:]):
            if prev.event_type != "purchase":
                counts[prev.event_type][cur.event_type] += 1
    nodes = sorted(
        set(counts) | {d for row in counts.values() for d in row}
    )
    idx = {n: i for i, n in enumerate(nodes)}
    p = np.array([1.0 if n == "purchase" else 0.0 for n in nodes])
    T = np.zeros((len(nodes), len(nodes)))
    for s, row in counts.items():
        tot = sum(row.values())
        for d, w in row.items():
            T[idx[s], idx[d]] = w / tot
    for _ in range(10):
        p = T @ p
        p[idx["purchase"]] = 1.0
    got = {r.state: r.p_absorb_10 for r in rows}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n] - p[idx[n]]) < 1e-6, n
    assert got["purchase"] == 1.0
    for v in got.values():
        assert -1e-9 <= v <= 1.0 + 1e-9
