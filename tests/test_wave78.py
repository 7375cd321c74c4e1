"""Invariants for wave 78 (most-probable paths)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_most_probable_paths_matches_dijkstra(spark):
    rows = REGISTRY["graph_most_probable_paths"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    counts = defaultdict(int)
    for es in by_user.values():
        es.sort(key=lambda e: (e.ts, e.event_id))
        for prev, cur in zip(es, es[1:]):
            if prev.event_type != cur.event_type:
                counts[(prev.event_type, cur.event_type)] += 1
    outw = defaultdict(int)
    for (s, _), w in counts.items():
        outw[s] += w
    edges = defaultdict(list)
    for (s, d), w in counts.items():
        edges[s].append((d, round(-math.log(w / outw[s]), 9)))
    # Dijkstra from the seed (all costs positive)
    import heapq

    dist = {"signup": 0.0}
    pq = [(0.0, "signup")]
    while pq:
        cost, node = heapq.heappop(pq)
        if cost > dist.get(node, float("inf")):
            continue
        for d, c in edges.get(node, []):
            nc = round(cost + c, 12)
            if nc < dist.get(d, float("inf")) - 1e-12:
                dist[d] = nc
                heapq.heappush(pq, (nc, d))
    got = {r.state: r for r in rows}
    assert set(got) == set(dist)
    for state, d in dist.items():
        r = got[state]
        assert abs(r.neg_log_prob - d) < 1e-4, state
        assert abs(r.best_path_prob - math.exp(-d)) < 1e-4
        assert 0.0 < r.best_path_prob <= 1.0
    assert got["signup"].neg_log_prob == 0.0
    assert got["signup"].best_path_prob == 1.0
