"""Invariants for wave 142 (Wilcoxon signed-rank, harmonic centrality)."""

from __future__ import annotations

import math
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_wilcoxon_matches_python(spark):
    row = REGISTRY["agg_wilcoxon_signed_rank"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    per = defaultdict(lambda: [0.0, 0, 0.0, 0])
    for o in orders:
        if o.o_orderpriority == "1-URGENT":
            per[o.o_custkey][0] += round(o.o_totalprice, 2)
            per[o.o_custkey][1] += 1
        elif o.o_orderpriority == "5-LOW":
            per[o.o_custkey][2] += round(o.o_totalprice, 2)
            per[o.o_custkey][3] += 1
    diffs = [
        su / nu - sl / nl for su, nu, sl, nl in per.values() if nu and nl
    ]
    nz = [d for d in diffs if d != 0]
    nz.sort(key=abs)
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(nz):
        j = i
        while j < len(nz) and abs(nz[j]) == abs(nz[i]):
            j += 1
        avg = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[k] = avg
        i = j
    w_plus = sum(r for k, r in ranks.items() if nz[k] > 0)
    n = len(nz)
    assert row.n_pairs == n
    assert abs(row.w_plus - w_plus) < 1e-9
    z = (w_plus - n * (n + 1) / 4) / math.sqrt(n * (n + 1) * (2 * n + 1) / 24)
    assert abs(row.z - z) < 1e-9


def test_harmonic_centrality_consistent_with_bfs(spark):
    rows = {
        r.user_id: r
        for r in REGISTRY["graph_harmonic_centrality"].fn(spark, SF_SMOKE).collect()
    }
    assert rows
    # cross-check against the single-source BFS distances: harmonic of
    # the multi-seed run must agree on seed-set-reachable counts
    bfs = REGISTRY["graph_bfs_distances"].fn(spark, SF_SMOKE).collect()
    reached_any = {r.user_id for r in bfs if r.dist > 0}
    total_reached = sum(r.n_reached for r in rows.values())
    # every (seed, node) pair counted per seed >= union over seeds
    assert total_reached >= len(reached_any)
    for r in rows.values():
        assert r.harmonic_milli <= 1000 * r.n_reached  # max 1000 per node
        if r.n_reached:
            assert r.harmonic_milli >= 250 * r.n_reached  # min 1000//4
