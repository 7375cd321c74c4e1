"""Invariants for wave 63 (assortativity, silhouette)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_assortativity_matches_numpy(spark):
    [r] = REGISTRY["graph_assortativity"].fn(spark, SF_SMOKE).collect()
    edges = [
        (e.u, e.v)
        for e in __import__(
            "news_ingestion_data_pipeline_spark.plans.llm26", fromlist=["_copresence_edges"]
        )._copresence_edges(spark, SF_SMOKE).collect()
    ]
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    js, ks = [], []
    for u, v in edges:
        js += [deg[u], deg[v]]
        ks += [deg[v], deg[u]]
    assert r.n_directed_ends == 2 * len(edges)
    js, ks = np.array(js, float), np.array(ks, float)
    if js.std() == 0 or ks.std() == 0:
        assert r.assortativity is None
    else:
        expect = float(np.corrcoef(js, ks)[0, 1])
        assert abs(r.assortativity - expect) < 1e-5
        assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_silhouette_matches_sklearn_style(spark):
    rows = {
        r.cent_id: r
        for r in REGISTRY["sim_silhouette_score"].fn(spark, SF_SMOKE).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {e.vec_id: np.array(e.embedding, dtype=np.float64) for e in emb}
    cents = {c: vecs[c] for c in range(8)}
    assign = {
        vid: min(cents, key=lambda c: (float(np.sum((v - cents[c]) ** 2)), c))
        for vid, v in vecs.items()
    }
    members = defaultdict(list)
    for vid, c in assign.items():
        members[c].append(vid)
    sils = defaultdict(list)
    ids = list(vecs)
    D = {}
    arr = np.array([vecs[i] for i in ids])
    dm = np.sqrt(((arr[:, None, :] - arr[None, :, :]) ** 2).sum(-1)).round(9)
    pos = {vid: i for i, vid in enumerate(ids)}
    for vid in ids:
        own = assign[vid]
        a_members = [m for m in members[own] if m != vid]
        if not a_members:
            sils[own].append(0.0)
            continue
        a = float(np.mean([dm[pos[vid], pos[m]] for m in a_members]))
        b = min(
            float(np.mean([dm[pos[vid], pos[m]] for m in members[c]]))
            for c in members
            if c != own
        )
        sils[own].append((b - a) / max(a, b))
    assert set(rows) == set(members)
    total = 0
    for c, r in rows.items():
        assert r.n_members == len(members[c])
        total += r.n_members
        assert abs(r.mean_silhouette - np.mean(sils[c])) < 1e-4
        assert abs(r.min_silhouette - min(sils[c])) < 1e-4
        assert -1.0 - 1e-9 <= r.min_silhouette <= 1.0 + 1e-9
    assert total == len(vecs)
