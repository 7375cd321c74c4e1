"""Invariants for wave 57 (HITS, conformal intervals)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_hits_matches_numpy_power_iteration(spark):
    rows = REGISTRY["graph_hits_hubs_authorities"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append(e)
    edges = set()
    for es in by_user.values():
        es.sort(key=lambda e: (e.ts, e.event_id))
        for prev, cur in zip(es, es[1:]):
            if prev.event_type != cur.event_type:
                edges.add((prev.event_type, cur.event_type))
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(10):
        a = A.T @ h
        h = A @ a
    a /= a.sum()
    h /= h.sum()
    got = {r.node: (r.authority, r.hub) for r in rows}
    assert set(got) == set(nodes)
    for n in nodes:
        assert abs(got[n][0] - a[idx[n]]) < 1e-6, n
        assert abs(got[n][1] - h[idx[n]]) < 1e-6, n
    assert abs(sum(v[0] for v in got.values()) - 1.0) < 1e-6
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-6


def test_conformal_interval_matches_python(spark):
    [r] = REGISTRY["agg_conformal_interval"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "event_type", "value"
    ).collect()
    train = [e for e in ev if e.ts.day <= 10]
    cal = [e for e in ev if 11 <= e.ts.day <= 15]
    test = [e for e in ev if e.ts.day > 15]
    pred = defaultdict(list)
    for e in train:
        pred[e.event_type].append(e.value)
    pred = {k: sum(v) / len(v) for k, v in pred.items()}
    resids = sorted(
        (abs(e.value - pred[e.event_type]), e.event_id) for e in cal
    )
    k = math.ceil((len(cal) + 1) * 0.9)
    qhat = resids[k - 1][0]
    cov = sum(
        1 for e in test if abs(e.value - pred[e.event_type]) <= qhat
    ) / len(test)
    assert (r.n_train, r.n_cal, r.n_test) == (len(train), len(cal), len(test))
    assert abs(r.qhat - qhat) < 1e-4
    assert abs(r.empirical_coverage - cov) < 1e-3
    # the conformal guarantee: coverage concentrates near the target
    assert 0.8 <= r.empirical_coverage <= 1.0
    assert r.target_coverage == 0.9
