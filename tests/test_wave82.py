"""Invariants for wave 82 (stratified ATT, Burrows' Delta)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_stratified_att_matches_python(spark):
    rows = {r.stratum: r for r in REGISTRY["events_stratified_att"].fn(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").collect()
    x, y = defaultdict(float), defaultdict(float)
    users = set()
    for e in ev:
        users.add(e.user_id)
        if e.ts.day <= 15:
            x[e.user_id] += e.value
        else:
            y[e.user_id] += e.value
    ordered = sorted(users, key=lambda u: (round(x[u], 6), u))
    n = len(ordered)
    strata = defaultdict(list)
    for i, u in enumerate(ordered):
        s = min(i * 5 // n, 4)
        strata[s].append(u)
    # the estimator weights by ALL treated users (the tot CTE sums n1
    # before the both-arms filter) — strata without controls contribute 0
    t1 = sum(1 for u in users if u % 2 == 1)
    for s, us in strata.items():
        g1 = [round(y[u], 6) for u in us if u % 2 == 1]
        g0 = [round(y[u], 6) for u in us if u % 2 == 0]
        if not (g1 and g0):
            assert s not in rows
            continue
        r = rows[s]
        assert r.n_treated == len(g1)
        assert r.n_control == len(g0)
        assert abs(r.mean_treated - np.mean(g1)) < 1e-4
        assert abs(r.mean_control - np.mean(g0)) < 1e-4
        eff = np.mean(g1) - np.mean(g0)
        assert abs(r.stratum_effect - eff) < 1e-4
        assert abs(r.att_contribution - eff * len(g1) / t1) < 1e-4


def test_burrows_delta_matches_python(spark):
    rows = REGISTRY["text_burrows_delta"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("source", "text").collect()
    tok = defaultdict(list)
    allw = Counter()
    for d in docs:
        txt = d.text.strip().lower()
        if txt:
            ws = txt.split(" ")
            tok[d.source].extend(ws)
            allw.update(ws)
    top = [w for w, _ in sorted(allw.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]
    sources = sorted(tok)
    freqs = {
        s: {w: round(Counter(tok[s]).get(w, 0) / len(tok[s]), 9) for w in top}
        for s in sources
    }
    z = {}
    for w in top:
        vals = np.array([freqs[s][w] for s in sources])
        sd = vals.std()
        for s in sources:
            z[(s, w)] = 0.0 if sd == 0 else round((freqs[s][w] - vals.mean()) / sd, 9)
    deltas = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            deltas[(a, b)] = sum(
                round(abs(z[(a, w)] - z[(b, w)]), 9) for w in top
            ) / 30
    expect = sorted(deltas.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    assert len(rows) == 20
    for r, ((a, b), dv) in zip(rows, expect):
        assert (r.source_a, r.source_b) == (a, b)
        assert abs(r.burrows_delta - dv) < 1e-4
        assert r.burrows_delta >= 0.0
