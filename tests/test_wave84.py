"""Invariants for wave 84 (TextRank keywords)."""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_textrank_matches_numpy_power_iteration(spark):
    rows = REGISTRY["text_textrank_keywords"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    allw = Counter()
    seqs = []
    for d in docs:
        txt = d.text.strip().lower()
        if txt:
            ws = txt.split(" ")
            seqs.append(ws)
            allw.update(ws)
    vocab = {
        w for w, _ in sorted(allw.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    }
    cooc = defaultdict(int)
    for ws in seqs:
        for a, b in zip(ws, ws[1:]):
            if a in vocab and b in vocab and a != b:
                cooc[(a, b)] += 1
    und = defaultdict(int)
    for (a, b), c in cooc.items():
        und[(a, b)] += c
        und[(b, a)] += c
    nodes = sorted({a for a, _ in und})
    idx = {n: i for i, n in enumerate(nodes)}
    outw = defaultdict(int)
    for (a, _), c in und.items():
        outw[a] += c
    T = np.zeros((len(nodes), len(nodes)))
    for (a, b), c in und.items():
        T[idx[b], idx[a]] = c / outw[a]  # column-stochastic: contrib a -> b
    r = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(10):
        r = 0.15 / len(nodes) + 0.85 * (T @ r)
    scored = sorted(
        ((round(float(r[idx[n]]), 8), n) for n in nodes),
        key=lambda t_: (-t_[0], t_[1]),
    )[:20]
    assert [(x.keyword) for x in rows] == [n for _, n in scored]
    for x, (score, n) in zip(rows, scored):
        assert abs(x.textrank - score) < 1e-6
    assert [x.rnk for x in rows] == list(range(1, 21))
