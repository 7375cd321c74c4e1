"""Invariants for wave 76 (BM25, reciprocal-rank fusion)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE

QUERY = ["spark", "stream", "join", "window"]


def test_bm25_matches_python(spark):
    rows = REGISTRY["text_bm25_scoring"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    toks = {
        d.doc_id: d.text.strip().lower().split(" ")
        for d in docs
        if d.text.strip()
    }
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = Counter()
    tfs = {}
    for did, tk in toks.items():
        c = Counter(w for w in tk if w in QUERY)
        if c:
            tfs[did] = c
            for w in c:
                df[w] += 1
    scores = {}
    for did, c in tfs.items():
        dl = len(toks[did])
        s = 0.0
        for w, tf in c.items():
            idf = round(math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0), 9)
            kern = round(
                tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 9
            )
            s += idf * kern
        scores[did] = s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.doc_id) for r in rows] == [d for d, _ in expect]
    for r, (d, s) in zip(rows, expect):
        assert abs(r.bm25 - s) < 1e-5
        assert r.n_terms_matched == len(tfs[d])
    assert all(a.bm25 >= b.bm25 - 1e-9 for a, b in zip(rows, rows[1:]))


def test_rrf_matches_python(spark):
    rows = REGISTRY["sim_reciprocal_rank_fusion"].fn(spark, SF_SMOKE).collect()
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}

    def topk(d):
        out = {}
        for qid in [v for v in vecs if v < 10]:
            qv = vecs[qid][:d]
            scored = sorted(
                (
                    -round(
                        float(
                            qv
                            @ vecs[vid][:d]
                            / (np.linalg.norm(qv) * np.linalg.norm(vecs[vid][:d]))
                        ),
                        6,
                    ),
                    vid,
                )
                for vid in vecs
                if vid != qid
            )
            out[qid] = [vid for _, vid in scored[:5]]
        return out

    full, pfx = topk(64), topk(16)
    expect = {}
    for qid in full:
        sc = defaultdict(float)
        nl = defaultdict(int)
        for lst in (full[qid], pfx[qid]):
            for rank, vid in enumerate(lst, 1):
                sc[vid] += round(1.0 / (60 + rank), 9)
                nl[vid] += 1
        top = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        expect[qid] = [(vid, s, nl[vid]) for vid, s in top]
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    assert set(by_q) == set(expect)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.fused_rank)
        for r, (vid, s, nls) in zip(rs, expect[qid]):
            assert r.neighbor_id == vid
            assert abs(r.rrf_score - s) < 1e-6
            assert r.n_lists == nls
    # a doc on both lists outranks a doc on one list with similar ranks
    assert any(r.n_lists == 2 for r in rows)
