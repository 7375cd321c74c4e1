"""Invariants for wave 54 (streaming top-k, prefix-dim recall,
boilerplate grams)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_stream_topk_matches_batch(spark):
    rows = REGISTRY["stream_topk_per_window"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "event_type").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for e in ev:
        counts[e.ts.strftime("%Y-%m-%d %H:00:00")][e.event_type] += 1
    by_win = defaultdict(list)
    for r in rows:
        by_win[r.window_start].append(r)
    assert set(by_win) == set(counts)
    for win, rs in by_win.items():
        rs.sort(key=lambda r: r.rnk)
        expect = sorted(counts[win].items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert [(r.event_type, r.n_events) for r in rs] == expect
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))


def test_prefix_dim_recall_matches_numpy(spark):
    rows = {
        r.query_id: r
        for r in REGISTRY["sim_prefix_dim_recall"].fn(spark, SF_SMOKE).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}

    def topk(d):
        out = {}
        for qid in [v for v in vecs if v < 10]:
            qv = vecs[qid][:d]
            scored = sorted(
                (
                    -round(float(qv @ vecs[vid][:d]
                                 / (np.linalg.norm(qv) * np.linalg.norm(vecs[vid][:d]))), 6),
                    vid,
                )
                for vid in vecs
                if vid != qid
            )
            out[qid] = {vid for _, vid in scored[:5]}
        return out

    full, pfx = topk(64), topk(16)
    for qid, r in rows.items():
        hits = len(full[qid] & pfx[qid])
        assert r.n_hit == hits
        assert r.n_full == 5
        assert abs(r.recall - round(hits / 5, 4)) < 1e-9


def test_boilerplate_grams_df_thresholds(spark):
    rows = REGISTRY["curation_boilerplate_grams"].fn(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert rows, "fixture corpus must contain high-df bigrams"
    seen = set()
    for r in rows:
        assert r.gram not in seen
        seen.add(r.gram)
        assert r.n_docs_with >= 0.05 * n_docs
        assert 1 <= r.n_sources <= 20
        assert abs(r.doc_frac - round(r.n_docs_with / n_docs, 6)) < 1e-9
        assert len(r.gram.split(" ")) == 2
