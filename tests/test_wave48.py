"""Model-based invariants for waves 48-49 (feature encoding, Lloyd update,
kNN classify, Poisson bootstrap, partition stats, modularity).

Each test recomputes the operator with numpy/pandas on collected sf0.001
data and compares, or asserts the mathematical invariants the operator
must satisfy regardless of data.
"""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_target_encode_loo_matches_numpy(spark):
    rows = REGISTRY["feature_target_encode_loo"].fn(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    y = {r.o_orderkey: (r.o_orderpriority, round(r.o_totalprice, 2)) for r in orders}
    sums: dict = {}
    counts: dict = {}
    for cat, val in y.values():
        sums[cat] = sums.get(cat, 0.0) + val
        counts[cat] = counts.get(cat, 0) + 1
    prior = sum(sums.values()) / len(y)
    assert len(rows) == len(y)
    for r in rows:
        cat, val = y[r.o_orderkey]
        assert r.category == cat
        expect = (sums[cat] - val + 10.0 * prior) / (counts[cat] - 1 + 10.0)
        assert abs(r.enc - expect) < 1e-4, (r.o_orderkey, r.enc, expect)


def test_kmeans_update_matches_numpy(spark):
    rows = {
        r.cent_id: r
        for r in REGISTRY["sim_kmeans_update"].fn(spark, SF_SMOKE).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    cents = {i: vecs[i] for i in range(8) if i in vecs}
    assign: dict = {}
    for vid, v in vecs.items():
        d = {c: float(np.sum((v - cv) ** 2)) for c, cv in cents.items()}
        assign[vid] = min(d, key=lambda c: (d[c], c))
    n_total = 0
    for c, cv in cents.items():
        members = [vecs[vid] for vid, a in assign.items() if a == c]
        if not members:
            assert c not in rows
            continue
        new_c = np.mean(members, axis=0)
        r = rows[c]
        n_total += r.n_members
        assert r.n_members == len(members)
        assert abs(r.shift - float(np.linalg.norm(new_c - cv))) < 1e-4
        assert abs(r.new_norm - float(np.linalg.norm(new_c))) < 1e-4
    assert n_total == len(vecs)


def test_knn_classify_matches_numpy(spark):
    rows = {
        r.query_id: r
        for r in REGISTRY["sim_knn_classify"].fn(spark, SF_SMOKE).collect()
    }
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    labels = {r.vec_id: r.label for r in emb}
    queries = [vid for vid in vecs if vid % 37 == 0]
    assert set(rows) == set(queries)
    for qid in queries:
        qv = vecs[qid]
        scored = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            cos = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            scored.append((-round(cos, 6), vid))
        scored.sort()
        top = [labels[vid] for _, vid in scored[:5]]
        votes: dict = {}
        for lb in top:
            votes[lb] = votes.get(lb, 0) + 1
        pred = min(votes, key=lambda lb: (-votes[lb], lb))
        r = rows[qid]
        assert r.pred_label == pred
        assert r.true_label == labels[qid]
        assert r.correct == (pred == labels[qid])
        assert r.n_votes == votes[pred]


def test_bootstrap_ci_brackets_estimate(spark):
    [r] = REGISTRY["events_bootstrap_ci"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").where("user_id % 20 = 0").collect()
    assert r.n_events == len(ev)
    est = sum(round(e.value, 6) for e in ev) / len(ev)
    assert abs(r.est - est) < 1e-3
    assert r.ci_lo <= r.ci_hi
    # resample means concentrate around the point estimate; rank-2/rank-31
    # bounds of 32 resamples should bracket it for any non-degenerate data
    assert r.ci_lo <= r.est <= r.ci_hi


def test_partition_stats_invariants(spark):
    rows = REGISTRY["storage_partition_stats"].fn(spark, SF_SMOKE).collect()
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert {r.candidate for r in rows} == {"day(ts)", "event_type", "user_id%256"}
    for r in rows:
        assert r.total_rows == n_events
        assert r.min_rows <= r.max_rows
        assert r.max_rows * r.n_partitions >= r.total_rows
        assert r.skew_ratio >= 1.0 - 1e-9
        assert r.cv >= 0.0


def test_modularity_invariants(spark):
    rows = REGISTRY["graph_modularity"].fn(spark, SF_SMOKE).collect()
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0
    total_deg = sum(r.degree_sum for r in rows)
    m = total_deg / 2
    assert sum(r.internal_edges for r in rows) <= m
    # sum over communities of (D_c/2m) equals 1
    assert abs(sum(r.degree_sum / (2 * m) for r in rows) - 1.0) < 1e-9
