"""Invariants for wave 66 (two-arm CUPED, vocab coverage)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_cuped_two_arm_matches_numpy(spark):
    [r] = REGISTRY["events_cuped_two_arm"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").collect()
    x, y = defaultdict(float), defaultdict(float)
    users = set()
    for e in ev:
        users.add(e.user_id)
        if e.ts.day <= 15:
            x[e.user_id] += e.value
        else:
            y[e.user_id] += e.value
    arms = {u: u % 2 for u in users}
    xs = np.array([x[u] for u in sorted(users)])
    ys = np.array([y[u] for u in sorted(users)])
    a = np.array([arms[u] for u in sorted(users)])
    cov = np.cov(xs, ys, bias=True)
    theta = cov[0, 1] / cov[0, 0]
    adj = ys - theta * (xs - xs.mean())
    assert r.n_control == int((a == 0).sum())
    assert r.n_treat == int((a == 1).sum())
    assert abs(r.theta - theta) < 1e-3
    diff_raw = ys[a == 1].mean() - ys[a == 0].mean()
    diff_adj = adj[a == 1].mean() - adj[a == 0].mean()
    assert abs(r.diff_raw - diff_raw) < 1e-3
    assert abs(r.diff_cuped - diff_adj) < 1e-3
    se_raw = math.sqrt(
        ys[a == 1].var() / (a == 1).sum() + ys[a == 0].var() / (a == 0).sum()
    )
    assert abs(r.z_raw - diff_raw / se_raw) < 1e-2
    assert 0.0 <= r.var_reduction <= 1.0
    # adjusted variance can only shrink → |z_cuped| >= |z_raw| whenever the
    # adjusted diff hasn't moved against it; check the variance claim itself
    se_adj = math.sqrt(
        adj[a == 1].var() / (a == 1).sum() + adj[a == 0].var() / (a == 0).sum()
    )
    assert se_adj <= se_raw + 1e-9
    assert abs(r.z_cuped - diff_adj / se_adj) < 1e-2


def test_vocab_coverage_matches_python(spark):
    rows = {r.top_n: r for r in REGISTRY["text_vocab_coverage"].fn(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    counts = Counter()
    for d in docs:
        txt = d.text.strip().lower()
        if txt:
            counts.update(txt.split(" "))
    total = sum(counts.values())
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert set(rows) == {10, 100, 1000}
    prev = 0
    for n in (10, 100, 1000):
        r = rows[n]
        covered = sum(c for _, c in ordered[: min(n, len(ordered))])
        assert r.n_types_total == len(ordered)
        assert r.total_tokens == total
        assert r.covered_tokens == covered
        assert abs(r.coverage - covered / total) < 1e-6
        assert r.covered_tokens >= prev  # coverage is monotone in N
        prev = r.covered_tokens
