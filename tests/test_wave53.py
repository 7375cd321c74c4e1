"""Invariants for wave 53 (CUPED, length batching, LLR collocations)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_cuped_matches_numpy(spark):
    [r] = REGISTRY["events_cuped_adjustment"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value").collect()
    x, y = defaultdict(float), defaultdict(float)
    users = set()
    for e in ev:
        users.add(e.user_id)
        if e.ts.day <= 15:
            x[e.user_id] += e.value
        else:
            y[e.user_id] += e.value
    xs = np.array([x[u] for u in sorted(users)])
    ys = np.array([y[u] for u in sorted(users)])
    assert r.n_users == len(users)
    assert abs(r.mean_post - ys.mean()) < 1e-3
    cov = np.cov(xs, ys, bias=True)
    theta = cov[0, 1] / cov[0, 0]
    assert abs(r.theta - theta) < 1e-3
    assert abs(r.cuped_mean - r.mean_post) < 1e-9  # CUPED preserves the mean
    assert abs(r.var_post - cov[1, 1]) < max(1e-3, 1e-5 * cov[1, 1])
    adj = ys - theta * (xs - xs.mean())
    assert abs(r.var_cuped - adj.var()) < max(1e-3, 1e-5 * adj.var())
    corr2 = cov[0, 1] ** 2 / (cov[0, 0] * cov[1, 1])
    assert abs(r.var_reduction - corr2) < 1e-4
    assert 0.0 <= r.var_reduction <= 1.0
    assert r.var_cuped <= r.var_post + 1e-9


def test_length_batching_invariants(spark):
    rows = REGISTRY["curation_length_batching"].fn(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r.bucket].append(r)
        assert 1 <= r.n_docs <= 16
        assert r.sum_len <= r.n_docs * r.max_len
        assert abs(r.pad_waste - (1 - r.sum_len / (r.n_docs * r.max_len))) < 1e-6
        # every doc in a width-64 bucket is within 63 tokens of the max →
        # padding waste is bounded by the bucket width
        assert r.pad_waste <= 64 / max(r.max_len, 1) + 1e-9
    for bucket, rs in by_bucket.items():
        rs.sort(key=lambda r: r.batch_id)
        # only the last batch of a bucket may be short
        assert all(r.n_docs == 16 for r in rs[:-1])


def test_llr_matches_scipy_style_formula(spark):
    rows = REGISTRY["text_collocation_llr"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    bi, left, right, n = defaultdict(int), defaultdict(int), defaultdict(int), 0
    for d in docs:
        tk = d.text.split(" ")
        for a, b in zip(tk, tk[1:]):
            bi[(a, b)] += 1
            left[a] += 1
            right[b] += 1
            n += 1

    def xlnx(v):
        return 0.0 if v == 0 else v * math.log(v)

    def llr(k11, c_l, c_r):
        k12, k21 = c_l - k11, c_r - k11
        k22 = n - c_l - c_r + k11
        return 2.0 * (
            xlnx(k11) + xlnx(k12) + xlnx(k21) + xlnx(k22) + xlnx(n)
            - xlnx(c_l) - xlnx(n - c_l) - xlnx(c_r) - xlnx(n - c_r)
        )

    scored = sorted(
        (
            (-round(llr(c, left[a], right[b]), 4), a, b)
            for (a, b), c in bi.items()
            if c >= 5
        )
    )[:20]
    assert len(rows) == len(scored)
    for r, (neg_l, a, b) in zip(rows, scored):
        assert (r.w1, r.w2) == (a, b)
        assert abs(r.llr - (-neg_l)) < 1e-2
        assert r.llr >= -1e-9  # LLR is non-negative
