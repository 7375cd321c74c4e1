"""Invariants for wave 77 (rolling-origin CV, quality/token tradeoff)."""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_rolling_origin_cv_matches_numpy(spark):
    rows = sorted(
        REGISTRY["agg_rolling_origin_cv"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.fold,
    )
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    by_day = defaultdict(list)
    for e in ev:
        by_day[e.ts.strftime("%Y-%m-%d")].append(e.value)
    days = sorted(by_day)
    series = [float(np.mean(by_day[d])) for d in days]
    expect = []
    for i in range(20, len(series)):
        fc = float(np.mean([round(v, 9) for v in series[:i]]))
        expect.append((days[i], series[i], fc, abs(series[i] - fc)))
    assert len(rows) == len(expect)
    errs = []
    for r, (day, act, fc, err) in zip(rows, expect):
        assert r.test_day == day
        assert abs(r.actual - act) < 1e-4
        assert abs(r.forecast - fc) < 1e-4
        assert abs(r.abs_err - err) < 1e-4
        errs.append(err)
        assert abs(r.running_mae - np.mean(errs)) < 1e-3


def test_quality_token_tradeoff_monotone(spark):
    rows = sorted(
        REGISTRY["curation_quality_token_tradeoff"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.quality_percentile_cut,
    )
    docs = load_table(spark, SF_SMOKE, "documents").select("text").collect()
    total_tok = sum(len(d.text.split(" ")) for d in docs if d.text.strip())
    assert rows[0].quality_percentile_cut == 0.0
    assert rows[0].tokens_kept == total_tok  # cut at 0 keeps everything
    assert abs(rows[0].token_frac - 1.0) < 1e-9
    prev_docs, prev_q = float("inf"), -1.0
    for r in rows:
        # raising the cut keeps fewer docs and higher mean quality
        assert r.docs_kept <= prev_docs
        assert r.mean_quality_kept >= prev_q - 1e-6
        prev_docs, prev_q = r.docs_kept, r.mean_quality_kept
        assert abs(r.token_frac - r.tokens_kept / total_tok) < 1e-6
        assert 0.0 <= r.mean_quality_kept <= 1.0
