"""Invariants for wave 64 (dataset card, Hurst R/S)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_dataset_card_matches_python(spark):
    [r] = REGISTRY["curation_dataset_card"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    toks = sorted(len(d.text.split(" ")) for d in docs)
    assert r.n_docs == len(docs)
    assert r.n_sources == len({d.source for d in docs})
    assert r.n_langs == len({d.lang for d in docs})
    assert r.total_chars == sum(d.n_chars for d in docs)
    assert r.total_ws_tokens == sum(toks)
    assert r.median_tokens == toks[(len(toks) + 1) // 2 - 1]
    assert r.p95_tokens == toks[math.ceil(len(toks) * 0.95) - 1]
    assert 0.0 <= r.exact_dup_rate <= 1.0
    assert r.n_exact_dups == round(r.exact_dup_rate * r.n_docs)


def test_hurst_matches_numpy(spark):
    [r] = REGISTRY["agg_hurst_rs"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events").select("ts", "value").collect()
    by_day = defaultdict(list)
    for e in ev:
        by_day[e.ts.strftime("%Y-%m-%d")].append(e.value)
    series = np.array([np.mean(by_day[d]) for d in sorted(by_day)])
    rs_means = {}
    for w in (5, 10, 15):
        n_blocks = len(series) // w
        vals = []
        for b in range(n_blocks):
            blk = series[b * w : (b + 1) * w]
            dev = blk - blk.mean()
            cum = np.cumsum(dev)
            s = math.sqrt(float((dev**2).sum()) / w)
            if s > 0:
                vals.append((cum.max() - cum.min()) / s)
        rs_means[w] = float(np.mean(vals))
        got = getattr(r, f"rs_{w}")
        assert abs(got - rs_means[w]) < 1e-3, (w, got, rs_means[w])
    xs = np.log(list(rs_means.keys()))
    ys = np.log(list(rs_means.values()))
    slope = np.polyfit(xs, ys, 1)[0]
    assert r.n_window_sizes == 3
    assert abs(r.hurst_h - slope) < 1e-3
    assert 0.0 < r.hurst_h < 1.0  # any real series lands inside (0, 1)
