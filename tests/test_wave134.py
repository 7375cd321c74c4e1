"""Invariants for wave 134 (GPD tail, trimmed mean, sharpness)."""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_gpd_moments_match_numpy(spark):
    row = REGISTRY["agg_tail_pot_gpd"].fn(spark, SF_SMOKE).collect()[0]
    prices = [
        o.o_totalprice
        for o in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
        if o.o_totalprice > 400000.0
    ]
    # replicate the decimal(12,2) snap of the excesses
    exc = np.array([round(p - 400000.0, 2) for p in prices])
    assert row.n_exceedances == len(exc)
    m, v = exc.mean(), exc.var(ddof=1)
    assert abs(row.mean_exc - m) < 1e-6
    r = m * m / v
    assert abs(row.gpd_xi - (1 - r) / 2) < 1e-9
    assert abs(row.gpd_beta - m * (r + 1) / 2) < 1e-6
    # a valid GPD moment fit for a bounded-support sample: beta > 0
    assert row.gpd_beta > 0


def test_trimmed_mean_between_min_max_and_robust(spark):
    rows = REGISTRY["agg_trimmed_mean"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    from collections import defaultdict

    per = defaultdict(list)
    for o in orders:
        per[o.o_orderpriority].append((o.o_totalprice, o.o_orderkey))
    for r in rows:
        vals = sorted(per[r.prio])
        cut = len(vals) * 5 // 100
        kept = [round(v, 2) for v, _ in vals[cut : len(vals) - cut]]
        assert r.n_total == len(vals)
        assert r.n_kept == len(kept)
        assert abs(r.trimmed_mean - sum(kept) / len(kept)) < 1e-6


def test_sharpness_counts_wrap_seams(spark):
    rows = REGISTRY["multimodal_image_sharpness"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 100
    for r in rows[:10]:
        h, w = 64 + (r.media_id % 3) * 8, 64 + (r.media_id % 4) * 8
        p = np.arange(h * w, dtype=np.int64).reshape(h, w)
        img = (3 * r.media_id + p[:, :, None] + np.arange(3)[None, None, :]) % 256
        core = img[1:-1, 1:-1, :]
        lap = np.abs(
            4 * core
            - img[:-2, 1:-1, :]
            - img[2:, 1:-1, :]
            - img[1:-1, :-2, :]
            - img[1:-1, 2:, :]
        )
        assert r.laplacian_energy == int(lap.sum())
        assert r.n_edge_px == int((lap > 0).sum())
        assert r.keep_sharp == (r.laplacian_energy >= 1000)
