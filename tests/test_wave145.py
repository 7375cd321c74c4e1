"""Invariants for wave 145 (JL projection distortion)."""

from __future__ import annotations

import hashlib

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_jl_distortion_matches_numpy_and_is_tight(spark):
    row = REGISTRY["sim_jl_projection_distortion"].fn(spark, SF_SMOKE).collect()[0]
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()
    }
    signs = np.array(
        [
            [
                1.0
                if int(hashlib.md5(f"jl-{j}-{i}".encode()).hexdigest()[0], 16)
                % 2
                == 0
                else -1.0
                for i in range(1, 65)
            ]
            for j in range(1, 17)
        ]
    )
    ratios = []
    for k in range(50):
        a, b = emb[2 * k], emb[2 * k + 1]
        pa, pb = signs @ a / 4.0, signs @ b / 4.0
        ratios.append(
            round(float(((pa - pb) ** 2).sum() / ((a - b) ** 2).sum()), 6)
        )
    assert row.n_pairs == 50
    assert abs(row.min_distortion - min(ratios)) < 1e-6
    assert abs(row.max_distortion - max(ratios)) < 1e-6
    assert abs(row.mean_distortion - sum(ratios) / 50) < 1e-6
    # JL promise at k=16: distortions concentrate around 1 (loose band)
    assert 0.2 < row.min_distortion <= row.max_distortion < 5.0
    assert 0.6 < row.mean_distortion < 1.6
