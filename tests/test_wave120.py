"""Invariants for wave 120 (image patches, bipartite projection)."""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_patches_cover_image_and_match_formula(spark):
    rows = REGISTRY["multimodal_image_patches"].fn(spark, SF_SMOKE).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    assert set(by_media) == set(range(100))
    for mid, patches in list(by_media.items())[:10]:
        h, w = 64 + (mid % 3) * 8, 64 + (mid % 4) * 8
        assert len(patches) == (h // 8) * (w // 8)
        p = np.arange(h * w, dtype=np.int64).reshape(h, w)
        img = (3 * mid + p[:, :, None] + np.arange(3)[None, None, :]) % 256
        total = sum(r.psum for r in patches)
        assert total == int(img.sum())
        r0 = next(r for r in patches if (r.py, r.px) == (0, 0))
        tile = img[:8, :8]
        assert (r0.psum, r0.pmin, r0.pmax) == (
            int(tile.sum()),
            int(tile.min()),
            int(tile.max()),
        )


def test_bipartite_projection_hubs_pruned(spark):
    from pyspark.sql import functions as F

    rows = REGISTRY["graph_bipartite_projection"].fn(spark, SF_SMOKE).collect()
    assert rows
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    buyers = {
        r.l_partkey: r.n
        for r in cp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    pairs = {}
    from collections import defaultdict

    by_part = defaultdict(list)
    for r in cp.collect():
        if buyers[r.l_partkey] <= 20:
            by_part[r.l_partkey].append(r.o_custkey)
    for custs in by_part.values():
        cs = sorted(set(custs))
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                pairs[(cs[i], cs[j])] = pairs.get((cs[i], cs[j]), 0) + 1
    expect = {k: v for k, v in pairs.items() if v >= 2}
    assert {(r.cust_a, r.cust_b): r.n_shared_parts for r in rows} == expect
