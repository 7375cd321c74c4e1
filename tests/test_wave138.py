"""Invariants for wave 138 (Gumbel block maxima, waterfall join)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_gumbel_fit_matches_numpy(spark):
    row = REGISTRY["agg_gumbel_block_maxima"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    blocks = defaultdict(float)
    for o in orders:
        key = (o.o_orderdate.year, o.o_orderdate.month)
        blocks[key] = max(blocks[key], round(o.o_totalprice, 2))
    mx = np.array(list(blocks.values()))
    assert row.n_blocks == len(mx)
    m, s = mx.mean(), mx.std(ddof=1)
    beta = s * math.sqrt(6) / math.pi
    mu = m - 0.5772156649015329 * beta
    assert abs(row.gumbel_beta - beta) < 1e-6
    assert abs(row.gumbel_mu - mu) < 1e-6
    rl = mu - beta * math.log(-math.log(0.99))
    assert abs(row.return_level_100 - rl) < 1e-6
    # the 100-block return level exceeds every observed block max rarely,
    # but must at least exceed the mean
    assert row.return_level_100 > row.mean_mx


def test_waterfall_rungs_partition_orders(spark):
    rows = REGISTRY["join_waterfall_enrichment"].fn(spark, SF_SMOKE).collect()
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert sum(r.n_orders for r in rows) == n_orders
    vias = {r.match_via for r in rows}
    assert "exact" in vias
    for r in rows:
        if r.match_via == "default":
            assert r.segment == "UNKNOWN"
        else:
            assert r.segment != "UNKNOWN"
