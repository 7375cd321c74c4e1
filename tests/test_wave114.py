"""Invariants for wave 114 (Croston forecast, uplift T-learner)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _croston_py(ds, alpha=0.2):
    z, p, q, started = 0.0, 0.0, 1.0, 0.0
    for d in ds:
        if d > 0:
            z = z + alpha * (d - z) if started > 0.5 else d
            p = p + alpha * (q - p) if started > 0.5 else q
            q, started = 1.0, 1.0
        else:
            q += 1.0
    return z, p


def test_croston_matches_python_fold(spark):
    rows = REGISTRY["lineitem_croston_forecast"].fn(spark, SF_SMOKE).collect()
    assert rows
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF_SMOKE}/part.parquet")
    wk = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select(
            "p_brand",
            F.expr(
                "(unix_micros(cast(l_shipdate as timestamp))"
                " div 86400000000) div 7"
            ).alias("week"),
            "l_quantity",
        )
        .groupBy("p_brand", "week")
        .agg(F.sum("l_quantity").alias("d"))
        .collect()
    )
    w0 = min(r.week for r in wk)
    w1 = max(r.week for r in wk)
    demand = {(r.p_brand, r.week): r.d for r in wk}
    for r in rows:
        ds = [demand.get((r.p_brand, w), 0.0) for w in range(w0, w1 + 1)]
        z, p = _croston_py(ds)
        assert r.n_weeks == w1 - w0 + 1
        assert r.n_demand_weeks == sum(1 for d in ds if d > 0)
        assert abs(r.demand_size - z) < 1e-5
        assert abs(r.demand_interval - p) < 1e-5
        assert abs(r.rate_per_week - z / p) < 1e-5
        # intermittency sanity: interval EWMA never below one week
        assert r.demand_interval >= 1.0


def test_uplift_grid_is_linear(spark):
    rows = sorted(
        REGISTRY["events_uplift_tlearner"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.exposure,
    )
    assert [r.exposure for r in rows] == [5, 10, 20]
    for r in rows:
        assert abs(r.uplift - (r.pred_treated - r.pred_control)) < 1e-12
    # predictions on the grid are collinear (it IS a line)
    r5, r10, r20 = rows
    slope_t = (r10.pred_treated - r5.pred_treated) / 5
    assert abs((r20.pred_treated - r10.pred_treated) / 10 - slope_t) < 1e-9
