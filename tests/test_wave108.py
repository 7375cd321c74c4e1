"""Invariants for wave 108 (multi-format federation, what-if grid)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_multi_format_federation_matches_native_parquet(spark):
    rows = REGISTRY["scan_multi_format_federation"].fn(spark, SF_SMOKE).collect()
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        F.col("l_orderkey") % 3 == 0
    )
    ords = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    native = {
        (r.o_orderpriority, r.c_mktsegment): r
        for r in (
            li.join(ords, li.l_orderkey == ords.o_orderkey)
            .join(cust, ords.o_custkey == cust.c_custkey)
            .groupBy("o_orderpriority", "c_mktsegment")
            .agg(
                F.countDistinct("o_orderkey").alias("n_orders"),
                F.sum("l_quantity").cast("bigint").alias("total_qty"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        )
    }
    assert len(rows) == len(native) > 0
    for r in rows:
        n = native[(r.o_orderpriority, r.c_mktsegment)]
        assert r.n_orders == n.n_orders
        assert r.total_qty == n.total_qty
        # CSV round-trip must not lose numeric precision
        assert abs(r.revenue - n.revenue) < 1e-6


def test_scenario_grid_shape_and_identity_cell(spark):
    rows = REGISTRY["agg_scenario_grid_whatif"].fn(spark, SF_SMOKE).collect()
    prios = {r.o_orderpriority for r in rows}
    # full 12-cell grid per priority
    assert len(rows) == len(prios) * 12
    base = {
        r.o_orderpriority: r
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    for r in rows:
        assert r.n_orders == base[r.o_orderpriority].n
        if r.price_mult_pct == 100 and r.demand_drop_pct == 0:
            # identity scenario reproduces the base revenue exactly
            assert abs(r.projected_revenue - base[r.o_orderpriority].rev) < 1e-6
        # monotonicity: more demand drop => less projected revenue
    by_cell = {
        (r.o_orderpriority, r.price_mult_pct, r.demand_drop_pct): r.projected_revenue
        for r in rows
    }
    for p in prios:
        for m in (95, 100, 105, 110):
            assert by_cell[(p, m, 10)] <= by_cell[(p, m, 5)] <= by_cell[(p, m, 0)]
