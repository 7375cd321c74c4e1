"""Invariants for wave 113 (fixed-width scan, profile drift)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from news_ingestion_data_pipeline_spark.scratch import scratch_root


def test_fixed_width_roundtrip_preserves_counts_and_micros(spark):
    rows = {r.l_returnflag: r for r in REGISTRY["scan_fixed_width"].fn(spark, SF_SMOKE).collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        F.col("l_orderkey") % 5 == 0
    )
    native = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
            F.sum((F.col("l_extendedprice") * 1000000.0).cast("long")).alias(
                "micros"
            ),
        )
        .collect()
    }
    assert set(rows) == set(native)
    for k, r in rows.items():
        n = native[k]
        assert r.n_rows == n.n_rows
        assert r.total_qty == n.total_qty
        # micros survive the text hop exactly
        assert abs(r.revenue_approx * 1e6 - n.micros) < 1.0


def test_fixed_width_record_layout(spark):
    # every record is exactly 28 bytes: 12 + 3 + 12 + 1
    REGISTRY["scan_fixed_width"].fn(spark, SF_SMOKE).collect()
    import glob

    files = glob.glob(scratch_root("llm113") + "/fw_*/part-*.txt")
    assert files
    with open(files[0]) as fh:
        for line in fh:
            assert len(line.rstrip("\n")) == 28


def test_profile_drift_metrics_consistent(spark):
    rows = {r.metric: r for r in REGISTRY["pipeline_profile_drift"].fn(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "n_rows",
        "n_customers",
        "mean_price",
        "urgent_share",
        "key_range",
    }
    n = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    r = rows["n_rows"]
    assert r.before_v + r.after_v == n
    assert rows["urgent_share"].before_v <= 1.0
    assert rows["urgent_share"].after_v <= 1.0
    for row in rows.values():
        assert row.abs_delta == abs(row.after_v - row.before_v)
