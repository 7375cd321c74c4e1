"""Fortieth wave: ORC as a second columnar format (round-trip proven
value-identical to the parquet source) and GROUPING_ID disambiguation
for rollup rows.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ORC_ROOT = scratch_root("orc")


@register(
    "scan_orc_roundtrip",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
            AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    description="ORC round-trip: write lineitem to ORC (Spark's second "
    "first-class columnar format — same predicate-pushdown/column-"
    "pruning surface as parquet, with its own stripe-level zone maps) "
    "and aggregate the ORC copy; the oracle aggregates the ORIGINAL "
    "parquet, so the hash match certifies the format conversion lost "
    "nothing — types, nulls, and every value — which is exactly the "
    "guarantee a format-migration job must prove before swapping "
    "readers at 100 TB. The write partitions by return flag so the "
    "read-back scan prunes like a production layout.",
    tags=("scan", "storage"),
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(
        _ORC_ROOT, hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    cols = [
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
    ]
    t(spark, sf_dir, "lineitem").select(*cols).write.mode(
        "overwrite"
    ).partitionBy("l_returnflag").orc(path)
    li = spark.read.orc(path)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("sum_price"),
        )
        
    )


@register(
    "agg_grouping_id",
    oracle="""
SELECT COALESCE(l_returnflag, '<all>') AS flag,
       COALESCE(l_linestatus, '<all>') AS status,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, flag, status
""",
    description="GROUPING_ID over a rollup: the bitmask that tells a "
    "NULL-valued grouping column apart from a genuinely-NULL data value "
    "— without it, rollup consumers misread subtotal rows whenever the "
    "data itself contains NULLs (the classic reporting bug). Spark's "
    "grouping_id() and the oracle's GROUPING() bits are composed "
    "identically (flag bit 2, status bit 1); subtotal labels are "
    "projected via the bitmask, NOT via ifnull on the column. Same "
    "single-pass partial-aggregate shape as agg_rollup.",
    tags=("agg",),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    gid = F.grouping_id()
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            gid.cast("int").alias("gid"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .select(
            F.when(F.expr("gid & 2") > 0, "<all>")
            .otherwise(F.col("l_returnflag"))
            .alias("flag"),
            F.when(F.expr("gid & 1") > 0, "<all>")
            .otherwise(F.col("l_linestatus"))
            .alias("status"),
            "gid",
            "n_rows",
        )
        
    )
