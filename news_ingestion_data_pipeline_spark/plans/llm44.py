"""Forty-fourth wave: order-independent table checksums (the
replication / migration verification primitive) and median-of-means
robust estimation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_ROW = (
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|'"
    " || o_orderstatus || '|' || CAST(CAST(o_totalprice AS DECIMAL(18,2))"
    " AS VARCHAR) || '|' || strftime(o_orderdate, '%Y-%m-%d')"
)


@register(
    "storage_table_checksum",
    oracle=f"""
WITH h AS (
  SELECT CAST('0x' || substr(md5({_ROW}), 1, 15) AS BIGINT) AS hv
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(hv) AS BIGINT) AS xor_digest,
       CAST(SUM(hv) % 1152921504606846976 AS BIGINT) AS sum_digest
FROM h
""",
    description="Order-independent table checksum: every row is "
    "canonicalized to a delimited string (decimal-normalized price, ISO "
    "date), md5-hashed to a 60-bit integer, and combined with XOR and a "
    "modular SUM — both commutative/associative, so the digest is "
    "independent of partitioning, file order, and engine, which is "
    "exactly what lets you verify a 100 TB replication / format "
    "migration / backup with one cheap aggregate per side instead of a "
    "sort-merge diff (the row-level diff, when digests disagree, is "
    "pipeline_snapshot_diff). The XOR catches any odd multiset "
    "difference; the modular sum catches the XOR's even-multiplicity "
    "blind spot (a row duplicated twice). Map-side combinable, "
    "O(1) output.",
    tags=("storage", "pipeline"),
)
def storage_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    h = t(spark, sf_dir, "orders").select(
        F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long").alias("hv")
    )
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.expr("bit_xor(hv)").cast("bigint").alias("xor_digest"),
        (F.sum(F.col("hv").cast("decimal(38,0)")) % (1 << 60))
        .cast("bigint")
        .alias("sum_digest"),
    )


_MOM_K = 9


@register(
    "agg_median_of_means",
    oracle=f"""
WITH b AS (
  SELECT CAST('0x' || substr(md5('mom:' || CAST(o_orderkey AS VARCHAR)),
              1, 15) AS BIGINT) % {_MOM_K} AS bucket,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders
), means AS (
  SELECT bucket,
         CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS m
  FROM b GROUP BY bucket
), ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, bucket) AS rn,
         COUNT(*) OVER () AS k
  FROM means
), plain AS (
  SELECT CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS pm FROM b
)
SELECT CAST(k AS INT) AS n_buckets,
       round((SELECT pm FROM plain), 6) AS plain_mean,
       round(m, 6) AS median_of_means,
       round(m - (SELECT pm FROM plain), 6) AS robust_shift
FROM ranked WHERE rn = (k + 1) // 2
""",
    description=f"Median-of-means robust mean estimator: rows are dealt "
    f"into {_MOM_K} md5-derived buckets (seedless, deterministic — NOT "
    "partition-derived, so the estimate is layout-independent), each "
    "bucket's mean is decimal-exact, and the estimator is the median "
    "bucket mean — sub-Gaussian concentration under heavy tails where "
    "the plain mean is dragged by outliers (the estimator behind "
    "robust loss-spike monitors). robust_shift (MoM minus plain mean) "
    "is the one-glance outlier-pressure gauge. One hash aggregate to "
    f"{_MOM_K} rows + a constant-size median; the plain mean rides the "
    "same pass.",
    tags=("agg", "stats"),
)
def agg_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = t(spark, sf_dir, "orders").select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("mom:"), F.col("o_orderkey").cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _MOM_K
        ).alias("bucket"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    means = b.groupBy("bucket").agg(
        (F.sum("v").cast("string").cast("double") / F.count(F.lit(1))).alias("m")
    )
    plain = b.agg(
        (F.sum("v").cast("string").cast("double") / F.count(F.lit(1))).alias(
            "pm"
        )
    )
    ranked = means.select(
        "m",
        F.row_number().over(Window.orderBy("m", "bucket")).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("k"),
    )
    return (
        ranked.where(F.col("rn") == F.expr("(k + 1) div 2"))
        .crossJoin(F.broadcast(plain))
        .select(
            F.col("k").cast("int").alias("n_buckets"),
            F.round("pm", 6).alias("plain_mean"),
            F.round("m", 6).alias("median_of_means"),
            F.round(F.col("m") - F.col("pm"), 6).alias("robust_shift"),
        )
    )
