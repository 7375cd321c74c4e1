"""Loaders for the TPC-H-ish test corpus (see /root/repo/TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an ``sf`` directory.
Reads are plain ``spark.read.parquet`` so Catalyst gets full pushdown:
filters and column pruning reach the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins. At 100 TB the
# fact tables (lineitem/orders/events/documents) grow with scale factor but
# these stay tiny (region=5, nation=25) or modest (supplier, part, customer
# grow slowly) — broadcast eliminates the shuffle on the big side.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
        # read nanos as long and floor-convert to micros (identical to how
        # micro-precision engines, incl. DuckDB, surface the same file).
        # Re-materialized events tables (e.g. tools/scale_smoke.py output)
        # already carry micros TIMESTAMP — convert only when ts reads as long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition iff the plan's scan produced fewer partitions than the
    cluster has slots.

    Parquet splits at row-group granularity: a table written as one row-group
    scans as ONE task no matter how many cores exist, serializing any heavy
    per-row compute placed above it (shingling, hashing, decoding). The
    round-robin shuffle costs one pass over the rows — noise next to the
    compute it parallelizes. On a well-laid-out table (≥ slots partitions,
    the 100 TB case) this is a no-op, so it's safe to apply unconditionally
    at compute-heavy operator entry points.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """createDataFrame over ONE slice for driver-local constant grids
    (quantile probes, scenario grids, k-row literal tables): the default
    path parallelizes the list over defaultParallelism, so every such
    frame cost a 32-task near-empty stage before its broadcast (r11
    profile: ~5 CPU-s of pure task-launch overhead per site). These
    frames are k-row by construction; one slice is the right layout at
    any scale.

    Classic-session only: sparkContext.parallelize skips the driver-side
    row/type validation of the list-based createDataFrame (bad rows fail
    at execution time) and does not exist under Spark Connect — there,
    fall back to spark.createDataFrame(rows, schema).coalesce(1)."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register each table as a temp view (for the SQL front-end path)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
