"""Hundred-thirteenth wave: fixed-width mainframe-style ingestion and
snapshot column-profile drift.

  * scan_fixed_width — the legacy-feed format Spark has no native
    reader for: land a lineitem slice as fixed-width text records
    (zero-padded offsets, no delimiters), re-ingest with
    spark.read.text + substring/cast schema-on-read, and aggregate.
    Money travels as truncated integer micros — IEEE multiply + trunc
    is bit-identical in both engines, where printf'd decimals are not.
  * pipeline_profile_drift — the data-quality regression alarm: column
    profiles (count, distinct, mean, min/max, segment share) computed
    on two snapshot halves of orders and unpivoted into a
    metric/before/after/delta report.  What a nightly "did the feed
    change under us" check looks like when the answer must be exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm113")


@register(
    "scan_fixed_width",
    oracle="""
WITH src AS (
  SELECT l_orderkey,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(trunc(l_extendedprice * 1000000) AS BIGINT) AS price_micros,
         l_returnflag
  FROM lineitem WHERE l_orderkey % 5 = 0
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       CAST(CAST(CAST(SUM(price_micros) AS DECIMAL(38,0)) / 1000000.0
                 AS VARCHAR) AS DOUBLE) AS revenue_approx,
       CAST(MIN(l_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_key
FROM src
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Fixed-width (mainframe/COBOL copybook style) ingestion: "
    "a lineitem slice lands as 28-byte padded text records "
    "(%012d orderkey, %03d quantity, %012d price-micros, 1-char flag), is "
    "re-read with spark.read.text and parsed by substring offsets — the "
    "schema-on-read pattern for the one feed format Spark has no native "
    "reader for. Money crosses the text boundary as truncated integer "
    "micros: double*1e6 + trunc is IEEE-identical in both engines, where "
    "printf'd decimals round differently (Java HALF_UP vs C half-even). "
    "The oracle replays the same truncation from the original parquet, so "
    "one corrupted offset or lost row hash-fails. Scale shape: text scan "
    "splits by line, parse is whole-stage-codegen substring/cast, the agg "
    "is map-side partial.",
    tags=("scan", "pipeline"),
)
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/fw_{sfx}"
    shutil.rmtree(path, ignore_errors=True)

    (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 5 == 0)
        .select(
            F.format_string(
                "%012d%03d%012d%s",
                F.col("l_orderkey"),
                F.col("l_quantity").cast("int"),
                (F.col("l_extendedprice") * 1000000.0).cast("long"),
                F.col("l_returnflag"),
            ).alias("value")
        )
        .write.text(path)
    )

    rec = spark.read.text(path).select(
        F.substring("value", 1, 12).cast("bigint").alias("l_orderkey"),
        F.substring("value", 13, 3).cast("bigint").alias("qty"),
        F.substring("value", 16, 12).cast("bigint").alias("price_micros"),
        F.substring("value", 28, 1).alias("l_returnflag"),
    )
    return (
        rec.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("qty").alias("total_qty"),
            (
                F.sum("price_micros").cast("decimal(38,0)") / F.lit(1000000.0)
            )
            .cast("double")
            .alias("revenue_approx"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
        
    )


_SPLIT = "1998-01-01"


@register(
    "pipeline_profile_drift",
    oracle=f"""
WITH prof AS (
  SELECT CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}' THEN 'before'
              ELSE 'after' END AS half,
         COUNT(*) AS n_rows,
         COUNT(DISTINCT o_custkey) AS n_customers,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS sum_price,
         CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
         CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS n_urgent
  FROM orders GROUP BY 1
),
m AS (
  SELECT 'n_rows' AS metric,
         CAST(MAX(CASE WHEN half='before' THEN n_rows END) AS DOUBLE) AS before_v,
         CAST(MAX(CASE WHEN half='after' THEN n_rows END) AS DOUBLE) AS after_v
  FROM prof
  UNION ALL
  SELECT 'n_customers',
         CAST(MAX(CASE WHEN half='before' THEN n_customers END) AS DOUBLE),
         CAST(MAX(CASE WHEN half='after' THEN n_customers END) AS DOUBLE)
  FROM prof
  UNION ALL
  SELECT 'mean_price',
         MAX(CASE WHEN half='before' THEN sum_price END)
           / MAX(CASE WHEN half='before' THEN n_rows END),
         MAX(CASE WHEN half='after' THEN sum_price END)
           / MAX(CASE WHEN half='after' THEN n_rows END)
  FROM prof
  UNION ALL
  SELECT 'urgent_share',
         CAST(MAX(CASE WHEN half='before' THEN n_urgent END) AS DOUBLE)
           / MAX(CASE WHEN half='before' THEN n_rows END),
         CAST(MAX(CASE WHEN half='after' THEN n_urgent END) AS DOUBLE)
           / MAX(CASE WHEN half='after' THEN n_rows END)
  FROM prof
  UNION ALL
  SELECT 'key_range',
         CAST(MAX(CASE WHEN half='before' THEN max_key END)
              - MAX(CASE WHEN half='before' THEN min_key END) AS DOUBLE),
         CAST(MAX(CASE WHEN half='after' THEN max_key END)
              - MAX(CASE WHEN half='after' THEN min_key END) AS DOUBLE)
  FROM prof
)
SELECT metric, before_v, after_v, abs(after_v - before_v) AS abs_delta
FROM m ORDER BY metric
""",
    description=f"Snapshot column-profile drift: orders split at "
    f"{_SPLIT} into before/after halves, each profiled in ONE grouped "
    "pass (count, distinct customers, exact-decimal price sum, key "
    "range, urgent-priority share), then unpivoted to a "
    "metric/before/after/|delta| report — the nightly 'did the upstream "
    "feed change shape' alarm. Every metric is count- or decimal-derived "
    "so before/after/delta are bit-exact; the profile pass is a single "
    "2-row aggregate however wide the table (metrics widen the row, not "
    "the shuffle). The distribution-level sibling is events_psi_drift; "
    "this is the schema/volume-level check that runs first.",
    tags=("pipeline", "quality"),
)
def pipeline_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    prof = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.when(F.col("o_orderdate") < _SPLIT, "before")
            .otherwise("after")
            .alias("half")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("n_urgent"),
        )
    )

    def half(col, which):
        return F.max(F.when(F.col("half") == which, F.col(col)))

    w = prof.agg(
        half("n_rows", "before").alias("nb"),
        half("n_rows", "after").alias("na"),
        half("n_customers", "before").alias("cb"),
        half("n_customers", "after").alias("ca"),
        half("sum_price", "before").alias("sb"),
        half("sum_price", "after").alias("sa"),
        half("min_key", "before").alias("minb"),
        half("min_key", "after").alias("mina"),
        half("max_key", "before").alias("maxb"),
        half("max_key", "after").alias("maxa"),
        half("n_urgent", "before").alias("ub"),
        half("n_urgent", "after").alias("ua"),
    )
    m = w.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_rows").alias("metric"),
                    F.col("nb").cast("double").alias("before_v"),
                    F.col("na").cast("double").alias("after_v"),
                ),
                F.struct(
                    F.lit("n_customers").alias("metric"),
                    F.col("cb").cast("double").alias("before_v"),
                    F.col("ca").cast("double").alias("after_v"),
                ),
                F.struct(
                    F.lit("mean_price").alias("metric"),
                    (F.col("sb") / F.col("nb")).alias("before_v"),
                    (F.col("sa") / F.col("na")).alias("after_v"),
                ),
                F.struct(
                    F.lit("urgent_share").alias("metric"),
                    (F.col("ub").cast("double") / F.col("nb")).alias(
                        "before_v"
                    ),
                    (F.col("ua").cast("double") / F.col("na")).alias(
                        "after_v"
                    ),
                ),
                F.struct(
                    F.lit("key_range").alias("metric"),
                    (F.col("maxb") - F.col("minb")).cast("double").alias(
                        "before_v"
                    ),
                    (F.col("maxa") - F.col("mina")).cast("double").alias(
                        "after_v"
                    ),
                ),
            )
        ).alias("s")
    ).select("s.metric", "s.before_v", "s.after_v")
    return m.select(
        "metric",
        "before_v",
        "after_v",
        F.abs(F.col("after_v") - F.col("before_v")).alias("abs_delta"),
    )
