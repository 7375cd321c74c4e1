"""Forty-first wave: OHLC bar resampling (irregular samples -> fixed
bars, the financial downsampling primitive) and the named WINDOW clause
through the literal SQL front-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "window_ohlc_resample",
    oracle="""
WITH pts AS (
  SELECT event_type,
         to_timestamp(epoch_us(ts) // 14400000000 * 14400) AS bar,
         epoch_us(ts) AS tus, event_id,
         CAST(value AS DECIMAL(20,10)) AS v
  FROM events
), bars AS (
  SELECT event_type, bar,
         CAST(COUNT(*) AS BIGINT) AS n_samples,
         MIN({'t': tus, 'e': event_id, 'v': v}) AS first_row,
         MAX({'t': tus, 'e': event_id, 'v': v}) AS last_row,
         MIN(v) AS lo, MAX(v) AS hi
  FROM pts GROUP BY event_type, bar
)
SELECT event_type, strftime(bar, '%Y-%m-%d %H:%M:%S') AS bar_start,
       n_samples,
       round(CAST((first_row).v AS DOUBLE), 6) AS open,
       round(CAST(hi AS DOUBLE), 6) AS high,
       round(CAST(lo AS DOUBLE), 6) AS low,
       round(CAST((last_row).v AS DOUBLE), 6) AS close
FROM bars
ORDER BY event_type, bar_start
""",
    description="OHLC bar resampling: irregular per-event values "
    "downsampled to 4-hour bars per event type — open/close are the "
    "first/last sample by the (timestamp, event_id) TOTAL order "
    "(min/max-of-struct aggregates, NOT first()/last(), which are "
    "partition-order-dependent and silently nondeterministic — the "
    "classic Spark resampling bug), high/low are plain extrema over "
    "exact decimals. ONE hash aggregate, no window function at all: "
    "min/max-struct is map-side combinable, so resampling 100 TB of "
    "ticks costs a single partial-aggregated shuffle of one row per "
    "(series, bar).",
    tags=("window", "timeseries", "agg"),
)
def window_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = t(spark, sf_dir, "events").select(
        "event_type",
        F.timestamp_seconds(
            F.expr("unix_micros(cast(ts as timestamp)) div 14400000000") * 14400
        ).alias("bar"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"),
        "event_id",
        F.col("value").cast("decimal(20,10)").alias("v"),
    )
    bars = pts.groupBy("event_type", "bar").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples"),
        F.min(F.struct("tus", "event_id", "v")).alias("first_row"),
        F.max(F.struct("tus", "event_id", "v")).alias("last_row"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    return bars.select(
        "event_type",
        F.date_format("bar", "yyyy-MM-dd HH:mm:ss").alias("bar_start"),
        "n_samples",
        F.round(F.col("first_row.v").cast("double"), 6).alias("open"),
        F.round(F.col("hi").cast("double"), 6).alias("high"),
        F.round(F.col("lo").cast("double"), 6).alias("low"),
        F.round(F.col("last_row.v").cast("double"), 6).alias("close"),
    )


@register(
    "sql_window_clause",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       CAST(rank() OVER w AS BIGINT) AS spend_rank,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
            AS VARCHAR) AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey)
QUALIFY rank() OVER w <= 3
ORDER BY o_custkey, spend_rank
""",
    description="The named WINDOW clause through the literal SQL "
    "front-end: one window definition shared by rank() and a running "
    "decimal sum, top-3 orders per customer — the deduplicated-"
    "definition syntax migrating SQL users expect (DuckDB's QUALIFY is "
    "stated as a WHERE-on-rank subquery on the Spark side, same "
    "semantics). Catalyst plans the shared definition as ONE Window "
    "operator — the clause is free; both expressions ride the same "
    "partitioned sort.",
    tags=("sql", "window"),
)
def sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_wc")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, spend_rank, running_spend
        FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(rank() OVER w AS BIGINT) AS spend_rank,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                      AS STRING) AS DOUBLE) AS running_spend
          FROM orders_wc
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                                o_orderkey)
        )
        WHERE spend_rank <= 3
        """
    )
