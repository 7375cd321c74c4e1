"""Eighteenth wave: additive seasonal decomposition (STL-lite) of the
hourly event-count series — trend from a centered rolling mean,
seasonality from hour-of-day means of the detrended series, residual
as what's left — with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_seasonal_decompose",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS DOUBLE) AS y
  FROM events GROUP BY date_trunc('hour', ts)
), trended AS (
  SELECT h, y,
         CAST(CAST(SUM(CAST(y AS DECIMAL(18,6)))
              OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
              AS VARCHAR) AS DOUBLE)
           / COUNT(*) OVER (ORDER BY h ROWS BETWEEN 12 PRECEDING
                            AND 12 FOLLOWING) AS trend
  FROM hourly
), seasonal AS (
  SELECT CAST(extract(hour FROM h) AS INT) AS hod,
         CAST(CAST(SUM(CAST(y - trend AS DECIMAL(18,6))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS s
  FROM trended GROUP BY extract(hour FROM h)
)
SELECT strftime(t.h, '%Y-%m-%d %H:%M:%S') AS hour,
       t.y AS observed,
       round(t.trend, 6) AS trend,
       round(se.s, 6) AS seasonal,
       round(t.y - t.trend - se.s, 6) AS residual
FROM trended t JOIN seasonal se
  ON CAST(extract(hour FROM t.h) AS INT) = se.hod
ORDER BY hour
""",
    description="Additive seasonal decomposition (the STL-lite every "
    "metrics platform runs): observed hourly counts = trend + seasonal "
    "+ residual, where trend is a CENTERED 25-hour rolling mean "
    "(symmetric frame spans one full daily cycle so the seasonality "
    "averages out of it), seasonal is the hour-of-day mean of the "
    "detrended series, and the residual is what anomaly detectors "
    "should score INSTEAD of the raw series (raw-series thresholds "
    "alert every midnight). Both window and group means divide exact "
    "decimal sums, so all three components are partition-order "
    "deterministic. Two shuffles total: the hourly rollup and the "
    "24-row seasonal profile (broadcast back).",
    tags=("events", "timeseries", "anomaly"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(18,6)"
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    fr = Window.orderBy("h").rowsBetween(-12, 12)
    trended = hourly.select(
        "h",
        "y",
        (
            F.sum(F.col("y").cast(dec)).over(fr).cast("double")
            / F.count(F.lit(1)).over(fr)
        ).alias("trend"),
    )
    seasonal = (
        trended.groupBy(F.hour("h").alias("hod"))
        .agg(
            (
                F.sum((F.col("y") - F.col("trend")).cast(dec)).cast("double")
                / F.count(F.lit(1))
            ).alias("s")
        )
    )
    return (
        trended.join(F.broadcast(seasonal), F.hour("h") == F.col("hod"))
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("y").alias("observed"),
            F.round("trend", 6).alias("trend"),
            F.round("s", 6).alias("seasonal"),
            F.round(F.col("y") - F.col("trend") - F.col("s"), 6).alias(
                "residual"
            ),
        )
        
    )
