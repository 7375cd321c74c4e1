"""Seventy-fifth wave: hierarchical forecast reconciliation.

events_forecast_reconciliation closes the forecasting family
(events_holt_forecast, events_forecast_backtest, events_seasonal_decompose):
per-type base forecasts and the independently-fitted total forecast never
agree, and the proportional top-down reconciliation makes the hierarchy
COHERENT — the property planning systems require before numbers flow to
finance (per-type plans must sum to the company plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_forecast_reconciliation",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, day(ts) AS dom,
         SUM(CAST(value AS DECIMAL(20,10))) AS v
  FROM events GROUP BY event_type, date_trunc('day', ts), day(ts)
), base AS (  -- per-type mean daily value over the training window (days 1-21)
  SELECT event_type,
         CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS fc
  FROM daily WHERE dom <= 21 GROUP BY event_type
), total_fc AS (  -- independently fitted total: mean daily TOTAL value
  SELECT CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE)
           / COUNT(DISTINCT d) AS fc
  FROM daily WHERE dom <= 21
), base_sum AS (
  SELECT SUM(fc) AS s FROM base
), actual AS (  -- holdout: mean daily value per type over days 22+
  SELECT event_type,
         CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE)
           / (SELECT COUNT(DISTINCT d) FROM daily WHERE dom > 21) AS act
  FROM daily WHERE dom > 21 GROUP BY event_type
)
SELECT b.event_type,
       round(b.fc, 6) AS base_forecast,
       round(t.fc * (b.fc / s.s), 6) AS reconciled_forecast,
       round(a.act, 6) AS actual_holdout,
       round(abs(b.fc - a.act), 6) AS base_abs_err,
       round(abs(t.fc * (b.fc / s.s) - a.act), 6) AS reconciled_abs_err
FROM base b
JOIN actual a USING (event_type)
CROSS JOIN total_fc t CROSS JOIN base_sum s
ORDER BY b.event_type
""",
    description="Proportional top-down forecast reconciliation: per-type "
    "naive forecasts (training-window mean daily value, days 1-21) and "
    "an INDEPENDENTLY fitted total forecast disagree — the bottom "
    "forecasts don't sum to the top one — so each type is rescaled by "
    "its share of the base-forecast mass, making the hierarchy coherent "
    "(reconciled types sum exactly to the total forecast, the invariant "
    "tests assert); both base and reconciled forecasts are then scored "
    "against the day-22+ holdout. This is the minimal member of the "
    "MinT/forecast-reconciliation family and the step planning systems "
    "require before per-segment numbers roll up to finance. Daily "
    "aggregates flow through DECIMAL; everything after runs on the "
    "k-type domain. Shape: one daily pre-aggregate, three tiny frames, "
    "1-row glue.",
    tags=("events", "timeseries", "stats"),
)
def events_forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("d"),
            F.dayofmonth("ts").alias("dom"),
        )
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("v"))
        .localCheckpoint()
    )
    base = (
        daily.filter(F.col("dom") <= 21)
        .groupBy("event_type")
        .agg((F.sum("v").cast("double") / F.count(F.lit(1))).alias("fc"))
    )
    total_fc = daily.filter(F.col("dom") <= 21).agg(
        (F.sum("v").cast("double") / F.countDistinct("d")).alias("tfc")
    )
    base_sum = base.agg(F.sum("fc").alias("s"))
    n_hold = daily.filter(F.col("dom") > 21).agg(
        F.countDistinct("d").alias("nh")
    )
    actual = (
        daily.filter(F.col("dom") > 21)
        .groupBy("event_type")
        .agg(F.sum("v").cast("double").alias("sv"))
        .crossJoin(F.broadcast(n_hold))
        .select("event_type", (F.col("sv") / F.col("nh")).alias("act"))
    )
    rec = F.col("tfc") * (F.col("fc") / F.col("s"))
    return (
        base.join(actual, "event_type")
        .crossJoin(F.broadcast(total_fc))
        .crossJoin(F.broadcast(base_sum))
        .select(
            "event_type",
            F.round("fc", 6).alias("base_forecast"),
            F.round(rec, 6).alias("reconciled_forecast"),
            F.round("act", 6).alias("actual_holdout"),
            F.round(F.abs(F.col("fc") - F.col("act")), 6).alias("base_abs_err"),
            F.round(F.abs(rec - F.col("act")), 6).alias("reconciled_abs_err"),
        )
        
    )
