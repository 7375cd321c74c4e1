"""Eighty-sixth wave: quantile-forecast evaluation by pinball loss.

agg_quantile_pinball_eval evaluates a p90 daily-value forecast (the
train-window exact 0.9 order statistic per event type) against the
holdout with the pinball (quantile) loss — the strictly proper scoring
rule for quantile forecasts, closing the forecasting-eval family
(events_forecast_backtest and agg_rolling_origin_cv score POINT
forecasts; capacity planning runs on quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_PB_TAU = 0.9


@register(
    "agg_quantile_pinball_eval",
    oracle=f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, day(ts) AS dom,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS v
  FROM events GROUP BY event_type, date_trunc('day', ts), day(ts)
), train AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v, d) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily WHERE dom <= 21
), fc AS (
  SELECT event_type,
         MIN(CASE WHEN rn = CAST(ceil({_PB_TAU!r} * n) AS BIGINT) THEN v END)
           AS q90
  FROM train GROUP BY event_type
), holdout AS (
  SELECT d.event_type, d.v, f.q90,
         CASE WHEN d.v >= f.q90
              THEN {_PB_TAU!r} * (d.v - f.q90)
              ELSE (1.0 - {_PB_TAU!r}) * (f.q90 - d.v) END AS pinball
  FROM daily d JOIN fc f USING (event_type)
  WHERE d.dom > 21
)
SELECT event_type,
       round(MAX(q90), 6) AS q90_forecast,
       CAST(COUNT(*) AS BIGINT) AS n_holdout_days,
       round(CAST(CAST(SUM(CAST(round(pinball, 9) AS DECIMAL(18,9)))
                       AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
         AS mean_pinball_loss,
       round(CAST(COUNT(*) FILTER (WHERE v <= q90) AS DOUBLE) / COUNT(*), 6)
         AS empirical_coverage
FROM holdout
GROUP BY event_type
ORDER BY event_type
""",
    description=f"Quantile-forecast evaluation: the per-type p90 daily "
    "value fitted on days 1-21 (EXACT 0.9 order statistic, no "
    "approximation) is scored on the day-22+ holdout with the pinball "
    f"loss at τ = {_PB_TAU} — the strictly proper scoring rule for "
    "quantile forecasts (a forecaster minimizes expected pinball loss "
    "exactly by reporting the true quantile), plus the empirical "
    "coverage (how often the holdout stayed under the forecast — "
    "calibrated ≈ τ). This closes the forecasting-eval family: "
    "events_forecast_backtest and agg_rolling_origin_cv score point "
    "forecasts; capacity planning, staffing and SLA burn-down all run "
    "on QUANTILE forecasts and need this loss. Per-type ranks run on "
    "the daily domain; pinball terms round-9 into DECIMAL sums. "
    "Shape: one daily pre-aggregate, one partitioned rank, one "
    "holdout join + per-type aggregate.",
    tags=("agg", "timeseries", "stats", "eval"),
)
def agg_quantile_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").alias("d"),
            F.dayofmonth("ts").alias("dom"),
        )
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
        .localCheckpoint()
    )
    w = Window.partitionBy("event_type").orderBy("v", "d")
    train = daily.filter(F.col("dom") <= 21).select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    fc = train.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") == F.ceil(F.lit(_PB_TAU) * F.col("n")).cast("bigint"),
                F.col("v"),
            )
        ).alias("q90")
    )
    pinball = F.when(
        F.col("v") >= F.col("q90"), _PB_TAU * (F.col("v") - F.col("q90"))
    ).otherwise((1.0 - _PB_TAU) * (F.col("q90") - F.col("v")))
    holdout = (
        daily.filter(F.col("dom") > 21)
        .join(F.broadcast(fc), "event_type")
        .select("event_type", "v", "q90", pinball.alias("pinball"))
    )
    return (
        holdout.groupBy("event_type")
        .agg(
            F.round(F.max("q90"), 6).alias("q90_forecast"),
            F.count(F.lit(1)).cast("bigint").alias("n_holdout_days"),
            F.round(
                F.sum(F.round("pinball", 9).cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_pinball_loss"),
            F.round(
                F.count(F.when(F.col("v") <= F.col("q90"), 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("empirical_coverage"),
        )
        
    )
