"""Ninth wave: time-series statistics — rolling exact median over a
bounded frame, CUSUM drift detection (recursive fold, bit-exact
cross-engine like the EWMA), and per-group OLS regression from exact
decimal power sums — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "window_rolling_median",
    oracle="""
WITH w AS (
  SELECT user_id, event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS win
  FROM events
)
SELECT user_id, event_id, ts_s, value,
       round(CASE WHEN len(win) % 2 = 1
             THEN list_sort(win)[(len(win) + 1) // 2]
             ELSE (list_sort(win)[len(win) // 2]
                   + list_sort(win)[len(win) // 2 + 1]) / 2
             END, 6) AS rolling_median
FROM w
""",
    description="Rolling EXACT median over each user's trailing 15 "
    "events — the robust smoother monitoring uses where a rolling mean "
    "chases every spike. Spark has no median window aggregate, so the "
    "frame is collected (bounded: 15 rows) and the middle element "
    "selected from array_sort — the order-statistics escape hatch for "
    "ANY rank within a bounded frame, all codegen'd HOFs, no Python. "
    "Even-count interpolation is the same IEEE mean-of-middle-pair in "
    "both engines. The frame bound is the scale contract: per-row state "
    "is O(frame), independent of history length; for unbounded-frame "
    "medians use the two-pass histogram rank (agg_percentile_ranks).",
    tags=("window", "timeseries", "stats"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    win = F.array_sort(F.collect_list("value").over(w))
    n = F.size(win)
    med = F.when(
        n % 2 == 1, F.element_at(win, ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at(win, (n / 2).cast("int"))
            + F.element_at(win, (n / 2).cast("int") + 1)
        )
        / 2
    )
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
        F.round(med, 6).alias("rolling_median"),
    )


@register(
    "events_cusum_drift",
    oracle="""
WITH base AS (
  SELECT event_type,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS mu
  FROM events GROUP BY event_type
), seq AS (
  SELECT e.event_type, e.ts, e.event_id, e.value, b.mu,
         list(e.value - b.mu) OVER (PARTITION BY e.event_type
                                    ORDER BY e.ts, e.event_id
                                    ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
           AS devs
  FROM events e JOIN base b ON e.event_type = b.event_type
)
SELECT event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       round(list_reduce(list_prepend(0.0, devs),
                         (acc, x) -> greatest(0.0, acc + x - 5.0)), 6)
         AS cusum_high
FROM seq
""",
    description="CUSUM drift detection (Page 1954) over each type's "
    "trailing 30 events: the one-sided cumulative sum "
    "S_i = max(0, S_{i-1} + (x_i - mu) - k) that accumulates only "
    "sustained upward drift (slack k absorbs noise; the max(0,..) "
    "resets on evidence against). The recursion is a single left fold "
    "seeded with 0 — the same bit-exact cross-engine treatment as the "
    "EWMA: both engines run the identical IEEE add/subtract/max "
    "sequence, so values match exactly, no epsilon. Reference mean mu "
    "comes from one deterministic decimal aggregate broadcast back. "
    "Bounded frame = bounded per-row state; the unbounded streaming "
    "form is the applyInPandasWithState shape (stream_state_user_stats "
    "carries exactly this kind of running state).",
    tags=("events", "timeseries", "anomaly"),
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-29, 0)
    )
    devs = F.collect_list(F.col("value") - F.col("mu")).over(w)
    cusum = F.aggregate(
        devs,
        F.lit(0.0),
        lambda acc, x: F.greatest(F.lit(0.0), acc + x - 5.0),
    )
    return (
        # bcast-ok: one mu row per event type
        ev.join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.round(cusum, 6).alias("cusum_high"),
        )
    )


@register(
    "agg_linreg_by_group",
    oracle="""
WITH pts AS (
  SELECT event_type,
         CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE) / 86400000000.0 AS x,
         value AS y
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(y AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x AS DECIMAL(18,9)) * CAST(x AS DECIMAL(18,9)))
              AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(x AS DECIMAL(18,9)) * CAST(y AS DECIMAL(18,9)))
              AS VARCHAR) AS DOUBLE) AS sxy
  FROM pts GROUP BY event_type
)
SELECT event_type, n,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
       round(sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx / n, 6)
         AS intercept
FROM s ORDER BY event_type
""",
    description="Per-group OLS regression (value vs days-since-epoch — "
    "'is this metric trending?') from exact DECIMAL power sums: the "
    "same sufficient-statistics treatment as agg_stats_suite applied to "
    "the regression normal equations, so slope and intercept are "
    "deterministic across engines and partitions where native "
    "regr_slope/regr_intercept (double accumulation in partition order) "
    "would drift. One map-side-partial aggregate per group; x is "
    "rebased to days-from-2024 so the decimal cast keeps 9 fractional "
    "digits of precision where raw epoch-micros would not.",
    tags=("agg", "stats", "regression"),
)
def agg_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(18,9)"
    x = (
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.lit(1704067200000000)
        ).cast("double")
        / 86400000000.0
    )
    pts = t(spark, sf_dir, "events").select(
        "event_type", x.alias("x"), F.col("value").alias("y")
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    intercept = F.col("sy") / n - slope * F.col("sx") / n
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )
