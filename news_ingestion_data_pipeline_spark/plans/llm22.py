"""Twenty-second wave: time-weighted average (TWAP) over irregular
samples — duration-weighted means with integer-second weights — with
a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_twap_by_user",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS gap_us
  FROM events
), weighted AS (
  SELECT user_id, value,
         (gap_us + 500000) // 1000000 AS w_sec
  FROM seq WHERE gap_us IS NOT NULL
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(w_sec) AS BIGINT) AS total_sec,
       round(CAST(CAST(SUM(CAST(w_sec AS DECIMAL(18,0))
                          * CAST(value AS DECIMAL(20,10))) AS VARCHAR)
                  AS DOUBLE)
             / SUM(w_sec), 6) AS twap
FROM weighted
GROUP BY user_id
ORDER BY user_id
""",
    description="Time-weighted average (TWAP) over irregularly-sampled "
    "values — the metering/billing/price-benchmark semantic where each "
    "observation holds until the NEXT one, so its weight is the "
    "interval duration, not 1 (a naive mean over-weights bursts — the "
    "whole point of TWAP): lead() yields each sample's holding time, "
    "rounded to integer seconds (floor of gap+0.5s — integer "
    "arithmetic, no float rounding surface), and the weighted sum "
    "accumulates as exact DECIMAL(weight x value) so the average is "
    "partition-order-proof. The last sample per user has no successor "
    "and is excluded (half-open interval semantics, mirrored in the "
    "oracle). One (user) shuffle shared by the lead window and the "
    "aggregate; the volume-weighted sibling is lineitem_vwap_weekly.",
    tags=("events", "timeseries", "window"),
)
def events_twap_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    nxt = F.unix_micros(F.lead(F.col("ts")).over(w).cast("timestamp"))
    seq = t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (nxt - us).alias("gap_us"),
    )
    weighted = seq.filter(F.col("gap_us").isNotNull()).select(
        "user_id",
        "value",
        F.expr("(gap_us + 500000) div 1000000").alias("w_sec"),
    )
    twap = (
        F.sum(
            F.col("w_sec").cast("decimal(18,0)")
            * F.col("value").cast("decimal(20,10)")
        ).cast("double")
        / F.sum("w_sec")
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("w_sec").alias("total_sec"),
            F.round(twap, 6).alias("twap"),
        )
        
    )
