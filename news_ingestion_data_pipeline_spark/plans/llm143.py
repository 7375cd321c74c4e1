"""Hundred-forty-third wave: circular time-of-day statistics and
decile migration.

  * events_circular_hour_stats — hour-of-day is a CIRCLE (23:00 and
    01:00 are two hours apart, not 22): per event type, the circular
    mean direction and resultant length over event hours, computed
    from sin/cos evaluated once per distinct hour (24 values, 9-dp
    snapped) and folded through exact decimal weighted sums.  The
    peak-hour statistic that arithmetic means get wrong at midnight.
  * customer_decile_migration — the BI value-migration matrix: spend
    deciles in the early era (orders before 1998) vs the late era,
    with a total (spend, custkey) order so decile boundaries are
    deterministic; emits the decile-to-decile customer counts that
    retention/upsell dashboards are built on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_circular_hour_stats",
    oracle="""
WITH hrs AS (
  SELECT event_type,
         CAST(epoch_us(ts) % 86400000000 AS BIGINT) // 3600000000 AS hour,
         COUNT(*) AS c
  FROM events GROUP BY event_type, 2
),
trig AS (
  SELECT event_type, hour, c,
         CAST(round(cos(2 * pi() * hour / 24.0), 9) AS DECIMAL(18,9)) AS cs,
         CAST(round(sin(2 * pi() * hour / 24.0), 9) AS DECIMAL(18,9)) AS sn
  FROM hrs
),
agg AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(CAST(SUM(c * cs) AS VARCHAR) AS DOUBLE) AS sum_cos,
         CAST(CAST(SUM(c * sn) AS VARCHAR) AS DOUBLE) AS sum_sin
  FROM trig GROUP BY event_type
)
SELECT event_type, n,
       round(sqrt(sum_cos * sum_cos + sum_sin * sum_sin) / n, 6)
         AS resultant_length,
       round((atan2(sum_sin, sum_cos) * 24.0 / (2 * pi()) + 24.0)
             % 24.0, 6) AS mean_hour
FROM agg
ORDER BY event_type
""",
    description="Circular statistics for event hour-of-day per type: "
    "mean direction (as an hour) and resultant length R/n — the "
    "concentration measure where R→1 means a sharp daily peak and R→0 "
    "uniform activity; arithmetic hour means break at midnight "
    "(mean(23, 1) = 12), the circular mean doesn't. Determinism: "
    "sin/cos are evaluated once per DISTINCT hour (24 bounded values), "
    "snapped to 9-dp decimals, and count-weighted through exact decimal "
    "sums; atan2/sqrt run once per type on identical doubles. One "
    "(type, hour) aggregate — 24 rows per type cross the shuffle.",
    tags=("events", "stats", "timeseries"),
)
def events_circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    hrs = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "CAST(unix_micros(cast(ts as timestamp)) % 86400000000"
                " AS BIGINT) div 3600000000"
            ).alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ang = 2 * math.pi / 24.0
    trig = hrs.select(
        "event_type",
        "c",
        F.round(F.cos(F.col("hour") * ang), 9)
        .cast("decimal(18,9)")
        .alias("cs"),
        F.round(F.sin(F.col("hour") * ang), 9)
        .cast("decimal(18,9)")
        .alias("sn"),
    )
    agg = trig.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("c") * F.col("cs")).cast("double").alias("sum_cos"),
        F.sum(F.col("c") * F.col("sn")).cast("double").alias("sum_sin"),
    )
    r = F.sqrt(
        F.col("sum_cos") * F.col("sum_cos")
        + F.col("sum_sin") * F.col("sum_sin")
    )
    mean_hr = (
        F.atan2(F.col("sum_sin"), F.col("sum_cos")) * 24.0 / (2 * math.pi)
        + 24.0
    ) % 24.0
    return agg.select(
        "event_type",
        "n",
        F.round(r / F.col("n"), 6).alias("resultant_length"),
        F.round(mean_hr, 6).alias("mean_hour"),
    )


_SPLIT = "1998-01-01"


@register(
    "customer_decile_migration",
    oracle=f"""
WITH spend AS (
  SELECT o_custkey,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s_early,
         SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS s_late
  FROM orders GROUP BY o_custkey
),
both_eras AS (
  SELECT o_custkey, s_early, s_late FROM spend
  WHERE s_early IS NOT NULL AND s_late IS NOT NULL
),
deciled AS (
  SELECT o_custkey,
         NTILE(10) OVER (ORDER BY s_early, o_custkey) AS dec_early,
         NTILE(10) OVER (ORDER BY s_late, o_custkey) AS dec_late
  FROM both_eras
)
SELECT dec_early, dec_late,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM deciled
GROUP BY dec_early, dec_late
ORDER BY dec_early, dec_late
""",
    description="Customer value-migration matrix: spend deciles in the "
    f"pre-{_SPLIT[:4]} era vs after, NTILE over the total (spend, "
    "custkey) order so boundaries are deterministic (ANSI NTILE "
    "remainder semantics agree across engines — pinned by the ranking-"
    "helper unit tests), restricted to customers active in BOTH eras. "
    "The resulting decile-to-decile counts are the upgrade/churn-risk "
    "matrix every customer-value dashboard draws. Exact decimal spend "
    "sums; the two NTILEs share one pass over the customer aggregate "
    "and run as the two-pass range-partitioned rank (operators/"
    "ranking.py: spend-range buckets from one broadcast envelope, "
    "ntile_from_rank arithmetic) — no single-partition sort at any SF.",
    tags=("customer", "window", "agg"),
)
def customer_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    early = F.col("o_orderdate") < _SPLIT
    spend = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(early, F.col("o_totalprice").cast("decimal(18,2)"))
            ).alias("s_early"),
            F.sum(
                F.when(~early, F.col("o_totalprice").cast("decimal(18,2)"))
            ).alias("s_late"),
        )
        .filter(
            F.col("s_early").isNotNull() & F.col("s_late").isNotNull()
        )
    )
    env = spend.agg(
        F.min("s_early").alias("elo"),
        F.max("s_early").alias("ehi"),
        F.min("s_late").alias("llo"),
        F.max("s_late").alias("lhi"),
        F.count(F.lit(1)).alias("n_both"),
    )
    ranked = RK.distributed_row_number(
        RK.distributed_row_number(
            spend.crossJoin(F.broadcast(env)),
            ["s_early", "o_custkey"],
            RK.range_bucket(F.col("s_early"), F.col("elo"), F.col("ehi")),
            out="rn_early",
        ),
        ["s_late", "o_custkey"],
        RK.range_bucket(F.col("s_late"), F.col("llo"), F.col("lhi")),
        out="rn_late",
    )
    deciled = ranked.select(
        RK.ntile_from_rank(
            F.col("rn_early"), F.col("n_both"), 10
        ).alias("dec_early"),
        RK.ntile_from_rank(
            F.col("rn_late"), F.col("n_both"), 10
        ).alias("dec_late"),
    )
    return (
        deciled.groupBy("dec_early", "dec_late")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        
    )
