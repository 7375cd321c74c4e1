"""Hundred-ninth wave: timezone-conversion parity and Welch's t-test.

  * scalar_timezone_suite — UTC→zone conversion across a DST-observing
    zone (America/New_York), a fixed :30-offset zone (Asia/Kolkata) and
    a :45-offset DST zone (Pacific/Chatham); per-row UTC offsets in
    minutes, day-boundary shift flags, a DST-crossing shifted column
    (event_id-spread over 180 days covers both US transitions), and a
    to_utc_timestamp round-trip through the DST-free zone.  Timezone
    math is a classic cross-engine drift source — this pins Spark's
    ICU semantics against DuckDB's.
  * agg_welch_ttest — unequal-variance two-sample t-test (URGENT vs
    LOW order totals) with the Welch–Satterthwaite df, built from
    exact decimal power sums so the statistic is bit-identical across
    engines and partition orders; the map-side-combinable sufficient
    statistics are the 100 TB shape (6 numbers per group cross the
    shuffle, never the rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "scalar_timezone_suite",
    oracle="""
WITH base AS (
  SELECT event_id,
         ts,
         ts + (event_id % 180) * INTERVAL 1 DAY AS shifted
  FROM events
),
conv AS (
  SELECT event_id,
         ts,
         shifted,
         ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'   AS ny,
         ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Kolkata'       AS kolkata,
         ts AT TIME ZONE 'UTC' AT TIME ZONE 'Pacific/Chatham'    AS chatham,
         shifted AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS shifted_ny
  FROM base
)
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S')         AS utc_s,
       strftime(ny, '%Y-%m-%d %H:%M:%S')         AS ny_s,
       strftime(kolkata, '%Y-%m-%d %H:%M:%S')    AS kolkata_s,
       strftime(chatham, '%Y-%m-%d %H:%M:%S')    AS chatham_s,
       CAST((epoch(ny) - epoch(ts)) / 60 AS BIGINT)      AS ny_off_min,
       CAST((epoch(chatham) - epoch(ts)) / 60 AS BIGINT) AS chatham_off_min,
       CAST(date_trunc('day', ny) != date_trunc('day', ts) AS BOOLEAN)
         AS day_shift_ny,
       strftime(shifted_ny, '%Y-%m-%d %H:%M:%S') AS shifted_ny_s,
       CAST((epoch(shifted_ny) - epoch(shifted)) / 60 AS BIGINT)
         AS shifted_ny_off_min,
       CAST(kolkata AT TIME ZONE 'Asia/Kolkata' AT TIME ZONE 'UTC' = ts
            AS BOOLEAN) AS kolkata_roundtrip_ok
FROM conv
ORDER BY event_id
""",
    description="Timezone-conversion parity suite: from_utc_timestamp into "
    "a DST zone (America/New_York), a fixed half-hour zone (Asia/Kolkata) "
    "and a :45-offset DST zone (Pacific/Chatham); per-row UTC offsets in "
    "minutes, day-boundary shift flags, a DST-crossing shifted timestamp "
    "(rows spread over 180 days straddle the 2024-03-10 spring-forward and "
    "2024-11-03 fall-back, so offsets VARY per row), and a "
    "to_utc_timestamp round-trip through the DST-free zone. Pure JVM "
    "expressions (zero shuffle beyond the scan); the oracle is DuckDB's "
    "independent ICU AT TIME ZONE implementation, so any tzdb/semantics "
    "divergence hash-fails.",
    tags=("scalar", "datetime"),
)
def scalar_timezone_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    shifted = F.expr("ts + make_dt_interval(event_id % 180, 0, 0, 0)")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    kolkata = F.from_utc_timestamp("ts", "Asia/Kolkata")
    chatham = F.from_utc_timestamp("ts", "Pacific/Chatham")
    shifted_ny = F.from_utc_timestamp(shifted, "America/New_York")

    def fmt(c):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")

    def off_min(local, base):
        # Session tz is UTC, so unix_timestamp(naive local) - unix_timestamp
        # (utc) is exactly the zone offset in seconds.
        return (
            (F.unix_timestamp(local) - F.unix_timestamp(base)) / 60
        ).cast("bigint")

    return (
        ev.select(
            "event_id",
            fmt("ts").alias("utc_s"),
            fmt(ny).alias("ny_s"),
            fmt(kolkata).alias("kolkata_s"),
            fmt(chatham).alias("chatham_s"),
            off_min(ny, F.col("ts")).alias("ny_off_min"),
            off_min(chatham, F.col("ts")).alias("chatham_off_min"),
            (F.to_date(ny) != F.to_date("ts")).alias("day_shift_ny"),
            fmt(shifted_ny).alias("shifted_ny_s"),
            off_min(shifted_ny, shifted).alias("shifted_ny_off_min"),
            (
                F.to_utc_timestamp(kolkata, "Asia/Kolkata") == F.col("ts")
            ).alias("kolkata_roundtrip_ok"),
        )
        
    )


@register(
    "agg_welch_ttest",
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                     * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS sxx
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_orderpriority
),
w AS (
  SELECT
    MAX(CASE WHEN grp = '1-URGENT' THEN n END)   AS n1,
    MAX(CASE WHEN grp = '5-LOW'   THEN n END)    AS n2,
    MAX(CASE WHEN grp = '1-URGENT' THEN sx END)  AS sx1,
    MAX(CASE WHEN grp = '5-LOW'   THEN sx END)   AS sx2,
    MAX(CASE WHEN grp = '1-URGENT' THEN sxx END) AS sxx1,
    MAX(CASE WHEN grp = '5-LOW'   THEN sxx END)  AS sxx2
  FROM s
),
m AS (
  SELECT n1, n2,
         sx1 / n1 AS mean1,
         sx2 / n2 AS mean2,
         ((sxx1 - sx1 * sx1 / n1) / (n1 - 1)) / n1 AS se1,
         ((sxx2 - sx2 * sx2 / n2) / (n2 - 1)) / n2 AS se2
  FROM w
)
SELECT n1, n2, mean1, mean2,
       (mean1 - mean2) / sqrt(se1 + se2) AS t_stat,
       (se1 + se2) * (se1 + se2)
         / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)) AS df_welch
FROM m
""",
    description="Welch's unequal-variance two-sample t-test (URGENT vs LOW "
    "order totals) with the Welch–Satterthwaite degrees of freedom. Group "
    "variances come from exact decimal power sums (n, Σx, Σx²) so the "
    "statistic is deterministic across engines and partition orders; the "
    "sufficient statistics are map-side combinable — at 100 TB each "
    "executor ships 3 numbers per group, never rows.",
    tags=("agg", "stats"),
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = F.col("o_totalprice").cast("decimal(18,2)")
    s = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
        )
    )
    g1 = F.col("o_orderpriority") == "1-URGENT"
    w = s.agg(
        F.max(F.when(g1, F.col("n"))).alias("n1"),
        F.max(F.when(~g1, F.col("n"))).alias("n2"),
        F.max(F.when(g1, F.col("sx"))).alias("sx1"),
        F.max(F.when(~g1, F.col("sx"))).alias("sx2"),
        F.max(F.when(g1, F.col("sxx"))).alias("sxx1"),
        F.max(F.when(~g1, F.col("sxx"))).alias("sxx2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mean1 = F.col("sx1") / n1
    mean2 = F.col("sx2") / n2
    se1 = ((F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1) / (n1 - 1)) / n1
    se2 = ((F.col("sxx2") - F.col("sx2") * F.col("sx2") / n2) / (n2 - 1)) / n2
    m = w.select(
        n1, n2, mean1.alias("mean1"), mean2.alias("mean2"),
        se1.alias("se1"), se2.alias("se2"),
    )
    se1, se2 = F.col("se1"), F.col("se2")
    return m.select(
        "n1", "n2", "mean1", "mean2",
        ((F.col("mean1") - F.col("mean2")) / F.sqrt(se1 + se2)).alias("t_stat"),
        (
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1))
        ).alias("df_welch"),
    )
