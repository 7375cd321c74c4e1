"""Seventy-fourth wave: group-sequential experiment monitoring.

events_group_sequential is the peeking-safe A/B readout: the z statistic
recomputed at weekly looks on CUMULATIVE data, compared against
O'Brien-Fleming spending bounds (wide early, near-nominal late) — the
design that lets an experimenter look every week without inflating the
false-positive rate, which naive repeated z-testing (peeking at
events_ab_test_z weekly) silently does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

# O'Brien-Fleming two-sided 0.05 bounds for K = 4 equally-spaced looks,
# frozen literals (z bounds ~ z_final * sqrt(K / k))
_GS_BOUNDS = [4.048591, 2.862786, 2.337455, 2.024295]


@register(
    "events_group_sequential",
    oracle=f"""
WITH per_user_week AS (
  SELECT user_id, user_id % 2 AS arm,
         LEAST(CAST((day(ts) - 1) // 8 AS INT), 3) AS wk,
         SUM(CAST(value AS DECIMAL(20,10))) AS v
  FROM events GROUP BY user_id, user_id % 2, LEAST(CAST((day(ts) - 1) // 8 AS INT), 3)
), looks AS (SELECT UNNEST(range(0, 4)) AS look),
cum_user AS (
  SELECT l.look, p.user_id, p.arm,
         CAST(round(CAST(CAST(SUM(p.v) AS VARCHAR) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS y
  FROM looks l JOIN per_user_week p ON p.wk <= l.look
  GROUP BY l.look, p.user_id, p.arm
), m AS (
  SELECT look, arm, COUNT(*) AS n,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(y AS DECIMAL(20,6)) * y) AS VARCHAR) AS DOUBLE) AS ss
  FROM cum_user GROUP BY look, arm
), z AS (
  SELECT a1.look,
         CAST(a0.n + a1.n AS BIGINT) AS n_users,
         round(a1.s / a1.n - a0.s / a0.n, 6) AS diff,
         round((a1.s / a1.n - a0.s / a0.n)
               / sqrt((a1.ss - a1.s * a1.s / a1.n) / a1.n / a1.n
                      + (a0.ss - a0.s * a0.s / a0.n) / a0.n / a0.n), 6) AS z
  FROM (SELECT * FROM m WHERE arm = 1) a1
  JOIN (SELECT * FROM m WHERE arm = 0) a0 USING (look)
), bounds AS (
  SELECT * FROM (VALUES
    {", ".join(f"(CAST({k} AS BIGINT), CAST({b!r} AS DOUBLE))" for k, b in enumerate(_GS_BOUNDS))}
  ) AS v(look, bound)
)
SELECT z.look + 1 AS look, z.n_users, z.diff, z.z,
       round(b.bound, 6) AS obf_bound,
       CAST(abs(z.z) > b.bound AS BOOLEAN) AS crossed
FROM z JOIN bounds b ON b.look = z.look
ORDER BY look
""",
    description="Group-sequential A/B monitoring with O'Brien-Fleming "
    "bounds: the two-arm mean-difference z recomputed at 4 weekly looks "
    "on CUMULATIVE per-user spend, each compared to its frozen OBF "
    "boundary (≈ z_K·√(K/k): very wide early, near-nominal at the final "
    "look) — the design that makes weekly peeking safe, where reading "
    "events_ab_test_z every week at ±1.96 silently multiplies the "
    "false-positive rate. Cumulative per-user totals are rebuilt per "
    "look from the (user, week) pre-aggregate — the weekly frame is "
    "tiny, so the look explosion costs 4x a user-domain table, never "
    "4x the events scan; moments flow through the rounded-DECIMAL "
    "contract. Bounds are compile-time literals (no normal quantiles "
    "at runtime).",
    tags=("events", "stats", "experiment"),
)
def events_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = F.least((((F.dayofmonth("ts") - 1) / 8).cast("int")), F.lit(3))
    per_user_week = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"), wk.alias("wk"))
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("v"))
    )
    looks = per_user_week.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("look")
    )
    cum_user = (
        looks.join(per_user_week, F.col("wk") <= F.col("look"))
        .groupBy("look", "user_id", "arm")
        .agg(
            F.round(F.sum("v").cast("double"), 6)
            .cast("decimal(12,6)")
            .alias("y")
        )
    )
    m = cum_user.groupBy("look", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("double").alias("s"),
        F.sum(F.col("y").cast("decimal(20,6)") * F.col("y")).cast("double").alias("ss"),
    )
    a1 = m.filter(F.col("arm") == 1).select(
        "look",
        F.col("n").alias("n1"),
        F.col("s").alias("s1"),
        F.col("ss").alias("ss1"),
    )
    a0 = m.filter(F.col("arm") == 0).select(
        "look",
        F.col("n").alias("n0"),
        F.col("s").alias("s0"),
        F.col("ss").alias("ss0"),
    )
    diff = F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")
    se = F.sqrt(
        (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
        / F.col("n1")
        / F.col("n1")
        + (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
        / F.col("n0")
        / F.col("n0")
    )
    z = a1.join(a0, "look").select(
        "look",
        (F.col("n1") + F.col("n0")).cast("bigint").alias("n_users"),
        F.round(diff, 6).alias("diff"),
        F.round(diff / se, 6).alias("z"),
    )
    bounds = local_df(
        z.sparkSession, [(k, b) for k, b in enumerate(_GS_BOUNDS)], "look INT, bound DOUBLE"
    )
    return (
        z.join(F.broadcast(bounds), "look")
        .select(
            (F.col("look") + 1).alias("look"),
            "n_users",
            "diff",
            "z",
            F.round("bound", 6).alias("obf_bound"),
            (F.abs("z") > F.col("bound")).alias("crossed"),
        )
        
    )
