"""Eighty-fifth wave: Benjamini-Hochberg FDR across a metric family.

agg_bh_fdr_correction closes the multiple-testing gap: when one
experiment reads out five per-event-type z-tests, the naive ±1.96 rule
inflates the family-wise false-positive rate; BH step-up controls the
false-discovery rate instead. The BH p-value thresholds translate to
|z| thresholds through the inverse normal CDF, which is evaluated ONCE
per rank at query-generation time (Acklam's rational approximation,
pure Python) and frozen as literals — no erf in either engine.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

_BH_Q = 0.1  # target false-discovery rate
_BH_M = 5    # number of tests (event types)


def _inv_norm(p: float) -> float:
    """Acklam's rational approximation to the standard normal quantile
    (max abs error ~1.15e-9) — public-domain algorithm, used only at
    query-generation time to freeze thresholds as literals."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        return -_inv_norm(1 - p)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )


# |z| threshold for BH rank i (1-based): z such that 2(1-Phi(z)) = q*i/m
_BH_Z = [round(-_inv_norm(_BH_Q * i / _BH_M / 2), 6) for i in range(1, _BH_M + 1)]

_Z_SQL = """
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY user_id, user_id % 2, event_type
), cells AS (
  SELECT event_type,
         COUNT(*) FILTER (WHERE arm = 1) AS n1,
         COUNT(*) FILTER (WHERE arm = 0) AS n0,
         CAST(SUM(n_events) FILTER (WHERE arm = 1) AS DOUBLE) AS s1,
         CAST(SUM(n_events) FILTER (WHERE arm = 0) AS DOUBLE) AS s0,
         CAST(SUM(n_events * n_events) FILTER (WHERE arm = 1) AS DOUBLE) AS ss1,
         CAST(SUM(n_events * n_events) FILTER (WHERE arm = 0) AS DOUBLE) AS ss0
  FROM per_user GROUP BY event_type
), z AS (
  SELECT event_type,
         round((s1 / n1 - s0 / n0)
               / sqrt((ss1 - s1 * s1 / n1) / n1 / n1
                      + (ss0 - s0 * s0 / n0) / n0 / n0), 6) AS z
  FROM cells
)"""


def _bh_oracle() -> str:
    thresh_rows = ", ".join(
        f"({i + 1}, CAST({z!r} AS DOUBLE))" for i, z in enumerate(_BH_Z)
    )
    return f"""{_Z_SQL},
ranked AS (
  SELECT event_type, z, abs(z) AS az,
         ROW_NUMBER() OVER (ORDER BY abs(z) DESC, event_type) AS rnk
  FROM z
), thresh AS (
  SELECT * FROM (VALUES {thresh_rows}) AS v(rnk, z_cut)
), marked AS (
  SELECT r.event_type, r.z, r.az, r.rnk, t.z_cut,
         r.az >= t.z_cut AS raw_pass
  FROM ranked r JOIN thresh t USING (rnk)
), cutoff AS (
  SELECT COALESCE(MAX(rnk), 0) AS k FROM marked WHERE raw_pass
)
SELECT m.event_type, m.z, CAST(m.rnk AS BIGINT) AS rnk,
       round(m.z_cut, 6) AS bh_z_threshold,
       CAST(m.rnk <= c.k AS BOOLEAN) AS significant_fdr,
       CAST(m.az >= 1.959964 AS BOOLEAN) AS naive_significant
FROM marked m CROSS JOIN cutoff c
ORDER BY m.rnk
"""


@register(
    "agg_bh_fdr_correction",
    oracle=_bh_oracle(),
    description=f"Benjamini-Hochberg FDR correction (q = {_BH_Q}) across "
    "the five per-event-type activity z-tests: tests rank by |z|, each "
    "rank gets the |z| threshold equivalent to the BH p-cut q·i/m "
    "(inverse-normal evaluated ONCE per rank at query-generation time "
    "via Acklam's public rational approximation and frozen as literals "
    "— no erf at runtime in either engine), and the step-UP rule marks "
    "every test at or above the largest passing rank — the multiple-"
    "testing discipline that reading five events_ab_test_z outputs at "
    "±1.96 silently lacks (the naive flag is reported alongside so the "
    "difference is visible). Per-type z statistics come from exact "
    "integer power sums of per-user event counts. Shape: one per-user "
    "aggregate, one 5-group moment frame, a 5-row rank + VALUES join.",
    tags=("agg", "stats", "experiment"),
)
def agg_bh_fdr_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    cells = per_user.groupBy("event_type").agg(
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_events"))).cast("double").alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_events"))).cast("double").alias("s0"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_events") * F.col("n_events")))
        .cast("double")
        .alias("ss1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n_events") * F.col("n_events")))
        .cast("double")
        .alias("ss0"),
    )
    zexpr = F.round(
        (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0"))
        / F.sqrt(
            (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / F.col("n1")
            / F.col("n1")
            + (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
            / F.col("n0")
            / F.col("n0")
        ),
        6,
    )
    z = cells.select("event_type", zexpr.alias("z"))
    ranked = z.select(
        "event_type",
        "z",
        F.abs("z").alias("az"),
        F.row_number()
        .over(Window.orderBy(F.abs("z").desc(), F.col("event_type")))
        .alias("rnk"),
    )
    thresh = local_df(
        z.sparkSession, [(i + 1, float(zc)) for i, zc in enumerate(_BH_Z)], "rnk INT, z_cut DOUBLE"
    )
    marked = ranked.join(F.broadcast(thresh), "rnk").withColumn(
        "raw_pass", F.col("az") >= F.col("z_cut")
    )
    cutoff = marked.agg(
        F.coalesce(F.max(F.when(F.col("raw_pass"), F.col("rnk"))), F.lit(0)).alias(
            "k"
        )
    )
    return (
        marked.crossJoin(F.broadcast(cutoff))
        .select(
            "event_type",
            "z",
            F.col("rnk").cast("bigint").alias("rnk"),
            F.round("z_cut", 6).alias("bh_z_threshold"),
            (F.col("rnk") <= F.col("k")).alias("significant_fdr"),
            (F.col("az") >= 1.959964).alias("naive_significant"),
        )
        
    )
