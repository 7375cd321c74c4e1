"""Forty-fifth wave: delta-method variance for ratio metrics (the
correction that makes per-user ratio experiments honest) and an
hourly-completeness data-quality report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_ratio_delta_method",
    oracle="""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS variant,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
), sums AS (
  SELECT variant,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS syy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxy
  FROM per_user WHERE y > 0 GROUP BY variant
), est AS (
  SELECT variant, CAST(n AS BIGINT) AS n_users,
         CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE) AS r,
         CAST(n AS DOUBLE) AS nd,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
         CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM sums
)
SELECT CAST(variant AS INT) AS variant, n_users,
       round(r, 6) AS ratio,
       round(sqrt(
         ((sxxd - sxd * sxd / nd)
          - 2 * r * (sxyd - sxd * syd / nd)
          + r * r * (syyd - syd * syd / nd))
         / (nd - 1)
         / nd
         / (syd / nd) / (syd / nd)), 8) AS ratio_se
FROM est
ORDER BY variant
""",
    description="Delta-method standard error for a RATIO metric "
    "(purchases per view, summed over users then divided): the naive "
    "per-user-average variance is wrong because both numerator and "
    "denominator are random per user — the delta method corrects with "
    "Var(R) ~ (Sxx_c - 2R*Sxy_c + R^2*Syy_c)/(n-1)/n/ybar^2, the "
    "covariance term being the one experimentation platforms forget. "
    "Every centered sum comes from raw integer power sums (exact "
    "DECIMAL, order-proof; identical discipline to "
    "events_autocorrelation), so both engines produce the identical "
    "standard error bit for bit. Completes the experimentation kit: "
    "SRM gate, two-proportion z, DiD, and now ratio-metric inference. "
    "One per-user aggregate + a 2-row rollup.",
    tags=("events", "stats"),
)
def events_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "x"
            ),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
                "y"
            ),
        )
        .withColumn("variant", F.col("user_id") % 2)
        .where(F.col("y") > 0)
    )
    d19 = "decimal(19,0)"
    sums = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast(d19)).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("y").cast(d19)).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd, sxyd = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    r = sxd / syd
    var = (
        (
            (sxxd - sxd * sxd / nd)
            - 2 * r * (sxyd - sxd * syd / nd)
            + r * r * (syyd - syd * syd / nd)
        )
        / (nd - 1)
        / nd
        / (syd / nd)
        / (syd / nd)
    )
    return sums.select(
        F.col("variant").cast("int").alias("variant"),
        F.col("n").cast("bigint").alias("n_users"),
        F.round(r, 6).alias("ratio"),
        F.round(F.sqrt(var), 8).alias("ratio_se"),
    )


@register(
    "pipeline_completeness_report",
    oracle="""
WITH present AS (
  SELECT DISTINCT date_trunc('day', ts) AS d,
         CAST(EXTRACT(hour FROM ts) AS INT) AS hr
  FROM events
), per_day AS (
  SELECT d, COUNT(*) AS hours_present,
         array_to_string(list_sort(list(hr)), ',') AS present_hours
  FROM present GROUP BY d
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(hours_present AS BIGINT) AS hours_present,
       CAST(24 - hours_present AS BIGINT) AS hours_missing,
       hours_present = 24 AS complete,
       present_hours
FROM per_day
ORDER BY day
""",
    description="Hourly-completeness report: for every calendar day, "
    "which of the 24 expected hours actually contain events — the "
    "ingestion-gap audit run before ANY time-series query is trusted "
    "(a silent 3-hour feed outage reads as a traffic dip to every "
    "downstream aggregate; this report is how you tell the two apart). "
    "One distinct (day, hour) aggregate (725 rows per node-year, "
    "trivially map-side) and a per-day sorted-list rollup; the sorted "
    "hour list is the human-readable evidence trail. Complements "
    "pipeline_dq_expectations (value checks) with coverage checks.",
    tags=("pipeline", "events", "timeseries"),
)
def pipeline_completeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    present = (
        t(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", "ts").alias("d"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .distinct()
    )
    per_day = present.groupBy("d").agg(
        F.count(F.lit(1)).alias("hours_present"),
        F.array_join(F.array_sort(F.collect_list("hr")), ",").alias(
            "present_hours"
        ),
    )
    return per_day.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("hours_present").cast("bigint").alias("hours_present"),
        (24 - F.col("hours_present")).cast("bigint").alias("hours_missing"),
        (F.col("hours_present") == 24).alias("complete"),
        "present_hours",
    )
