"""Seventeenth wave: Benford first-digit conformance (the fraud /
data-fabrication screen) and per-user maximum drawdown — each with a
DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

# Benford expected shares log10(1 + 1/d), frozen as literals so both
# engines compare against the identical doubles (no cross-engine log10)
_BENFORD = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def _benford_sql_values() -> str:
    return ", ".join(f"({d}, {_BENFORD[d]!r})" for d in range(1, 10))


@register(
    "agg_benford_first_digit",
    oracle=f"""
WITH expected(digit, p_exp) AS (VALUES {_benford_sql_values()}),
digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1
), obs AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
), tot AS (SELECT SUM(n) AS total FROM obs)
SELECT e.digit,
       COALESCE(o.n, 0) AS n_orders,
       round(CAST(COALESCE(o.n, 0) AS DOUBLE) / tot.total, 6) AS p_obs,
       round(CAST(e.p_exp AS DOUBLE), 6) AS p_exp,
       round(abs(CAST(COALESCE(o.n, 0) AS DOUBLE) / tot.total
                 - CAST(e.p_exp AS DOUBLE)), 6)
         AS abs_dev
FROM expected e LEFT JOIN obs o ON o.digit = e.digit
CROSS JOIN tot
ORDER BY e.digit
""",
    description="Benford's-law first-digit screen over order totals — "
    "the fabrication/fraud detector auditors run on financial columns: "
    "naturally-occurring multiplicative amounts put ~30.1% of first "
    "digits at 1, falling to 4.6% at 9; uniform or invented data "
    "doesn't. The first digit comes from floor + string "
    "head (no float log tricks); expected shares are FROZEN literal "
    "doubles so neither engine computes log10 at query time; the "
    "LEFT JOIN against the expected table keeps all nine digits in "
    "the report even when absent. One digit-keyed aggregate plus a "
    "9-row broadcast — the fixture's synthetic uniform-ish totals "
    "show exactly the non-conformance the screen exists to flag.",
    tags=("agg", "quality", "stats"),
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    expected = local_df(
        spark, [(d, _BENFORD[d]) for d in range(1, 10)], "digit int, p_exp double"
    )
    digits = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    p_obs = F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("total")
    return (
        expected.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.round(p_obs, 6).alias("p_obs"),
            F.round("p_exp", 6).alias("p_exp"),
            F.round(F.abs(p_obs - F.col("p_exp")), 6).alias("abs_dev"),
        )
        
    )


@register(
    "window_drawdown_max",
    oracle="""
WITH cum AS (
  SELECT user_id, event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS VARCHAR) AS DOUBLE) AS cum_value
  FROM events
), dd AS (
  SELECT user_id, event_id, ts_s, cum_value,
         MAX(cum_value) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS running_peak
  FROM cum
)
SELECT user_id,
       round(MAX(running_peak - cum_value), 6) AS max_drawdown,
       round(MAX(cum_value), 6) AS peak_value,
       COUNT(*) AS n_events
FROM dd GROUP BY user_id
ORDER BY user_id
""",
    description="Maximum drawdown per user over the cumulative value "
    "curve — the risk/engagement-collapse metric: largest peak-to-"
    "trough drop of the running total, computed as max(running_peak - "
    "cumulative). Two stacked windows over ONE (user) shuffle: an "
    "exact-DECIMAL cumulative sum (partition-order-proof like every "
    "money sum here), then a running max over it; the final per-user "
    "aggregate reuses the same key. Running peaks compare "
    "correctly-rounded doubles of exact decimal prefixes, so both "
    "engines track the identical peak at every row.",
    tags=("window", "timeseries", "stats"),
)
def window_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    cum_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.sum(F.col("value").cast("decimal(20,10)"))
        .over(cum_w)
        .cast("double")
        .alias("cum_value"),
    )
    peak_w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = cum.withColumn("running_peak", F.max("cum_value").over(peak_w))
    return (
        dd.groupBy("user_id")
        .agg(
            F.round(
                F.max(F.col("running_peak") - F.col("cum_value")), 6
            ).alias("max_drawdown"),
            F.round(F.max("cum_value"), 6).alias("peak_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        
    )
