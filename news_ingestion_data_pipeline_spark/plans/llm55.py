"""Fifty-fifth wave: leakage-safe feature generation and the remaining
nonparametric experiment toolkit.

feature_point_in_time_join is THE feature-store primitive: every training
row may only see aggregates of events strictly before its own timestamp
(and within a bounded lookback), or the model trains on the future.
agg_mann_whitney_u completes the two-sample family (KS = distribution
shape, MWU = stochastic dominance, CUPED = variance reduction);
events_power_analysis is the pre-experiment sizing query those tests
assume was run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# Point-in-time (leakage-safe) feature join
# ---------------------------------------------------------------------------

_PIT_DAYS = 90


@register(
    "feature_point_in_time_join",
    oracle=f"""
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS as_of,
       CAST(COUNT(*) OVER w - 1 AS BIGINT) AS prior_orders_90d,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                 - CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE)
         AS prior_spend_90d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate) // 86400
             RANGE BETWEEN {_PIT_DAYS} PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey
""",
    description=f"Point-in-time feature join: for every order, the "
    f"customer's order count and spend over the prior {_PIT_DAYS} days "
    "STRICTLY before (and excluding) the row itself — the feature-store "
    "primitive that makes training features leakage-safe (a feature "
    "computed with any post-event data trains the model on the future). "
    "Implemented as ONE range-frame window per customer: the frame "
    "[−90d, now] aggregates in a single pass and the row's own "
    "contribution is subtracted exactly (DECIMAL), which both removes "
    "self-leakage and keeps same-day peer orders out of scope only as "
    "far as the subtraction defines — the contract is explicit and "
    "oracle-certified. Shape: one shuffle on customer, one in-partition "
    "sort, no self-join — the equivalent as-of self-join "
    "(orders × 90 days of orders) would shuffle quadratically per hot "
    "customer; the range frame is why feature backfills scale.",
    tags=("feature", "window", "llm"),
)
def feature_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = (F.unix_timestamp("o_orderdate") / 86400).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-_PIT_DAYS, Window.currentRow)
    )
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("as_of"),
            (F.count(F.lit(1)).over(w) - 1).cast("bigint").alias("prior_orders_90d"),
            (F.sum(dec_price).over(w) - dec_price)
            .cast("double")
            .alias("prior_spend_90d"),
        )
        
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (tie-corrected, normal approximation)
# ---------------------------------------------------------------------------


@register(
    "agg_mann_whitney_u",
    oracle="""
WITH tagged AS (
  SELECT value, day(ts) <= 15 AS in_a FROM events
), n AS (
  SELECT COUNT(*) FILTER (WHERE in_a) AS n1,
         COUNT(*) FILTER (WHERE NOT in_a) AS n2
  FROM tagged
), per_value AS (
  SELECT value,
         COUNT(*) AS c,
         COUNT(*) FILTER (WHERE in_a) AS c1
  FROM tagged GROUP BY value
), ranked AS (
  SELECT value, c, c1,
         SUM(c) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS cum,
         -- average rank of this tie group x2 (kept integral: 2r = 2*cum - c + 1)
         2 * SUM(c) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - c + 1 AS two_r
  FROM per_value
), sums AS (
  SELECT SUM(c1 * two_r) AS two_r1,          -- 2 x rank sum of sample 1
         SUM(c * c * c - c) AS tie_term      -- sum of t^3 - t over tie groups
  FROM ranked
)
SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
       round(CAST(s.two_r1 AS DOUBLE) / 2
             - CAST(n.n1 AS DOUBLE) * (n.n1 + 1) / 2, 4) AS u1,
       round((CAST(s.two_r1 AS DOUBLE) / 2
              - CAST(n.n1 AS DOUBLE) * (n.n1 + 1) / 2)
             / (CAST(n.n1 AS DOUBLE) * n.n2), 6) AS auc,
       round(((CAST(s.two_r1 AS DOUBLE) / 2
               - CAST(n.n1 AS DOUBLE) * (n.n1 + 1) / 2)
              - CAST(n.n1 AS DOUBLE) * n.n2 / 2)
             / sqrt(CAST(n.n1 AS DOUBLE) * n.n2 / 12.0
                    * ((n.n1 + n.n2 + 1)
                       - CAST(s.tie_term AS DOUBLE)
                         / ((n.n1 + n.n2) * (CAST(n.n1 AS DOUBLE) + n.n2 - 1)))),
             6) AS z
FROM sums s CROSS JOIN n
""",
    description="Mann-Whitney U between the month's two halves, "
    "tie-corrected: ranks are midranks over tie groups kept INTEGRAL "
    "(2r = 2·cum − t + 1, so every rank sum is exact integer "
    "arithmetic until the final z), U₁ from the rank sum, the "
    "effect size U/(n₁n₂) — which IS the AUC / P(X>Y) probability — "
    "and the normal-approximation z with the standard tie variance "
    "correction. The rank-based complement to agg_ks_two_sample "
    "(KS detects any shape difference; MWU targets stochastic "
    "dominance and is what A/B platforms use for skewed metrics). "
    "Shape: per-value counts in one partial-agg shuffle, one prefix "
    "sum over the DISTINCT-value domain (the engine's histogram-rank "
    "pattern — never a row-domain sort), then a 1-row moment frame.",
    tags=("agg", "stats", "experiment"),
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = t(spark, sf_dir, "events").select(
        "value", (F.dayofmonth("ts") <= 15).alias("in_a")
    )
    n = tagged.agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n1"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n2"),
    )
    per_value = tagged.groupBy("value").agg(
        F.count(F.lit(1)).alias("c"),
        F.count(F.when(F.col("in_a"), 1)).alias("c1"),
    )
    venv = per_value.agg(
        F.min("value").alias("vlo"), F.max("value").alias("vhi")
    )
    ranked = RK.distributed_prefix_sum(
        per_value.crossJoin(F.broadcast(venv)),
        ["value"],
        RK.range_bucket(F.col("value"), F.col("vlo"), F.col("vhi")),
        ["c"],
        inclusive=True,
    ).select(
        "c",
        "c1",
        (F.lit(2) * F.col("cum_c") - F.col("c") + 1).alias("two_r"),
    )
    sums = ranked.agg(
        F.sum(F.col("c1") * F.col("two_r")).alias("two_r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie_term"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    u1 = F.col("two_r1").cast("double") / 2 - n1d * (F.col("n1") + 1) / 2
    var = (
        n1d
        * F.col("n2")
        / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie_term").cast("double")
            / ((F.col("n1") + F.col("n2")) * (n1d + F.col("n2") - 1))
        )
    )
    z = (u1 - n1d * F.col("n2") / 2) / F.sqrt(var)
    return sums.crossJoin(F.broadcast(n)).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(u1, 4).alias("u1"),
        F.round(u1 / (n1d * F.col("n2")), 6).alias("auc"),
        F.round(z, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# Experiment power analysis (required sample size per MDE)
# ---------------------------------------------------------------------------

# two-sided alpha=0.05 and power=0.80 normal quantiles, frozen literals
_Z_ALPHA = 1.959963984540054
_Z_BETA = 0.8416212335729143
_MDES = [0.01, 0.02, 0.05, 0.10]


@register(
    "events_power_analysis",
    oracle=f"""
WITH m AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(round(value, 6) AS DECIMAL(20,6))
                       * CAST(round(value, 6) AS DECIMAL(12,6))) AS VARCHAR)
              AS DOUBLE) AS ss
  FROM events
), grid AS (SELECT UNNEST([{", ".join(f"CAST({m!r} AS DOUBLE)" for m in _MDES)}]) AS rel_mde)
SELECT g.rel_mde,
       round(m.s / m.n, 6) AS metric_mean,
       round((m.ss - m.s * m.s / m.n) / m.n, 6) AS metric_var,
       CAST(ceil(2.0 * ((m.ss - m.s * m.s / m.n) / m.n)
                 * ({_Z_ALPHA!r} + {_Z_BETA!r}) * ({_Z_ALPHA!r} + {_Z_BETA!r})
                 / ((g.rel_mde * (m.s / m.n)) * (g.rel_mde * (m.s / m.n))))
            AS BIGINT) AS n_per_arm,
       CAST(ceil(2.0 * ((m.ss - m.s * m.s / m.n) / m.n)
                 * ({_Z_ALPHA!r} + {_Z_BETA!r}) * ({_Z_ALPHA!r} + {_Z_BETA!r})
                 / ((g.rel_mde * (m.s / m.n)) * (g.rel_mde * (m.s / m.n))))
            AS BIGINT) * 2 <= m.n AS feasible_now
FROM grid g CROSS JOIN m
ORDER BY g.rel_mde
""",
    description="Pre-experiment power analysis: for each relative MDE "
    "(1/2/5/10% of the metric mean), the required per-arm sample size "
    "n = 2σ²(z_α/2 + z_β)²/δ² at α=0.05 / power 0.80 (quantiles frozen "
    "as literals — no erf in either engine), plus whether the current "
    "traffic already covers two arms. The sizing query every "
    "experimentation platform runs BEFORE the A/B tests the z/MWU/CUPED "
    "family reads out — and the variance input is exactly what "
    "events_cuped_adjustment reduces, so the two compose into 'how much "
    "shorter does CUPED make this test'. Shape: one 3-moment frame over "
    "the metric (values rounded to 6 dp then DECIMAL power sums, the "
    "engine's determinism contract) joined to a 4-literal MDE grid.",
    tags=("events", "stats", "experiment"),
)
def events_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    v6 = F.round(F.col("value"), 6).cast("decimal(12,6)")
    m = t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(20,10)")).cast("double").alias("s"),
        F.sum(v6 * v6).cast("double").alias("ss"),
    )
    grid = m.select(
        F.explode(F.array(*[F.lit(x) for x in _MDES])).alias("rel_mde"),
        "n",
        "s",
        "ss",
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    zsum = F.lit(_Z_ALPHA) + F.lit(_Z_BETA)
    n_arm = F.ceil(
        F.lit(2.0) * var * zsum * zsum / ((F.col("rel_mde") * mean) * (F.col("rel_mde") * mean))
    ).cast("bigint")
    return grid.select(
        "rel_mde",
        F.round(mean, 6).alias("metric_mean"),
        F.round(var, 6).alias("metric_var"),
        n_arm.alias("n_per_arm"),
        (n_arm * 2 <= F.col("n")).alias("feasible_now"),
    )
