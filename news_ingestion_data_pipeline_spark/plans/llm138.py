"""Hundred-thirty-eighth wave: Gumbel block maxima and waterfall
enrichment.

  * agg_gumbel_block_maxima — the other half of extreme-value theory
    (agg_tail_pot_gpd ships peaks-over-threshold): monthly block
    maxima of order value, Gumbel location/scale by the method of
    moments (beta = s*sqrt(6)/pi, mu = m - gamma*beta), plus the
    100-block return level mu - beta*ln(-ln(1 - 1/100)).
  * join_waterfall_enrichment — the ETL fallback-chain join: enrich
    orders with a customer segment by (1) exact custkey, else
    (2) a legacy-key match (custkey mod 100 against a stale side
    table), else (3) 'UNKNOWN'.  Two left joins + a priority
    coalesce — the pattern that otherwise degenerates into N
    sequential jobs; match provenance is part of the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_EULER = "0.5772156649015329"
_PI = "3.141592653589793"


@register(
    "agg_gumbel_block_maxima",
    oracle=f"""
WITH blocks AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS mx
  FROM orders GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(mx) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(mx * mx) AS VARCHAR) AS DOUBLE) AS sxx
  FROM blocks
),
m AS (
  SELECT n, sx / n AS mean_mx,
         sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_mx
  FROM s
)
SELECT CAST(n AS BIGINT) AS n_blocks,
       mean_mx,
       sd_mx * sqrt(6.0) / {_PI} AS gumbel_beta,
       mean_mx - {_EULER} * (sd_mx * sqrt(6.0) / {_PI}) AS gumbel_mu,
       (mean_mx - {_EULER} * (sd_mx * sqrt(6.0) / {_PI}))
         - (sd_mx * sqrt(6.0) / {_PI}) * ln(-ln(1.0 - 1.0 / 100.0))
         AS return_level_100
FROM m
""",
    description="Block-maxima extreme-value fit: monthly maxima of order "
    "value, Gumbel parameters by moments (beta = s·sqrt(6)/pi, mu = "
    "mean - EulerGamma·beta) and the 100-block return level mu - "
    "beta·ln(-ln(0.99)) — 'the largest order we should expect across "
    "100 months'. Completes the EVT pair with agg_tail_pot_gpd (POT "
    "fits exceedances; block maxima fit period extremes). Block maxima "
    "are exact decimals, moments come from exact power sums, constants "
    "are pinned literals — one deterministic IEEE chain after the "
    "blocks aggregate, which is itself two map-side-combinable passes.",
    tags=("agg", "stats"),
)
def agg_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    euler, pi = float(_EULER), float(_PI)
    blocks = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(
            F.max(F.col("o_totalprice").cast("decimal(18,2)")).alias("mx")
        )
    )
    s = blocks.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("mx").cast("double").alias("sx"),
        F.sum(F.col("mx") * F.col("mx")).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    sd = F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1)
    )
    m = s.select(
        F.col("n").cast("bigint").alias("n_blocks"),
        mean.alias("mean_mx"),
        sd.alias("sd_mx"),
    )
    beta = F.col("sd_mx") * F.sqrt(F.lit(6.0)) / pi
    mu = F.col("mean_mx") - euler * beta
    import math

    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 100.0))
    return m.select(
        "n_blocks",
        "mean_mx",
        beta.alias("gumbel_beta"),
        mu.alias("gumbel_mu"),
        rl.alias("return_level_100"),
    )


@register(
    "join_waterfall_enrichment",
    oracle="""
WITH legacy AS (
  SELECT c_custkey % 100 AS legacy_key,
         MIN(c_mktsegment) AS legacy_segment
  FROM customer WHERE c_custkey % 7 = 0
  GROUP BY 1
),
enriched AS (
  SELECT o.o_orderkey,
         CASE WHEN c.c_mktsegment IS NOT NULL THEN 'exact'
              WHEN l.legacy_segment IS NOT NULL THEN 'legacy'
              ELSE 'default' END AS match_via,
         COALESCE(c.c_mktsegment, l.legacy_segment, 'UNKNOWN') AS segment
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN legacy l ON o.o_custkey % 100 = l.legacy_key
)
SELECT match_via, segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM enriched
GROUP BY match_via, segment
ORDER BY match_via, segment
""",
    description="Waterfall (fallback-chain) enrichment: orders pick up a "
    "customer segment by exact custkey first, a stale legacy-key table "
    "(custkey mod 100, deterministic MIN-segment dedup) second, and "
    "'UNKNOWN' last — with match provenance in the output, because the "
    "first question after any waterfall is 'how much came from each "
    "rung'. Expressed as two LEFT joins + one priority COALESCE in a "
    "single plan (both sides broadcast-sized here), instead of the "
    "sequential anti-join-then-union jobs this pattern usually decays "
    "into — at 100 TB that is one pass over the facts, not three.",
    tags=("join", "pipeline"),
)
def join_waterfall_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    legacy = (
        cust.filter(F.col("c_custkey") % 7 == 0)
        .groupBy((F.col("c_custkey") % 100).alias("legacy_key"))
        .agg(F.min("c_mktsegment").alias("legacy_segment"))
    )
    orders = t(spark, sf_dir, "orders")
    c = cust.select("c_custkey", "c_mktsegment")
    enriched = (
        orders.join(
            c, orders.o_custkey == c.c_custkey, "left"
        )
        .join(
            # bcast-ok: legacy is an aggregate over c_custkey % 100 — at most
            # 100 rows at any SF, genuinely SF-independent.
            F.broadcast(legacy),
            orders.o_custkey % 100 == legacy.legacy_key,
            "left",
        )
        .select(
            "o_orderkey",
            F.when(F.col("c_mktsegment").isNotNull(), "exact")
            .when(F.col("legacy_segment").isNotNull(), "legacy")
            .otherwise("default")
            .alias("match_via"),
            F.coalesce(
                "c_mktsegment", "legacy_segment", F.lit("UNKNOWN")
            ).alias("segment"),
        )
    )
    return (
        enriched.groupBy("match_via", "segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("min_key"),
        )
        
    )
