"""Hundred-fifty-first wave: effect sizes — Cohen's d and Cliff's
delta.

Significance tests (the Welch/MWU/KW family shipped earlier) say
WHETHER groups differ; effect sizes say HOW MUCH, which is what a
decision actually needs at 100 TB sample sizes where everything is
"significant".

  * agg_cohens_d — standardized mean difference (pooled SD) between
    URGENT and LOW order values, from exact decimal power sums.
  * agg_cliffs_delta — the ordinal effect size: (#(x>y) − #(x<y)) /
    (n·m) over ALL cross pairs, computed EXACTLY via the sorted
    prefix-sum identity (no sampling, no quadratic join) — the same
    one-sort trick as agg_energy_distance, counting instead of
    summing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_cohens_d",
    oracle="""
WITH s AS (
  SELECT o_orderpriority AS g,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                     * CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS sxx
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_orderpriority
),
w AS (
  SELECT MAX(CASE WHEN g = '1-URGENT' THEN n END) AS n1,
         MAX(CASE WHEN g = '5-LOW' THEN n END) AS n2,
         MAX(CASE WHEN g = '1-URGENT' THEN sx END) AS sx1,
         MAX(CASE WHEN g = '5-LOW' THEN sx END) AS sx2,
         MAX(CASE WHEN g = '1-URGENT' THEN sxx END) AS sxx1,
         MAX(CASE WHEN g = '5-LOW' THEN sxx END) AS sxx2
  FROM s
)
SELECT CAST(n1 AS BIGINT) AS n_urgent,
       CAST(n2 AS BIGINT) AS n_low,
       (sx1 / n1 - sx2 / n2)
         / sqrt((((sxx1 - sx1 * sx1 / n1))
                 + ((sxx2 - sx2 * sx2 / n2))) / (n1 + n2 - 2.0)) AS cohens_d
FROM w
""",
    description="Cohen's d between URGENT and LOW order values: "
    "standardized mean difference over the pooled standard deviation, "
    "every moment an exact decimal power sum, the final expression one "
    "deterministic IEEE chain — the effect size that turns the Welch "
    "t-test's 'significant' into 'by a fifth of a standard deviation'. "
    "One grouped pass, a 2-row reduce.",
    tags=("agg", "stats"),
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = F.col("o_totalprice").cast("decimal(18,2)")
    s = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(x * x).cast("double").alias("sxx"),
        )
    )
    u = F.col("o_orderpriority") == "1-URGENT"
    w = s.agg(
        F.max(F.when(u, F.col("n"))).alias("n1"),
        F.max(F.when(~u, F.col("n"))).alias("n2"),
        F.max(F.when(u, F.col("sx"))).alias("sx1"),
        F.max(F.when(~u, F.col("sx"))).alias("sx2"),
        F.max(F.when(u, F.col("sxx"))).alias("sxx1"),
        F.max(F.when(~u, F.col("sxx"))).alias("sxx2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    pooled = F.sqrt(
        (
            (F.col("sxx1") - F.col("sx1") * F.col("sx1") / n1)
            + (F.col("sxx2") - F.col("sx2") * F.col("sx2") / n2)
        )
        / (n1 + n2 - 2.0)
    )
    return w.select(
        n1.cast("bigint").alias("n_urgent"),
        n2.cast("bigint").alias("n_low"),
        ((F.col("sx1") / n1 - F.col("sx2") / n2) / pooled).alias("cohens_d"),
    )


@register(
    "agg_cliffs_delta",
    oracle="""
WITH vals AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'x' ELSE 'y' END AS g,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         o_orderkey AS k
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
byval AS (
  SELECT v,
         SUM(CASE WHEN g = 'x' THEN 1 ELSE 0 END) AS nx_v,
         SUM(CASE WHEN g = 'y' THEN 1 ELSE 0 END) AS ny_v
  FROM vals GROUP BY v
),
cum AS (
  SELECT v, nx_v, ny_v,
         COALESCE(SUM(nx_v) OVER w, 0) AS cx_lt,
         COALESCE(SUM(ny_v) OVER w, 0) AS cy_lt
  FROM byval
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING)
),
counts AS (
  SELECT SUM(nx_v * cy_lt) AS x_gt_y,
         SUM(ny_v * cx_lt) AS y_gt_x,
         SUM(nx_v) AS nx,
         SUM(ny_v) AS ny
  FROM cum
)
SELECT CAST(nx AS BIGINT) AS n_x,
       CAST(ny AS BIGINT) AS n_y,
       CAST(x_gt_y AS BIGINT) AS pairs_x_greater,
       CAST(y_gt_x AS BIGINT) AS pairs_y_greater,
       CAST(x_gt_y - y_gt_x AS DOUBLE) / (nx * ny) AS cliffs_delta
FROM counts
""",
    description="Cliff's delta between URGENT and LOW order values: the "
    "ordinal effect size (#(x>y) − #(x<y))/(n·m) over ALL nx·ny cross "
    "pairs, computed EXACTLY from one distinct-value cumulative table instead of "
    "a quadratic join — each x contributes the count of y strictly below "
    "it (the energy-distance prefix trick, counting not summing; ties "
    "contribute to neither side, per definition). Pure integers until "
    "one final division — the robust companion to Cohen's d when "
    "distributions are skewed. The prefix sum runs as the two-pass "
    "bucketed form (operators/ranking.py) over the distinct-value "
    "histogram — no single-partition window at any SF.",
    tags=("agg", "stats"),
)
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", "x")
            .otherwise("y")
            .alias("g"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
    )
    byval = vals.groupBy("v").agg(
        F.sum(F.when(F.col("g") == "x", 1).otherwise(0)).alias("nx_v"),
        F.sum(F.when(F.col("g") == "y", 1).otherwise(0)).alias("ny_v"),
    )
    venv = byval.agg(F.min("v").alias("vlo"), F.max("v").alias("vhi"))
    cum = RK.distributed_prefix_sum(
        byval.crossJoin(F.broadcast(venv)),
        ["v"],
        RK.range_bucket(F.col("v"), F.col("vlo"), F.col("vhi")),
        ["nx_v", "ny_v"],
        inclusive=False,
    ).select(
        "nx_v",
        "ny_v",
        F.coalesce("cum_nx_v", F.lit(0)).alias("cx_lt"),
        F.coalesce("cum_ny_v", F.lit(0)).alias("cy_lt"),
    )
    counts = cum.agg(
        F.sum(F.col("nx_v") * F.col("cy_lt")).alias("x_gt_y"),
        F.sum(F.col("ny_v") * F.col("cx_lt")).alias("y_gt_x"),
        F.sum("nx_v").alias("nx"),
        F.sum("ny_v").alias("ny"),
    )
    return counts.select(
        F.col("nx").cast("bigint").alias("n_x"),
        F.col("ny").cast("bigint").alias("n_y"),
        F.col("x_gt_y").cast("bigint").alias("pairs_x_greater"),
        F.col("y_gt_x").cast("bigint").alias("pairs_y_greater"),
        (
            (F.col("x_gt_y") - F.col("y_gt_x")).cast("double")
            / (F.col("nx") * F.col("ny"))
        ).alias("cliffs_delta"),
    )
