"""Hundred-forty-eighth wave: Kruskal-Wallis and Brown-Forsythe.

  * agg_kruskal_wallis — the k-sample generalization of Mann-Whitney:
    do the five order priorities share a location?  Global average
    ranks (ties → (first+last)/2 in exact .5-step decimals), per-group
    rank sums, H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1) with the standard
    tie correction 1 − Σ(t³−t)/(N³−N).
  * agg_levene_test — variance homogeneity before trusting any pooled
    test: the Brown-Forsythe variant (deviations from the GROUP MEDIAN,
    robust to skew) fed into a one-way ANOVA F from exact decimal
    power sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_kruskal_wallis",
    oracle="""
WITH vals AS (
  SELECT o_orderpriority AS g,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         o_orderkey AS k
  FROM orders
),
ranked AS (
  SELECT g, v,
         RANK() OVER (ORDER BY v) AS rfirst,
         COUNT(*) OVER (PARTITION BY v) AS nties
  FROM vals
),
avgr AS (
  SELECT g, CAST(rfirst + (nties - 1) / 2.0 AS DECIMAL(18,1)) AS r,
         nties
  FROM ranked
),
groups AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n_j,
         SUM(r) AS r_j
  FROM avgr GROUP BY g
),
ties AS (
  SELECT COALESCE(SUM(t * t * t - t), 0) AS tie_adj FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS t FROM vals GROUP BY v
    HAVING COUNT(*) > 1
  )
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
h AS (
  SELECT (SELECT n FROM tot) AS n,
         CAST(CAST(SUM(CAST(round(
           CAST(CAST(r_j AS VARCHAR) AS DOUBLE)
           * CAST(CAST(r_j AS VARCHAR) AS DOUBLE) / n_j, 6)
           AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_r2n,
         CAST(COUNT(*) AS BIGINT) AS k_groups
  FROM groups
)
SELECT k_groups,
       CAST(n AS BIGINT) AS n_total,
       (12.0 / (n * (n + 1.0)) * sum_r2n - 3.0 * (n + 1.0))
         / (1.0 - CAST((SELECT tie_adj FROM ties) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * n * n - n)) AS kw_h
FROM h
""",
    description="Kruskal-Wallis rank test across the five order "
    "priorities: global average ranks with exact .5-step tie handling "
    "(DECIMAL(18,1), the Wilcoxon recipe), per-group rank sums in exact "
    "decimals, H = 12/(N(N+1))·Σ R²/n − 3(N+1) over the standard tie "
    "correction 1 − Σ(t³−t)/(N³−N) — the k-sample 'same location?' "
    "test the MWU/ANOVA pair can't give you when groups exceed two and "
    "normality is off the table. The rank stage is the distributed "
    "tie-averaged rank MAP over distinct values (operators/ranking.py: "
    "value-range buckets + broadcast prefix offsets — no row-domain "
    "sort), folded against the (group, value) histogram so ranks never "
    "materialize per row; everything after is a 5-row reduce.",
    tags=("agg", "stats"),
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    env = vals.agg(F.min("v").alias("vlo"), F.max("v").alias("vhi"))
    rmap = RK.distributed_avg_rank(
        vals.crossJoin(F.broadcast(env)),
        "v",
        RK.range_bucket(F.col("v"), F.col("vlo"), F.col("vhi")),
        out="r",
    )
    h_gv = vals.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c_gv"))
    groups = (
        h_gv.join(rmap, "v")
        .groupBy("g")
        .agg(
            F.sum("c_gv").alias("n_j"),
            F.sum(F.col("c_gv") * F.col("r")).alias("r_j"),
        )
    )
    ties = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * F.col("t") * F.col("t") - F.col("t")
                ),
                F.lit(0),
            ).alias("tie_adj")
        )
    )
    tot = vals.agg(F.count(F.lit(1)).alias("n"))
    h = groups.agg(
        F.sum(
            F.round(
                F.col("r_j").cast("double")
                * F.col("r_j").cast("double")
                / F.col("n_j"),
                6,
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("sum_r2n"),
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
    )
    joined = h.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(ties))
    n = F.col("n").cast("double")
    raw_h = 12.0 / (n * (n + 1.0)) * F.col("sum_r2n") - 3.0 * (n + 1.0)
    corr = 1.0 - F.col("tie_adj").cast("double") / (n * n * n - n)
    return joined.select(
        "k_groups",
        F.col("n").cast("bigint").alias("n_total"),
        (raw_h / corr).alias("kw_h"),
    )


@register(
    "agg_levene_test",
    oracle="""
WITH vals AS (
  SELECT o_orderpriority AS g, o_totalprice AS v FROM orders
),
meds AS (
  SELECT g, CAST(MEDIAN(v) AS DOUBLE) AS med FROM vals GROUP BY g
),
devs AS (
  SELECT vals.g,
         CAST(round(abs(vals.v - meds.med), 6) AS DECIMAL(12,6)) AS z
  FROM vals JOIN meds ON meds.g = vals.g
),
grp AS (
  SELECT g,
         CAST(COUNT(*) AS BIGINT) AS n_j,
         SUM(z) AS sz,
         -- widen one operand: DuckDB multiplies p<=18 decimals in INT64
         -- and overflows even when the result precision fits
         SUM(CAST(z AS DECIMAL(19,6)) * z) AS szz
  FROM devs GROUP BY g
),
tot AS (
  SELECT CAST(SUM(n_j) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(CAST(SUM(sz) AS VARCHAR) AS DOUBLE) AS sz_all
  FROM grp
),
parts AS (
  SELECT
    (SELECT n FROM tot) AS n, (SELECT k FROM tot) AS k,
    CAST(CAST(SUM(CAST(round(
      CAST(CAST(sz AS VARCHAR) AS DOUBLE)
      * CAST(CAST(sz AS VARCHAR) AS DOUBLE) / n_j, 6)
      AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE) AS sum_m2,
    CAST(CAST(SUM(szz) AS VARCHAR) AS DOUBLE) AS szz_all
  FROM grp
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n AS BIGINT) AS n_total,
       ((sum_m2 - (SELECT sz_all FROM tot) * (SELECT sz_all FROM tot) / n)
        / (k - 1.0))
       / ((szz_all - sum_m2) / (n - k)) AS bf_f
FROM parts
""",
    description="Brown-Forsythe (median-centered Levene) variance-"
    "homogeneity test across order priorities: per-group EXACT median "
    "centers (robust where mean-centered Levene isn't), absolute "
    "deviations snapped to 6-dp decimals, and the one-way ANOVA F over "
    "the deviations assembled entirely from exact decimal power sums — "
    "between-group MS over within-group MS, bit-identical cross-engine. "
    "The gatekeeper you run before pooling variances in the t/ANOVA "
    "family. Two passes over the fact table (medians, then deviations), "
    "each map-side-combined.",
    tags=("agg", "stats"),
)
def agg_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"), F.col("o_totalprice").alias("v")
    )
    meds = vals.groupBy("g").agg(
        F.median("v").cast("double").alias("med")
    )
    devs = vals.join(F.broadcast(meds), "g").select(
        "g",
        F.round(F.abs(F.col("v") - F.col("med")), 6)
        .cast("decimal(12,6)")
        .alias("z"),
    )
    grp = devs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    parts = grp.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("sz").cast("double").alias("sz_all"),
        F.sum(
            F.round(
                F.col("sz").cast("double")
                * F.col("sz").cast("double")
                / F.col("n_j"),
                6,
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("sum_m2"),
        F.sum("szz").cast("double").alias("szz_all"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    between = (
        F.col("sum_m2") - F.col("sz_all") * F.col("sz_all") / n
    ) / (k - 1.0)
    within = (F.col("szz_all") - F.col("sum_m2")) / (n - k)
    return parts.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        (between / within).alias("bf_f"),
    )
