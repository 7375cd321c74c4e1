"""Sixty-first wave: one-way ANOVA and diversified-set coverage.

events_anova_weekday completes the classical-test family (z-test, KS,
Mann-Whitney, power analysis, CUPED) with the k-group mean comparison —
weekday seasonality tested properly instead of eyeballed.
sim_coverage_radius scores the MMR-diversified selection with the
facility-location objective (how well the 5 picks COVER the corpus), the
metric diversified-retrieval and coreset-selection papers optimize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t


@register(
    "events_anova_weekday",
    oracle="""
WITH tagged AS (
  SELECT dayofweek(ts) AS g,
         CAST(round(value, 6) AS DECIMAL(12,6)) AS v
  FROM events
), grp AS (
  SELECT g, COUNT(*) AS n, SUM(v) AS s,
         SUM(CAST(v AS DECIMAL(20,6)) * v) AS ss
  FROM tagged GROUP BY g
), m AS (
  SELECT COUNT(*) AS k,
         SUM(n) AS tn,
         CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) AS ts_,
         CAST(CAST(SUM(ss) AS VARCHAR) AS DOUBLE) AS tss,
         SUM(CAST(CAST(s AS VARCHAR) AS DOUBLE)
             * CAST(CAST(s AS VARCHAR) AS DOUBLE) / n) AS sum_s2n
  FROM grp
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(tn AS BIGINT) AS n,
       round((sum_s2n - ts_ * ts_ / tn) / (k - 1)
             / ((tss - sum_s2n) / (tn - k)), 6) AS f_stat,
       round((sum_s2n - ts_ * ts_ / tn)
             / (tss - ts_ * ts_ / tn), 6) AS eta_squared,
       CAST(k - 1 AS BIGINT) AS df_between,
       CAST(tn - k AS BIGINT) AS df_within
FROM m
""",
    description="One-way ANOVA of event value across weekday groups: "
    "F = (SSB/(k−1))/(SSW/(N−k)) with every sum of squares assembled "
    "from exact DECIMAL power sums (values rounded once to 6 dp, the "
    "engine's moment-matrix contract) — the k-group mean comparison "
    "that completes the classical-test family (events_ab_test_z for 2 "
    "proportions, agg_mann_whitney_u for 2 ranks, agg_ks_two_sample "
    "for 2 shapes; this for k means), plus η² effect size so a "
    "significant-but-tiny weekday effect isn't over-read. One caveat "
    "handled: the per-group Σx²/n term sums over the 7-GROUP domain "
    "(double arithmetic over a bounded set — deterministic), never "
    "over rows. Shape: one partial-agg shuffle of 7 groups, one 1-row "
    "moment frame; nothing scales worse than the scan.",
    tags=("events", "stats", "experiment"),
)
def events_anova_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    v6 = F.round(F.col("value"), 6).cast("decimal(12,6)")
    grp = (
        t(spark, sf_dir, "events")
        .select(F.dayofweek("ts").alias("g"), v6.alias("v"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v").cast("decimal(20,6)") * F.col("v")).alias("ss"),
        )
    )
    s_d = F.col("s").cast("double")
    m = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("tn"),
        F.sum("s").cast("double").alias("ts_"),
        F.sum("ss").cast("double").alias("tss"),
        F.sum(s_d * s_d / F.col("n")).alias("sum_s2n"),
    )
    ssb = F.col("sum_s2n") - F.col("ts_") * F.col("ts_") / F.col("tn")
    ssw = F.col("tss") - F.col("sum_s2n")
    sst = F.col("tss") - F.col("ts_") * F.col("ts_") / F.col("tn")
    return m.select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("tn").cast("bigint").alias("n"),
        F.round(
            ssb / (F.col("k") - 1) / (ssw / (F.col("tn") - F.col("k"))), 6
        ).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_squared"),
        (F.col("k") - 1).cast("bigint").alias("df_between"),
        (F.col("tn") - F.col("k")).cast("bigint").alias("df_within"),
    )


def _coverage_oracle() -> str:
    mmr = REGISTRY["sim_mmr_diversified"].oracle
    cos = (
        "round(list_dot_product(e.v, s.v) / (sqrt(list_dot_product(e.v, e.v))"
        " * sqrt(list_dot_product(s.v, s.v))), 6)"
    )
    return f"""
WITH sel AS ({mmr}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cov AS (
  SELECT e.vec_id, MAX({cos}) AS best_sim
  FROM e
  JOIN e s ON s.vec_id IN (SELECT neighbor_id FROM sel)
  WHERE e.vec_id NOT IN (SELECT neighbor_id FROM sel)
  GROUP BY e.vec_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_covered_corpus,
       CAST((SELECT COUNT(*) FROM sel) AS BIGINT) AS k_selected,
       round(MIN(best_sim), 6) AS min_coverage,
       round(CAST(CAST(SUM(CAST(best_sim AS DECIMAL(10,6))) AS VARCHAR)
                  AS DOUBLE) / COUNT(*), 6) AS mean_coverage,
       round(CAST(COUNT(*) FILTER (WHERE best_sim >= 0.5) AS DOUBLE)
             / COUNT(*), 6) AS frac_above_half
FROM cov
"""


@register(
    "sim_coverage_radius",
    oracle=_coverage_oracle(),
    description="Facility-location coverage of the MMR-diversified "
    "selection (sim_mmr_diversified's exact 5 picks, reused not "
    "re-derived): every non-selected corpus vector's best cosine to the "
    "selected set, summarized as min (the coverage radius — the "
    "worst-served point), exact-DECIMAL mean (the facility-location "
    "objective coreset-selection maximizes) and the fraction covered at "
    "0.5 — the eval that tells you whether 5 diversified picks actually "
    "SPAN the corpus or just avoid each other. Shape: the selected set "
    "is k rows broadcast against one corpus scan (max-of-5 per row, "
    "map-side); the summary is one aggregate. At 100 TB this is the "
    "standard coreset-quality probe run on a sample of the corpus.",
    tags=("llm", "similarity", "eval"),
)
def sim_coverage_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V

    sel = REGISTRY["sim_mmr_diversified"].fn(spark, sf_dir).select("neighbor_id")
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sel_vecs = F.broadcast(
        e.join(sel, e["vec_id"] == sel["neighbor_id"]).select(
            F.col("vec_id").alias("sid"), F.col("v").alias("sv")
        )
    )
    cos = F.round(
        V.dot(F.col("v"), F.col("sv"))
        / (V.norm(F.col("v")) * V.norm(F.col("sv"))),
        6,
    )
    cov = (
        e.join(F.broadcast(sel), e["vec_id"] == sel["neighbor_id"], "left_anti")
        .crossJoin(sel_vecs)
        .groupBy("vec_id")
        .agg(F.max(cos).alias("best_sim"))
    )
    k = sel.count()
    return cov.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_covered_corpus"),
        F.lit(k).cast("bigint").alias("k_selected"),
        F.round(F.min("best_sim"), 6).alias("min_coverage"),
        F.round(
            F.sum(F.col("best_sim").cast("decimal(10,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_coverage"),
        F.round(
            F.count(F.when(F.col("best_sim") >= 0.5, 1)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("frac_above_half"),
    )
