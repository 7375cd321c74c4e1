"""Eighty-second wave: stratified treatment effects and stylometry.

events_stratified_att is the observational-causal companion to the
experiment family: when arms are NOT randomized, stratifying on a
pre-treatment covariate (here: pre-period spend quintiles) and averaging
within-stratum differences is the simplest honest ATT estimator —
subclassification, the precursor of propensity matching.
text_burrows_delta is THE stylometry statistic: z-scored most-frequent-
word profiles compared across sources, the measure authorship
attribution has used for two decades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_ATT_STRATA = 5


@register(
    "events_stratified_att",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(round(CAST(CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,10)))
                FILTER (WHERE day(ts) <= 15), 0) AS VARCHAR) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS x,
         CAST(round(CAST(CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,10)))
                FILTER (WHERE day(ts) > 15), 0) AS VARCHAR) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS y
  FROM events GROUP BY user_id
), strat AS (
  SELECT user_id, arm, y,
         CAST(LEAST((ROW_NUMBER() OVER (ORDER BY x, user_id) - 1)
                    * {_ATT_STRATA} // COUNT(*) OVER (),
                    {_ATT_STRATA - 1}) AS INT)
           AS stratum
  FROM per_user
), cells AS (
  SELECT stratum,
         COUNT(*) FILTER (WHERE arm = 1) AS n1,
         COUNT(*) FILTER (WHERE arm = 0) AS n0,
         CAST(CAST(SUM(y) FILTER (WHERE arm = 1) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(y) FILTER (WHERE arm = 0) AS VARCHAR) AS DOUBLE) AS s0
  FROM strat GROUP BY stratum
), tot AS (SELECT SUM(n1) AS t1 FROM cells)
SELECT c.stratum,
       CAST(c.n1 AS BIGINT) AS n_treated,
       CAST(c.n0 AS BIGINT) AS n_control,
       round(c.s1 / c.n1, 6) AS mean_treated,
       round(c.s0 / c.n0, 6) AS mean_control,
       round(c.s1 / c.n1 - c.s0 / c.n0, 6) AS stratum_effect,
       round((c.s1 / c.n1 - c.s0 / c.n0)
             * c.n1 / t.t1, 6) AS att_contribution
FROM cells c CROSS JOIN tot t
WHERE c.n1 > 0 AND c.n0 > 0
ORDER BY c.stratum
""",
    description="Stratified (subclassification) treatment-effect "
    f"estimation: users split into {_ATT_STRATA} strata by PRE-period "
    "spend rank, and the treated-vs-control outcome difference is "
    "taken WITHIN each stratum, then weighted by the treated count — "
    "the simplest honest ATT estimator for observational data, where "
    "the raw difference (events_cuped_two_arm's diff without "
    "randomization) confounds treatment with whatever drove exposure. "
    "Summing att_contribution gives the ATT; comparing it to the raw "
    "difference measures the confounding the strata removed. Strata "
    "come from an exact (covariate, id)-total-ordered rank — "
    "deterministic quintiles, no quantile approximation. Moments flow "
    "through the rounded-DECIMAL frame. Shape: one per-user aggregate, "
    "one two-pass range-partitioned rank over users (operators/"
    "ranking.py — no single-partition sort), one 5-group cell "
    "aggregate.",
    tags=("events", "stats", "experiment", "causal"),
)
def events_stratified_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("value").cast("decimal(20,10)")
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.when(F.dayofmonth("ts") <= 15, v)), F.lit(0)
                ).cast("double"),
                6,
            )
            .cast("decimal(12,6)")
            .alias("x"),
            F.round(
                F.coalesce(
                    F.sum(F.when(F.dayofmonth("ts") > 15, v)), F.lit(0)
                ).cast("double"),
                6,
            )
            .cast("decimal(12,6)")
            .alias("y"),
        )
        .select("user_id", (F.col("user_id") % 2).alias("arm"), "x", "y")
    )
    env = per_user.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.count(F.lit(1)).alias("n_users"),
    )
    ranked = RK.distributed_row_number(
        per_user.crossJoin(F.broadcast(env)),
        ["x", "user_id"],
        RK.range_bucket(F.col("x"), F.col("xlo"), F.col("xhi")),
        out="rn",
    )
    strat = ranked.select(
        "arm",
        "y",
        F.least(
            ((F.col("rn") - 1) * _ATT_STRATA / F.col("n_users")).cast("int"),
            F.lit(_ATT_STRATA - 1),
        ).alias("stratum"),
    )
    cells = strat.groupBy("stratum").agg(
        F.count(F.when(F.col("arm") == 1, 1)).alias("n1"),
        F.count(F.when(F.col("arm") == 0, 1)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, F.col("y"))).cast("double").alias("s1"),
        F.sum(F.when(F.col("arm") == 0, F.col("y"))).cast("double").alias("s0"),
    )
    tot = cells.agg(F.sum("n1").alias("t1"))
    eff = F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")
    return (
        cells.filter((F.col("n1") > 0) & (F.col("n0") > 0))
        .crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            F.col("n1").cast("bigint").alias("n_treated"),
            F.col("n0").cast("bigint").alias("n_control"),
            F.round(F.col("s1") / F.col("n1"), 6).alias("mean_treated"),
            F.round(F.col("s0") / F.col("n0"), 6).alias("mean_control"),
            F.round(eff, 6).alias("stratum_effect"),
            F.round(eff * F.col("n1") / F.col("t1"), 6).alias("att_contribution"),
        )
        
    )


_BD_TOP = 30  # most frequent words used for the stylometric profile


@register(
    "text_burrows_delta",
    oracle=f"""
WITH tok AS (
  SELECT source, UNNEST(string_split(trim(lower(text)), ' ')) AS w
  FROM documents WHERE length(trim(text)) > 0
), src_tot AS (
  SELECT source, COUNT(*) AS nt FROM tok GROUP BY source
), freq AS (
  SELECT t.source, t.w,
         CAST(COUNT(*) AS DOUBLE) / MAX(st.nt) AS f
  FROM tok t JOIN src_tot st ON st.source = t.source
  GROUP BY t.source, t.w
), top_words AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rn
    FROM tok GROUP BY w
  ) WHERE rn <= {_BD_TOP}
), grid AS (
  SELECT s.source, tw.w, COALESCE(f.f, 0.0) AS f
  FROM (SELECT DISTINCT source FROM tok) s
  CROSS JOIN top_words tw
  LEFT JOIN freq f ON f.source = s.source AND f.w = tw.w
), wstats AS (
  SELECT w,
         CAST(CAST(SUM(CAST(round(f, 9) AS DECIMAL(14,9))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS mu,
         sqrt((CAST(CAST(SUM(CAST(round(f, 9) AS DECIMAL(16,9))
                             * CAST(round(f, 9) AS DECIMAL(14,9))) AS VARCHAR)
                    AS DOUBLE)
               - CAST(CAST(SUM(CAST(round(f, 9) AS DECIMAL(14,9))) AS VARCHAR)
                      AS DOUBLE)
                 * CAST(CAST(SUM(CAST(round(f, 9) AS DECIMAL(14,9))) AS VARCHAR)
                        AS DOUBLE) / COUNT(*)) / COUNT(*)) AS sd
  FROM grid GROUP BY w
), z AS (
  SELECT g.source, g.w,
         CASE WHEN ws.sd = 0 THEN 0.0
              ELSE round((g.f - ws.mu) / ws.sd, 9) END AS z
  FROM grid g JOIN wstats ws ON ws.w = g.w
)
SELECT a.source AS source_a, b.source AS source_b,
       round(CAST(CAST(SUM(CAST(round(abs(a.z - b.z), 9) AS DECIMAL(14,9)))
                       AS VARCHAR) AS DOUBLE) / {_BD_TOP}, 6) AS burrows_delta
FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY burrows_delta, source_a, source_b
LIMIT 20
""",
    description=f"Burrows' Delta between sources: each source's relative "
    f"frequencies of the corpus's {_BD_TOP} most frequent words are "
    "z-scored against the across-source distribution, and Delta is the "
    "mean |z difference| per source pair (20 most similar pairs "
    "reported) — THE stylometry statistic, used for two decades of "
    "authorship attribution, and in a data pipeline the detector for "
    "sources that are the same feed under two names (complementing "
    "curation_neardup_by_source's content-level evidence with "
    "STYLE-level evidence that survives paraphrase). Function words "
    "dominate the top-30, which is exactly Burrows' insight: style "
    "lives in the little words. z-scores and the Delta means flow "
    "through rounded-DECIMAL sums; the pair join runs on the "
    "(source x 30-word) profile domain, never the corpus.",
    tags=("text", "curation", "stats"),
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("source", F.explode(F.split(F.trim(F.lower("text")), " ")).alias("w"))
    )
    src_tot = tok.groupBy("source").agg(F.count(F.lit(1)).alias("nt"))
    freq = (
        tok.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(src_tot), "source")
        .select(
            "source", "w", (F.col("c").cast("double") / F.col("nt")).alias("f")
        )
    )
    top_words = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("w")))
        )
        .filter(F.col("rn") <= _BD_TOP)
        .select("w")
    )
    sources = tok.select("source").distinct()
    grid = (
        sources.crossJoin(F.broadcast(top_words))
        .join(freq, ["source", "w"], "left")
        .select("source", "w", F.coalesce(F.col("f"), F.lit(0.0)).alias("f"))
        .localCheckpoint()
    )
    f9 = F.round("f", 9)
    wstats = grid.groupBy("w").agg(
        (
            F.sum(f9.cast("decimal(14,9)")).cast("double") / F.count(F.lit(1))
        ).alias("mu"),
        F.sqrt(
            (
                F.sum(f9.cast("decimal(16,9)") * f9.cast("decimal(14,9)")).cast(
                    "double"
                )
                - F.sum(f9.cast("decimal(14,9)")).cast("double")
                * F.sum(f9.cast("decimal(14,9)")).cast("double")
                / F.count(F.lit(1))
            )
            / F.count(F.lit(1))
        ).alias("sd"),
    )
    z = grid.join(F.broadcast(wstats), "w").select(
        "source",
        "w",
        F.when(F.col("sd") == 0, F.lit(0.0))
        .otherwise(F.round((F.col("f") - F.col("mu")) / F.col("sd"), 9))
        .alias("z"),
    )
    a, b = z.alias("a"), z.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            F.round(
                F.sum(
                    F.round(F.abs(F.col("a.z") - F.col("b.z")), 9).cast(
                        "decimal(14,9)"
                    )
                ).cast("double")
                / _BD_TOP,
                6,
            ).alias("burrows_delta")
        )
        .orderBy("burrows_delta", "source_a", "source_b")
        .limit(20)
    )
