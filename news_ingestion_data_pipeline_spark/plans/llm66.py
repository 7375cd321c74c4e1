"""Sixty-sixth wave: the two-arm CUPED readout and vocabulary coverage.

events_cuped_two_arm is what events_cuped_adjustment exists FOR: the
A/B difference read out on the variance-reduced metric, with the raw and
adjusted z side by side so the sensitivity gain is visible.
text_vocab_coverage is the tokenizer-design curve: what fraction of
corpus tokens the top-N vocabulary types cover — the number that sets
vocab size (and explains OOV rates, text_oov_rate's metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_cuped_two_arm",
    oracle="""
WITH per_user AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(round(CAST(CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,10)))
                FILTER (WHERE day(ts) <= 15), 0) AS VARCHAR) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS x6,
         CAST(round(CAST(CAST(COALESCE(SUM(CAST(value AS DECIMAL(20,10)))
                FILTER (WHERE day(ts) > 15), 0) AS VARCHAR) AS DOUBLE), 6)
              AS DECIMAL(12,6)) AS y6
  FROM events GROUP BY user_id
), arm_m AS (
  SELECT arm, COUNT(*) AS n,
         CAST(CAST(SUM(x6) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y6) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x6 AS DECIMAL(20,6)) * x6) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(x6 AS DECIMAL(20,6)) * y6) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(y6 AS DECIMAL(20,6)) * y6) AS VARCHAR) AS DOUBLE) AS syy
  FROM per_user GROUP BY arm
), pooled AS (
  SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
         SUM(sxx) AS tsxx, SUM(sxy) AS tsxy
  FROM arm_m
), theta AS (
  SELECT (tsxy - tsx * tsy / tn) / (tsxx - tsx * tsx / tn) AS th,
         tsx / tn AS mx
  FROM pooled
), adj AS (
  SELECT a.arm, a.n,
         a.sy / a.n AS mean_y,
         a.sy / a.n - t.th * (a.sx / a.n - t.mx) AS mean_adj,
         (a.syy - a.sy * a.sy / a.n) / a.n AS var_y,
         ((a.syy - a.sy * a.sy / a.n)
          - 2 * t.th * (a.sxy - a.sx * a.sy / a.n)
          + t.th * t.th * (a.sxx - a.sx * a.sx / a.n)) / a.n AS var_adj
  FROM arm_m a CROSS JOIN theta t
)
SELECT CAST(a0.n AS BIGINT) AS n_control,
       CAST(a1.n AS BIGINT) AS n_treat,
       round(a1.mean_y - a0.mean_y, 6) AS diff_raw,
       round((a1.mean_y - a0.mean_y)
             / sqrt(a1.var_y / a1.n + a0.var_y / a0.n), 6) AS z_raw,
       round((SELECT th FROM theta), 6) AS theta,
       round(a1.mean_adj - a0.mean_adj, 6) AS diff_cuped,
       round((a1.mean_adj - a0.mean_adj)
             / sqrt(a1.var_adj / a1.n + a0.var_adj / a0.n), 6) AS z_cuped,
       round(1.0 - (a1.var_adj / a1.n + a0.var_adj / a0.n)
                   / (a1.var_y / a1.n + a0.var_y / a0.n), 6) AS var_reduction
FROM (SELECT * FROM adj WHERE arm = 0) a0
CROSS JOIN (SELECT * FROM adj WHERE arm = 1) a1
""",
    description="The two-arm CUPED readout — the deliverable "
    "events_cuped_adjustment's machinery exists for: users split into "
    "arms (user_id parity — the deterministic assignment "
    "events_ab_test_z / events_srm_check use), theta fitted POOLED "
    "across arms (fitting per-arm would bias the difference), and the "
    "treatment effect reported both raw and CUPED-adjusted with their "
    "z statistics side by side — the adjusted z's gain is exactly the "
    "variance_reduction column, i.e. the same experiment read at "
    "higher power with zero extra traffic. All moments flow through "
    "the rounded-DECIMAL per-user frame (the engine's moment "
    "contract); everything after is bounded-domain IEEE arithmetic. "
    "Shape: one per-user aggregate, one 2-group moment aggregate, "
    "1-row glue.",
    tags=("events", "stats", "experiment"),
)
def events_cuped_two_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("value").cast("decimal(20,10)")
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.dayofmonth("ts") <= 15, v)).alias("x_dec"),
            F.sum(F.when(F.dayofmonth("ts") > 15, v)).alias("y_dec"),
        )
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.round(F.coalesce(F.col("x_dec"), F.lit(0)).cast("double"), 6)
            .cast("decimal(12,6)")
            .alias("x6"),
            F.round(F.coalesce(F.col("y_dec"), F.lit(0)).cast("double"), 6)
            .cast("decimal(12,6)")
            .alias("y6"),
        )
    )
    arm_m = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").cast("double").alias("sx"),
        F.sum("y6").cast("double").alias("sy"),
        F.sum(F.col("x6").cast("decimal(20,6)") * F.col("x6")).cast("double").alias("sxx"),
        F.sum(F.col("x6").cast("decimal(20,6)") * F.col("y6")).cast("double").alias("sxy"),
        F.sum(F.col("y6").cast("decimal(20,6)") * F.col("y6")).cast("double").alias("syy"),
    )
    pooled = arm_m.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"),
        F.sum("sxy").alias("tsxy"),
    )
    theta = pooled.select(
        (
            (F.col("tsxy") - F.col("tsx") * F.col("tsy") / F.col("tn"))
            / (F.col("tsxx") - F.col("tsx") * F.col("tsx") / F.col("tn"))
        ).alias("th"),
        (F.col("tsx") / F.col("tn")).alias("mx"),
    )
    adj = arm_m.crossJoin(F.broadcast(theta)).select(
        "arm",
        "n",
        (F.col("sy") / F.col("n")).alias("mean_y"),
        (
            F.col("sy") / F.col("n")
            - F.col("th") * (F.col("sx") / F.col("n") - F.col("mx"))
        ).alias("mean_adj"),
        ((F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")) / F.col("n")).alias(
            "var_y"
        ),
        (
            (
                (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
                - 2 * F.col("th") * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
                + F.col("th")
                * F.col("th")
                * (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            )
            / F.col("n")
        ).alias("var_adj"),
        F.col("th").alias("th"),
    )
    a0 = adj.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"),
        F.col("mean_y").alias("my0"),
        F.col("mean_adj").alias("ma0"),
        F.col("var_y").alias("vy0"),
        F.col("var_adj").alias("va0"),
    )
    a1 = adj.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"),
        F.col("mean_y").alias("my1"),
        F.col("mean_adj").alias("ma1"),
        F.col("var_y").alias("vy1"),
        F.col("var_adj").alias("va1"),
        F.col("th").alias("th"),
    )
    se_raw = F.sqrt(F.col("vy1") / F.col("n1") + F.col("vy0") / F.col("n0"))
    se_adj = F.sqrt(F.col("va1") / F.col("n1") + F.col("va0") / F.col("n0"))
    return a0.crossJoin(F.broadcast(a1)).select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("n1").cast("bigint").alias("n_treat"),
        F.round(F.col("my1") - F.col("my0"), 6).alias("diff_raw"),
        F.round((F.col("my1") - F.col("my0")) / se_raw, 6).alias("z_raw"),
        F.round("th", 6).alias("theta"),
        F.round(F.col("ma1") - F.col("ma0"), 6).alias("diff_cuped"),
        F.round((F.col("ma1") - F.col("ma0")) / se_adj, 6).alias("z_cuped"),
        F.round(
            F.lit(1.0)
            - (F.col("va1") / F.col("n1") + F.col("va0") / F.col("n0"))
            / (F.col("vy1") / F.col("n1") + F.col("vy0") / F.col("n0")),
            6,
        ).alias("var_reduction"),
    )


_VC_TOPS = [10, 100, 1000]


@register(
    "text_vocab_coverage",
    oracle=f"""
WITH tok AS (
  SELECT UNNEST(string_split(trim(lower(text)), ' ')) AS w
  FROM documents WHERE length(trim(text)) > 0
), counts AS (
  SELECT w, COUNT(*) AS c FROM tok GROUP BY w
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn,
         SUM(c) OVER (ORDER BY c DESC, w
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER () AS total,
         COUNT(*) OVER () AS n_types
  FROM counts
), grid AS (SELECT UNNEST([{", ".join(str(n) for n in _VC_TOPS)}]) AS top_n)
SELECT g.top_n,
       CAST(MAX(r.n_types) AS BIGINT) AS n_types_total,
       CAST(MAX(r.total) AS BIGINT) AS total_tokens,
       CAST(MAX(CASE WHEN r.rn = LEAST(g.top_n, r.n_types)
                     THEN r.cum END) AS BIGINT) AS covered_tokens,
       round(CAST(MAX(CASE WHEN r.rn = LEAST(g.top_n, r.n_types)
                           THEN r.cum END) AS DOUBLE)
             / MAX(r.total), 6) AS coverage
FROM grid g CROSS JOIN ranked r
GROUP BY g.top_n
ORDER BY g.top_n
""",
    description=f"Vocabulary coverage curve: the fraction of all corpus "
    f"tokens covered by the top-{{{', '.join(str(n) for n in _VC_TOPS)}}} "
    "most frequent word types — the tokenizer-design number (a vocab "
    "that covers 98% of tokens bounds OOV cost, text_oov_rate's "
    "metric, and the curve's shape is Heaps'/Zipf's law in applied "
    "form next to text_heaps_law / agg_powerlaw_alpha). Exact integer "
    "counts, a (count desc, word) total-order rank, and prefix sums "
    "over the VOCABULARY domain — the histogram-rank pattern, never a "
    "token-domain sort. Shape: one token hash-aggregate shuffle, a "
    "rank over vocab rows, a 3-literal grid lookup.",
    tags=("text", "llm", "tokenizer"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(F.explode(F.split(F.trim(F.lower("text")), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # totals from one aggregate envelope; the head of the frequency
    # order via global top-K (TakeOrderedAndProject, K = max grid cut,
    # a constant) — rank/cum windows then run over K rows only, never
    # the corpus-sized vocabulary
    env = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    top = counts.orderBy(F.col("c").desc(), "w").limit(max(_VC_TOPS))
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = top.select(
        "c",
        F.row_number().over(w_rank).alias("rn"),
        F.sum("c")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    ).crossJoin(F.broadcast(env))
    tops = F.explode(F.array(*[F.lit(n) for n in _VC_TOPS])).alias("top_n")
    out = (
        ranked.select(tops, "rn", "cum", "total", "n_types")
        .groupBy("top_n")
        .agg(
            F.max("n_types").cast("bigint").alias("n_types_total"),
            F.max("total").cast("bigint").alias("total_tokens"),
            F.max(
                F.when(
                    F.col("rn") == F.least(F.col("top_n"), F.col("n_types")),
                    F.col("cum"),
                )
            )
            .cast("bigint")
            .alias("covered_tokens"),
            F.round(
                F.max(
                    F.when(
                        F.col("rn") == F.least(F.col("top_n"), F.col("n_types")),
                        F.col("cum"),
                    )
                ).cast("double")
                / F.max("total"),
                6,
            ).alias("coverage"),
        )
        
    )
    return out
