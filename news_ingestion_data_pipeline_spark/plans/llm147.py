"""Hundred-forty-seventh wave: macro-F1 evaluation and the runs test.

  * text_langid_macro_f1 — the single-number classifier report card:
    per-class precision/recall/F1 for the heuristic language
    identifier against the labeled lang column, macro-averaged so the
    rare class counts as much as the common one (the property micro
    accuracy hides).  Builds on curation_langid_confusion's exact vote
    expression; every ratio is an integer-over-integer division
    snapped to 9-dp decimals, the macro mean an exact decimal average.
  * agg_runs_test — Wald-Wolfowitz randomness check on daily order
    counts: runs of above/below-median observations vs the
    closed-form null (mu = 2ab/n + 1), z-scored.  Complements
    agg_ljung_box: Ljung-Box sees linear autocorrelation, the runs
    test sees ANY sign-pattern clumping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.llm import _lang_case_sql, _SQL_TOKENS
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "text_langid_macro_f1",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang AS actual_lang,
         {_SQL_TOKENS.format(col=SQL_NORM.format(col='text'))} AS tk
  FROM documents
), pred AS (
  SELECT actual_lang, {_lang_case_sql()} AS pred_lang FROM toks
),
classes AS (
  SELECT DISTINCT actual_lang AS cls FROM pred
),
per_class AS (
  SELECT c.cls,
         SUM(CASE WHEN p.actual_lang = c.cls AND p.pred_lang = c.cls
                  THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN p.actual_lang <> c.cls AND p.pred_lang = c.cls
                  THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN p.actual_lang = c.cls AND p.pred_lang <> c.cls
                  THEN 1 ELSE 0 END) AS fn
  FROM classes c CROSS JOIN pred p
  GROUP BY c.cls
),
scored AS (
  SELECT cls, tp, fp, fn,
         CAST(round(CAST(tp AS DOUBLE) / GREATEST(tp + fp, 1), 9)
              AS DECIMAL(18,9)) AS prec9,
         CAST(round(CAST(tp AS DOUBLE) / GREATEST(tp + fn, 1), 9)
              AS DECIMAL(18,9)) AS rec9,
         CAST(round(CAST(2 * tp AS DOUBLE)
                    / GREATEST(2 * tp + fp + fn, 1), 9)
              AS DECIMAL(18,9)) AS f19
  FROM per_class
)
SELECT cls AS lang,
       CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
       CAST(CAST(prec9 AS VARCHAR) AS DOUBLE) AS precision_,
       CAST(CAST(rec9 AS VARCHAR) AS DOUBLE) AS recall_,
       CAST(CAST(f19 AS VARCHAR) AS DOUBLE) AS f1,
       CAST(CAST((SELECT SUM(f19) FROM scored) AS VARCHAR) AS DOUBLE)
         / (SELECT COUNT(*) FROM scored) AS macro_f1
FROM scored
ORDER BY lang
""",
    description="Macro-F1 report card for the heuristic language "
    "identifier: per class, TP/FP/FN against the labeled lang column "
    "(reusing curation_langid_confusion's exact vote expression), "
    "precision/recall/F1 as integer-ratio divisions snapped to 9-dp "
    "decimals (F1 via the 2TP/(2TP+FP+FN) identity — no float "
    "compounding), and the macro average replicated per row from an "
    "exact decimal sum — the evaluation that weighs the rare language "
    "equally, which is the number that matters before a lang gate "
    "routes a 100 TB corpus. One prediction pass, one |classes|-row "
    "reduce.",
    tags=("text", "curation", "stats"),
)
def text_langid_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = t(spark, sf_dir, "documents").select(
        F.col("lang").alias("actual_lang"),
        TX.lang_id(F.col("text")).alias("pred_lang"),
    )
    classes = pred.select(
        F.col("actual_lang").alias("cls")
    ).distinct()
    per_class = (
        classes.crossJoin(pred)
        .groupBy("cls")
        .agg(
            F.sum(
                F.when(
                    (F.col("actual_lang") == F.col("cls"))
                    & (F.col("pred_lang") == F.col("cls")),
                    1,
                ).otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when(
                    (F.col("actual_lang") != F.col("cls"))
                    & (F.col("pred_lang") == F.col("cls")),
                    1,
                ).otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when(
                    (F.col("actual_lang") == F.col("cls"))
                    & (F.col("pred_lang") != F.col("cls")),
                    1,
                ).otherwise(0)
            ).alias("fn"),
        )
    )
    scored = per_class.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp").cast("double")
            / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("prec9"),
        F.round(
            F.col("tp").cast("double")
            / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("rec9"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("f19"),
    ).localCheckpoint()  # read per row and by the macro aggregate
    macro = scored.agg(
        (F.sum("f19").cast("double") / F.count(F.lit(1))).alias("macro_f1")
    )
    return (
        scored.crossJoin(F.broadcast(macro))
        .select(
            F.col("cls").alias("lang"),
            F.col("tp").cast("bigint").alias("tp"),
            F.col("fp").cast("bigint").alias("fp"),
            F.col("fn").cast("bigint").alias("fn"),
            F.col("prec9").cast("double").alias("precision_"),
            F.col("rec9").cast("double").alias("recall_"),
            F.col("f19").cast("double").alias("f1"),
            "macro_f1",
        )
        
    )


@register(
    "agg_runs_test",
    oracle="""
WITH daily AS (
  SELECT epoch(date_trunc('day', o_orderdate))::BIGINT // 86400 AS d,
         COUNT(*) AS x
  FROM orders GROUP BY 1
),
med AS (SELECT CAST(MEDIAN(x) AS DOUBLE) AS m FROM daily),
signs AS (
  SELECT d, CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
  FROM daily
),
runs AS (
  SELECT s,
         CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                OR LAG(s) OVER (ORDER BY d) <> s THEN 1 ELSE 0 END AS brk
  FROM signs
),
agg AS (
  SELECT CAST(SUM(brk) AS BIGINT) AS n_runs,
         CAST(SUM(s) AS BIGINT) AS a,
         CAST(COUNT(*) - SUM(s) AS BIGINT) AS b
  FROM runs
)
SELECT n_runs, a AS n_above, b AS n_below,
       2.0 * a * b / (a + b) + 1.0 AS mu_runs,
       (n_runs - (2.0 * a * b / (a + b) + 1.0))
         / sqrt(2.0 * a * b * (2.0 * a * b - a - b)
                / ((a + b) * (a + b) * (a + b - 1.0))) AS runs_z
FROM agg
""",
    description="Wald-Wolfowitz runs test on daily order counts: "
    "observations dichotomized as above vs at-or-below the exact median "
    "(no drops — ties join the lower side, keeping both sides populated "
    "on sparse series), "
    "runs counted with one lag window, z against the closed-form null "
    "(mu = 2ab/n + 1, the standard variance) — the nonparametric 'are "
    "highs and lows CLUMPED' check that catches regime-switching "
    "patterns linear autocorrelation (agg_ljung_box) can miss. Exact "
    "integer run/side counts; one deterministic IEEE chain for the "
    "z-score. One day-count aggregate, one ordered window over the "
    "calendar-bounded series.",
    tags=("agg", "timeseries", "stats"),
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.expr(
                "unix_micros(date_trunc('day', o_orderdate))"
                " div 86400000000"
            ).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint()  # median and signs both read it
    )
    med = daily.agg(F.median("x").cast("double").alias("m"))
    signs = daily.crossJoin(F.broadcast(med)).select(
        "d", (F.col("x") > F.col("m")).cast("int").alias("s")
    )
    w = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    agg = runs.agg(
        F.sum("brk").cast("bigint").alias("n_runs"),
        F.sum("s").cast("bigint").alias("a"),
        (F.count(F.lit(1)) - F.sum("s")).cast("bigint").alias("b"),
    )
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    mu = 2.0 * a * b / (a + b) + 1.0
    var = (
        2.0
        * a
        * b
        * (2.0 * a * b - a - b)
        / ((a + b) * (a + b) * (a + b - 1.0))
    )
    return agg.select(
        "n_runs",
        F.col("a").alias("n_above"),
        F.col("b").alias("n_below"),
        mu.alias("mu_runs"),
        ((F.col("n_runs") - mu) / F.sqrt(var)).alias("runs_z"),
    )
