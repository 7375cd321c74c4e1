"""Seventy-seventh wave: rolling-origin backtesting and the
quality/quantity tradeoff curve.

agg_rolling_origin_cv generalizes events_forecast_backtest's single
train/test split into the rolling-origin evaluation forecasting practice
demands (one split overfits to one regime; the rolling mean MAE is the
honest number).  curation_quality_token_tradeoff is the curve LLM data
teams actually negotiate over: sweep the quality threshold and watch how
many training tokens survive — the empirical input to 'filter harder vs
train on more' decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_ROC_MIN_TRAIN = 20  # first forecast origin (days of training)


@register(
    "agg_rolling_origin_cv",
    oracle=f"""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS v,
         ROW_NUMBER() OVER (ORDER BY date_trunc('day', ts)) AS idx
  FROM events GROUP BY date_trunc('day', ts)
), folds AS (
  SELECT te.idx AS fold, te.day AS test_day, te.v AS actual,
         CAST(CAST(SUM(CAST(round(tr.v, 9) AS DECIMAL(18,9))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS forecast
  FROM daily te JOIN daily tr ON tr.idx < te.idx
  WHERE te.idx > {_ROC_MIN_TRAIN}
  GROUP BY te.idx, te.day, te.v
)
SELECT CAST(fold - {_ROC_MIN_TRAIN} AS BIGINT) AS fold,
       test_day,
       round(actual, 6) AS actual,
       round(forecast, 6) AS forecast,
       round(abs(actual - forecast), 6) AS abs_err,
       round(CAST(CAST(SUM(CAST(round(abs(actual - forecast), 9)
                                AS DECIMAL(18,9)))
                       OVER (ORDER BY fold
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS VARCHAR) AS DOUBLE)
             / (fold - {_ROC_MIN_TRAIN}), 6) AS running_mae
FROM folds
ORDER BY fold
""",
    description="Rolling-origin cross-validation of the expanding-window "
    f"mean forecast: every day after day {_ROC_MIN_TRAIN} becomes a "
    "test fold whose forecast is fit ONLY on the days before it, with "
    "per-fold absolute error and the running MAE — the forecasting "
    "evaluation that replaces events_forecast_backtest's single split "
    "(one split scores one regime; the rolling mean is the honest "
    "skill number, and its trajectory shows whether more history "
    "helps). The train/test relation is the classic te.idx > tr.idx "
    "triangular join — at the DAILY grain it is #days² ≈ 900 tiny "
    "rows here and stays a per-series triangle at any event volume, "
    "because the corpus-sized work ended at the daily pre-aggregate. "
    "Fold means flow through rounded-DECIMAL sums.",
    tags=("agg", "timeseries", "stats"),
)
def agg_rolling_origin_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
        .withColumn("idx", F.row_number().over(Window.orderBy("day")))
        .localCheckpoint()
    )
    te = daily.select(
        F.col("idx").alias("t_idx"),
        F.col("day").alias("test_day"),
        F.col("v").alias("actual"),
    ).filter(F.col("t_idx") > _ROC_MIN_TRAIN)
    tr = daily.select(F.col("idx").alias("r_idx"), F.col("v").alias("tv"))
    folds = (
        te.join(F.broadcast(tr), F.col("r_idx") < F.col("t_idx"))
        .groupBy("t_idx", "test_day", "actual")
        .agg(
            (
                F.sum(F.round("tv", 9).cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("forecast")
        )
    )
    abs_err = F.abs(F.col("actual") - F.col("forecast"))
    w_run = Window.orderBy("t_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return folds.select(
        (F.col("t_idx") - _ROC_MIN_TRAIN).cast("bigint").alias("fold"),
        "test_day",
        F.round("actual", 6).alias("actual"),
        F.round("forecast", 6).alias("forecast"),
        F.round(abs_err, 6).alias("abs_err"),
        F.round(
            F.sum(F.round(abs_err, 9).cast("decimal(18,9)"))
            .over(w_run)
            .cast("double")
            / (F.col("t_idx") - _ROC_MIN_TRAIN),
            6,
        ).alias("running_mae"),
    )


_QT_THRESHOLDS = [0.0, 0.25, 0.5, 0.75, 0.9]


@register(
    "curation_quality_token_tradeoff",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         -- quality proxy: distinct-token ratio (repetition-free docs
         -- score high), the curation_repetition_filter signal
         round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS q
  FROM documents WHERE length(trim(text)) > 0
), ranked AS (
  SELECT q, n_tok,
         PERCENT_RANK() OVER (ORDER BY q, doc_id) AS pr
  FROM scored
), tot AS (
  SELECT SUM(n_tok) AS all_tok, COUNT(*) AS all_docs FROM scored
), grid AS (SELECT UNNEST([{", ".join(f"CAST({x!r} AS DOUBLE)" for x in _QT_THRESHOLDS)}]) AS thresh)
SELECT g.thresh AS quality_percentile_cut,
       CAST(COUNT(*) FILTER (WHERE r.pr >= g.thresh) AS BIGINT) AS docs_kept,
       CAST(SUM(r.n_tok) FILTER (WHERE r.pr >= g.thresh) AS BIGINT)
         AS tokens_kept,
       round(CAST(SUM(r.n_tok) FILTER (WHERE r.pr >= g.thresh) AS DOUBLE)
             / MAX(t.all_tok), 6) AS token_frac,
       round(CAST(CAST(SUM(CAST(round(r.q, 6) AS DECIMAL(10,6)))
                       FILTER (WHERE r.pr >= g.thresh) AS VARCHAR) AS DOUBLE)
             / COUNT(*) FILTER (WHERE r.pr >= g.thresh), 6)
         AS mean_quality_kept
FROM grid g CROSS JOIN ranked r CROSS JOIN tot t
GROUP BY g.thresh
ORDER BY g.thresh
""",
    description="The quality/quantity tradeoff curve: sweep a quality "
    f"threshold over percentile cuts {_QT_THRESHOLDS} (quality proxy = "
    "distinct-token ratio, curation_repetition_filter's signal) and "
    "report surviving documents, surviving TOKENS, the token fraction "
    "and the mean quality of the kept set — the curve data teams "
    "negotiate over, because training-token count and corpus quality "
    "trade directly (filter at p90 and you train on a tenth of the "
    "tokens; the scaling-law question is whether the quality gain "
    "pays for it). Ranks use the (quality, id) total order so cuts "
    "are deterministic; quality means flow through rounded DECIMAL. "
    "Shape: one scoring scan, one rank over the doc domain, a "
    "5-literal threshold grid aggregate.",
    tags=("curation", "llm"),
)
def curation_quality_token_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    scored = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.size(toks).alias("n_tok"),
            F.round(
                F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
            ).alias("q"),
        )
    )
    # PERCENT_RANK over the (q, doc_id) TOTAL order == (rn-1)/(n-1)
    # from the two-pass global rank (operators/ranking.py) — no ties,
    # no single-partition sort
    qenv = scored.agg(
        F.min("q").alias("qlo"),
        F.max("q").alias("qhi"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    ranked = RK.distributed_row_number(
        scored.crossJoin(F.broadcast(qenv)),
        ["q", "doc_id"],
        RK.range_bucket(F.col("q"), F.col("qlo"), F.col("qhi")),
        out="rn",
    ).select(
        "q",
        "n_tok",
        F.when(
            F.col("n_docs") > 1,
            (F.col("rn") - 1).cast("double") / (F.col("n_docs") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("pr"),
    )
    tot = scored.agg(
        F.sum("n_tok").alias("all_tok"), F.count(F.lit(1)).alias("all_docs")
    )
    grid = ranked.crossJoin(F.broadcast(tot)).select(
        "q",
        "n_tok",
        "pr",
        "all_tok",
        F.explode(F.array(*[F.lit(x) for x in _QT_THRESHOLDS])).alias("thresh"),
    )
    kept = F.col("pr") >= F.col("thresh")
    return (
        grid.groupBy(F.col("thresh").alias("quality_percentile_cut"))
        .agg(
            F.count(F.when(kept, 1)).cast("bigint").alias("docs_kept"),
            F.sum(F.when(kept, F.col("n_tok"))).cast("bigint").alias("tokens_kept"),
            F.round(
                F.sum(F.when(kept, F.col("n_tok"))).cast("double")
                / F.max("all_tok"),
                6,
            ).alias("token_frac"),
            F.round(
                F.sum(F.when(kept, F.round("q", 6).cast("decimal(10,6)"))).cast(
                    "double"
                )
                / F.count(F.when(kept, 1)),
                6,
            ).alias("mean_quality_kept"),
        )
        
    )
