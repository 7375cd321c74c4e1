"""Thirty-sixth wave: evaluation and operations analytics — a language-ID
confusion matrix (classifier evaluation as a first-class query),
difference-in-differences estimation, and open-order backlog aging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.llm import (
    _lang_case_sql,
    _SQL_TOKENS,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "curation_langid_confusion",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang AS actual_lang,
         {_SQL_TOKENS.format(col=SQL_NORM.format(col='text'))} AS tk
  FROM documents
), pred AS (
  SELECT actual_lang, {_lang_case_sql()} AS pred_lang FROM toks
), conf AS (
  SELECT actual_lang, pred_lang, COUNT(*) AS n FROM pred
  GROUP BY actual_lang, pred_lang
)
SELECT actual_lang, pred_lang,
       CAST(n AS BIGINT) AS n_docs,
       round(CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY actual_lang), 6) AS share_of_actual
FROM conf
ORDER BY actual_lang, pred_lang
""",
    description="Confusion matrix of the heuristic language identifier "
    "against the labeled lang column — classifier evaluation as a "
    "first-class relational query: per (actual, predicted) cell, doc "
    "count and the cell's share of its actual class (the rows of the "
    "per-class recall breakdown). This is the audit you run before "
    "trusting a lang-ID gate to route documents at corpus scale: the "
    "off-diagonal cells ARE the documents a hard filter would misroute. "
    "One projection reusing text_lang_id's exact vote expression, one "
    "|langs|^2-cell hash aggregate, one partitioned window over the "
    "tiny matrix.",
    tags=("curation", "text", "stats"),
)
def curation_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        F.col("lang").alias("actual_lang"),
        TX.lang_id(F.col("text")).alias("pred_lang"),
    )
    conf = d.groupBy("actual_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("actual_lang")
    return (
        conf.select(
            "actual_lang",
            "pred_lang",
            F.col("n").cast("bigint").alias("n_docs"),
            F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias(
                "share_of_actual"
            ),
        )
        
    )


@register(
    "events_did",
    oracle="""
WITH span AS (
  SELECT MIN(epoch_us(ts)) AS t0,
         MIN(epoch_us(ts))
           + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS mid
  FROM events
), cells AS (
  SELECT user_id % 2 AS treated,
         CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END AS post,
         CAST(SUM(CAST(value AS DECIMAL(20,10))) AS DECIMAL(38,10)) AS s,
         COUNT(*) AS n
  FROM events, span
  WHERE event_type = 'purchase'
  GROUP BY 1, 2
), means AS (
  SELECT treated, post,
         CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS m, n
  FROM cells
)
SELECT CAST(t.treated AS INT) AS treated,
       round(pre.m, 6) AS pre_mean,
       round(post.m, 6) AS post_mean,
       CAST(pre.n AS BIGINT) AS n_pre,
       CAST(post.n AS BIGINT) AS n_post,
       round(post.m - pre.m, 6) AS delta,
       round((SELECT post2.m - pre2.m
              FROM means pre2, means post2
              WHERE pre2.treated = 1 AND pre2.post = 0
                AND post2.treated = 1 AND post2.post = 1)
             - (SELECT post3.m - pre3.m
                FROM means pre3, means post3
                WHERE pre3.treated = 0 AND pre3.post = 0
                  AND post3.treated = 0 AND post3.post = 1), 6) AS did_estimate
FROM (SELECT DISTINCT treated FROM means) t
JOIN means pre ON pre.treated = t.treated AND pre.post = 0
JOIN means post ON post.treated = t.treated AND post.post = 1
ORDER BY treated
""",
    description="Difference-in-differences over the purchase-value "
    "metric: the deterministic hash split (user_id % 2, the same "
    "assignment events_ab_test_z and events_srm_check use) crossed with "
    "a pre/post split at the corpus time midpoint gives the classic 2x2 "
    "design; DiD = (treated post - pre) - (control post - pre) removes "
    "the shared time trend a naive post-only comparison conflates with "
    "the effect. Cell means are exact decimal sums divided by integer "
    "counts (one IEEE division each); the whole query is one 4-cell "
    "hash aggregate over the filtered facts plus constant-size glue — "
    "at 100 TB the 2x2 table is the only state.",
    tags=("events", "stats",),
)
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.expr("unix_micros(cast(ts as timestamp))").alias("tus"),
    )
    span = ev.agg(
        (
            F.min("tus")
            + F.expr("(max(tus) - min(tus)) div 2")
        ).alias("mid")
    )
    cells = (
        ev.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(span))
        .groupBy(
            (F.col("user_id") % 2).alias("treated"),
            F.when(F.col("tus") < F.col("mid"), 0).otherwise(1).alias("post"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(20,10)"))
            .cast("decimal(38,10)")
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    means = cells.select(
        "treated",
        "post",
        (F.col("s").cast("string").cast("double") / F.col("n")).alias("m"),
        "n",
    )
    pre = means.where(F.col("post") == 0).select(
        "treated", F.col("m").alias("pre_m"), F.col("n").alias("n_pre")
    )
    post = means.where(F.col("post") == 1).select(
        "treated", F.col("m").alias("post_m"), F.col("n").alias("n_post")
    )
    both = pre.join(post, "treated")
    deltas = both.select("treated", (F.col("post_m") - F.col("pre_m")).alias("dlt"))
    did = (
        deltas.groupBy()
        .pivot("treated", [0, 1])
        .agg(F.first("dlt"))
        .select((F.col("1") - F.col("0")).alias("did"))
    )
    return (
        both.crossJoin(F.broadcast(did))
        .select(
            F.col("treated").cast("int").alias("treated"),
            F.round("pre_m", 6).alias("pre_mean"),
            F.round("post_m", 6).alias("post_mean"),
            F.col("n_pre").cast("bigint").alias("n_pre"),
            F.col("n_post").cast("bigint").alias("n_post"),
            F.round(F.col("post_m") - F.col("pre_m"), 6).alias("delta"),
            F.round("did", 6).alias("did_estimate"),
        )
        
    )


@register(
    "orders_backlog_aging",
    oracle="""
WITH horizon AS (SELECT MAX(o_orderdate) AS h FROM orders),
aged AS (
  SELECT date_diff('day', o_orderdate, h) AS age,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders, horizon
  WHERE o_orderstatus = 'O'
)
SELECT CASE WHEN age <= 30 THEN '0-30'
            WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90'
            ELSE '90+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) AS open_value
FROM aged
GROUP BY 1
ORDER BY age_bucket
""",
    description="Open-order backlog aging: orders still open "
    "(o_orderstatus = 'O') bucketed by days outstanding relative to the "
    "corpus horizon (MAX order date — the deterministic as-of point), "
    "with count and decimal-exact open value per 30-day bucket — the "
    "receivables-aging report every operations dashboard carries. One "
    "filtered scan, a 1-row horizon broadcast, a 4-group aggregate; "
    "the status filter is a pushed-down parquet predicate.",
    tags=("agg", "pipeline"),
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    aged = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("h", "o_orderdate").alias("age"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        aged.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("string").cast("double").alias("open_value"),
        )
        
    )
