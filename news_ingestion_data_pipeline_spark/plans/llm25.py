"""Twenty-fifth wave: span-granularity corpus dedup (the C4/RefinedWeb
trick — dedup repeated SPANS across documents, not whole documents) and
an autocorrelation function computed with exact integer sums so the
Pearson estimate hash-matches the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SPAN_W = 10  # words per dedup span


@register(
    "curation_span_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), spans AS (
  SELECT doc_id, u.si AS span_idx,
         array_to_string(
           toks[u.si * {_SPAN_W} + 1 :
                least((u.si + 1) * {_SPAN_W}, len(toks))], ' ') AS span_text
  FROM d,
       unnest(range(0, CAST(ceil(len(toks) / {_SPAN_W}.0) AS BIGINT))) AS u(si)
), ranked AS (
  SELECT doc_id, span_idx, span_text,
         ROW_NUMBER() OVER (PARTITION BY span_text
                            ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id,
       CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS kept_spans,
       CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS dropped_spans,
       COALESCE(md5(string_agg(span_text, ' ' ORDER BY span_idx)
                    FILTER (WHERE rn = 1)), '') AS new_text_md5
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
""",
    description="Span-granularity corpus deduplication (C4 / RefinedWeb "
    f"style): split every document into fixed {_SPAN_W}-word spans, keep "
    "only the FIRST occurrence of each exact span across the whole corpus "
    "(first-seen = lowest (doc_id, span_idx) — deterministic, order-"
    "independent), and reassemble each document from its surviving spans "
    "in position order. Catches boilerplate repeated across pages that "
    "whole-document dedup misses entirely. Output is per-doc kept/dropped "
    "counts plus the md5 of the reassembled text (compact, hashable "
    "proof of the exact reassembly). Physical shape: one explode, one "
    "hash-shuffle on span_text (the window's partition key — arbitrarily "
    "parallel since spans are the unit), one shuffle back on doc_id; at "
    "100 TB you would pre-hash span_text to a 16-byte key so the shuffle "
    "carries hashes, not strings — the plan is otherwise identical.",
    tags=("curation", "dedup", "text"),
)
def curation_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    toks = spread(t(spark, sf_dir, "documents")).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    spans = (
        toks.groupBy(
            "doc_id", (F.col("pos") / _SPAN_W).cast("long").alias("span_idx")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("span_text")
        )
    )
    ranked = spans.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("span_text").orderBy("doc_id", "span_idx")
        ),
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") == 1, F.struct("span_idx", "span_text"))
                )
            ),
            lambda s: s["span_text"],
        ),
        " ",
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.when(F.col("rn") == 1, 1)).cast("bigint").alias("kept_spans"),
            F.count(F.when(F.col("rn") > 1, 1))
            .cast("bigint")
            .alias("dropped_spans"),
            F.when(F.length(kept_text) > 0, F.md5(kept_text))
            .otherwise(F.lit(""))
            .alias("new_text_md5"),
        )
        
    )


_ACF_LAGS = (1, 2, 3, 6, 12, 24)


@register(
    "events_autocorrelation",
    oracle=f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
  FROM events GROUP BY 1
), lagged AS (
  SELECT x,
         LAG(x, 1) OVER w AS x1, LAG(x, 2) OVER w AS x2,
         LAG(x, 3) OVER w AS x3, LAG(x, 6) OVER w AS x6,
         LAG(x, 12) OVER w AS x12, LAG(x, 24) OVER w AS x24
  FROM hourly WINDOW w AS (ORDER BY h)
), pairs AS (
  SELECT p.lag, p.y, lagged.x
  FROM lagged,
       LATERAL (VALUES (1, x1), (2, x2), (3, x3),
                       (6, x6), (12, x12), (24, x24)) AS p(lag, y)
  WHERE p.y IS NOT NULL
), sums AS (
  SELECT lag,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
FROM sums
ORDER BY lag
""",
    description="Autocorrelation of the hourly event-count series at lags "
    f"{_ACF_LAGS} — the standard seasonality probe (a daily cycle shows "
    "as a bump at lag 24). Estimator is Pearson correlation over the "
    "(x_t, x_t-k) pairs computed from the five raw power sums n, Σx, Σy, "
    "Σxy, Σx², Σy² — counts are integers, so every sum is EXACT decimal "
    "arithmetic (associative → partition-order-proof) and the only "
    "floating-point ops are one final subtraction/sqrt/division both "
    "engines evaluate identically; no mean-centering pass, no "
    "order-dependent double accumulation. Physical shape: one hash "
    "aggregate to hours (map-side combined), one small window over the "
    "hour series (thousands of rows per year even at 100 TB of raw "
    "events — the series, not the events, is what the window sees), one "
    "6-group aggregate.",
    tags=("events", "timeseries", "stats"),
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("h")
    lagged = hourly.select(
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in _ACF_LAGS],
    )
    pairs = (
        lagged.select(
            "x",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"), F.col(f"x{k}").alias("y")
                        )
                        for k in _ACF_LAGS
                    ]
                )
            ).alias("p"),
        )
        .select("x", F.col("p.lag").alias("lag"), F.col("p.y").alias("y"))
        .where(F.col("y").isNotNull())
    )
    d19 = "decimal(19,0)"
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast(d19) * F.col("y").cast(d19))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        sums.select(
            F.col("lag").cast("int").alias("lag"),
            F.col("n").cast("bigint").alias("n_pairs"),
            F.round(num / F.sqrt(dx * dy), 6).alias("acf"),
        )
        
    )
