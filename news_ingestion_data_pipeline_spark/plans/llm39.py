"""Thirty-ninth wave: corpus-shape laws and multi-source incremental
state — discrete power-law exponent fit, Heaps' vocabulary-growth law,
and per-source watermarks (the multi-scraper generalization of the
reference's single shared watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t, ts_str


@register(
    "agg_powerlaw_alpha",
    oracle="""
WITH activity AS (
  SELECT user_id, COUNT(*) AS x FROM events GROUP BY user_id
), s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(ln(CAST(x AS DOUBLE) / 1.0)) AS DOUBLE) AS sum_ln
  FROM activity WHERE x >= 1
)
SELECT CAST(n AS BIGINT) AS n_users,
       round(1.0 + n / sum_ln, 6) AS alpha_hat,
       round((1.0 + n / sum_ln - 1.0) / sqrt(CAST(n AS DOUBLE)), 6)
         AS alpha_se
FROM s
""",
    description="Power-law (Pareto/Zipf) exponent fit over per-user "
    "activity counts: the Hill/Clauset MLE alpha = 1 + n / sum(ln(x/"
    "x_min)) with x_min = 1, plus its asymptotic standard error "
    "(alpha-1)/sqrt(n) — the one-number answer to 'how heavy-tailed is "
    "engagement', which decides whether mean-based capacity planning "
    "(or a salting threshold for skew joins) is even meaningful. The "
    "log-sum is an aggregate of identical doubles in both engines "
    "(order-insensitive to well below the 6-decimal projection; same "
    "adjudication as the entropy queries). One count aggregate + one "
    "2-scalar aggregate.",
    tags=("agg", "stats", "events"),
)
def agg_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    activity = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    s = activity.where(F.col("x") >= 1).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.log(F.col("x").cast("double") / 1.0)).alias("sum_ln"),
    )
    alpha = 1.0 + F.col("n") / F.col("sum_ln")
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(alpha, 6).alias("alpha_hat"),
        F.round((alpha - 1.0) / F.sqrt(F.col("n").cast("double")), 6).alias(
            "alpha_se"
        ),
    )


@register(
    "text_heaps_law",
    oracle="""
WITH half AS (SELECT CAST(MAX(doc_id) AS BIGINT) // 2 AS mid FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), p1 AS (
  SELECT COUNT(*) AS n1, COUNT(DISTINCT tok) AS v1
  FROM toks, half WHERE doc_id <= mid
), p2 AS (
  SELECT COUNT(*) AS n2, COUNT(DISTINCT tok) AS v2
  FROM toks
)
SELECT CAST(n1 AS BIGINT) AS tokens_half,
       CAST(v1 AS BIGINT) AS vocab_half,
       CAST(n2 AS BIGINT) AS tokens_full,
       CAST(v2 AS BIGINT) AS vocab_full,
       round(ln(CAST(v2 AS DOUBLE) / v1) / ln(CAST(n2 AS DOUBLE) / n1), 6)
         AS heaps_beta
FROM p1, p2
""",
    description="Heaps'-law vocabulary-growth estimate: distinct-token "
    "counts at the half corpus (doc_id <= max/2 — a deterministic "
    "prefix, not a random sample) and the full corpus give the growth "
    "exponent beta = ln(V2/V1)/ln(N2/N1); natural text sits near "
    "beta ~ 0.5, while beta near 0 screams template/duplicated content "
    "and beta near 1 screams noise/IDs — the single cheapest corpus-"
    "health number next to the novelty ratio (text_novelty_ratio). Two "
    "token-count + distinct aggregates (the distinct is the only "
    "shuffle, on the token domain) and constant-size arithmetic.",
    tags=("text", "llm", "stats"),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    half = t(spark, sf_dir, "documents").agg(
        F.expr("cast(max(doc_id) as bigint) div 2").alias("mid")
    )
    p1 = (
        toks.crossJoin(F.broadcast(half))
        .where(F.col("doc_id") <= F.col("mid"))
        .agg(
            F.count(F.lit(1)).alias("n1"),
            F.countDistinct("tok").alias("v1"),
        )
    )
    p2 = toks.agg(
        F.count(F.lit(1)).alias("n2"), F.countDistinct("tok").alias("v2")
    )
    return (
        p1.crossJoin(p2)
        .select(
            F.col("n1").cast("bigint").alias("tokens_half"),
            F.col("v1").cast("bigint").alias("vocab_half"),
            F.col("n2").cast("bigint").alias("tokens_full"),
            F.col("v2").cast("bigint").alias("vocab_full"),
            F.round(
                F.log(F.col("v2").cast("double") / F.col("v1"))
                / F.log(F.col("n2").cast("double") / F.col("n1")),
                6,
            ).alias("heaps_beta"),
        )
    )


@register(
    "pipeline_watermark_per_source",
    oracle="""
WITH sources AS (
  SELECT DISTINCT event_type AS source FROM events
), wm AS (
  SELECT event_type AS source,
         MAX(ts) AS latest,
         date_trunc('day', MAX(ts)) AS wm_day
  FROM events GROUP BY event_type
)
SELECT s.source,
       strftime(COALESCE(w.latest, TIMESTAMP '1970-01-01 00:00:00'),
                '%Y-%m-%d %H:%M:%S') AS latest_ts,
       strftime(COALESCE(w.wm_day, TIMESTAMP '1970-01-01 00:00:00'),
                '%Y-%m-%d %H:%M:%S') AS watermark_day,
       w.latest IS NOT NULL AS has_history
FROM sources s LEFT JOIN wm w ON w.source = s.source
ORDER BY s.source
""",
    description="Per-source incremental watermarks — the multi-scraper "
    "generalization of the reference's single shared cutoff "
    "(database_utils/database_methods.py:40-66 computes ONE MAX for all "
    "sources, which makes a fast source re-scan everything a slow "
    "source hasn't published yet; per-source watermarks are the fix "
    "every multi-feed pipeline converges on). MAX + day-trunc per "
    "source with the epoch default for never-seen sources (the "
    "reference's '0001-01-01' default, normalized). One grouped "
    "aggregate — partial max per partition, O(sources) across the "
    "wire.",
    tags=("pipeline",),
)
def pipeline_watermark_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    sources = ev.select(F.col("event_type").alias("source")).distinct()
    wm = ev.groupBy(F.col("event_type").alias("source")).agg(
        F.max("ts").alias("latest"),
        F.date_trunc("day", F.max("ts")).alias("wm_day"),
    )
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    return (
        sources.join(wm, "source", "left")
        .select(
            "source",
            ts_str(F.coalesce("latest", epoch)).alias("latest_ts"),
            ts_str(F.coalesce("wm_day", epoch)).alias("watermark_day"),
            F.col("latest").isNotNull().alias("has_history"),
        )
        
    )
