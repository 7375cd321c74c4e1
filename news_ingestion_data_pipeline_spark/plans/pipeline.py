"""Reference-pipeline semantics re-expressed over the test corpus.

The articles tables don't exist in /root/testdata, so each reference
operator runs against the closest fixture: md5 keying + dedup over
``documents`` (the text-bearing table), watermark/top-N/incremental-cutoff
over ``events`` (the timestamped stream table). Reference citations in each
description.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.registry import register, t, ts_str

#: DuckDB equivalent of TX.normalize_text (note the 'g' global-replace flag —
#: Spark's regexp_replace is global by default, DuckDB's is not).
SQL_NORM = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@register(
    "pipeline_md5_keying",
    oracle="""
SELECT doc_id, md5(text) AS article_id, length(text) AS text_len
FROM documents
""",
    description="Deterministic md5 content keys — the reference's "
    "generate_article_id (helper_utils/helpers.py:40-50) as F.md5.",
    tags=("pipeline",),
)
def pipeline_md5_keying(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5("text").alias("article_id"),
        F.length("text").alias("text_len"),
    )


@register(
    "pipeline_exact_dedup",
    oracle=f"""
SELECT fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM (SELECT doc_id, md5({SQL_NORM.format(col='text')}) AS fingerprint FROM documents)
GROUP BY fingerprint
""",
    description="Exact dedup by normalized-text fingerprint (the reference's "
    "seen_article_ids in-batch dedup F4, PhocusWire/PhocusWireSource.py:155-158, "
    "generalized to content identity). Hash-aggregate; shuffle carries only "
    "(fingerprint, min_id, count).",
    tags=("pipeline", "dedup"),
)
def pipeline_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators.dedup import exact_dedup

    return exact_dedup(t(spark, sf_dir, "documents"))


@register(
    "pipeline_watermark_scan",
    oracle="""
SELECT strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
       strftime(date_trunc('day', MAX(ts)), '%Y-%m-%d %H:%M:%S') AS watermark_day
FROM events
""",
    description="Watermark scan: ungrouped MAX + day truncation — "
    "Database.get_latest_news_time (database_utils/database_methods.py:40-66). "
    "Partial max per partition; O(groups)=O(1) across the wire.",
    tags=("pipeline",),
)
def pipeline_watermark_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").agg(
        ts_str(F.max("ts")).alias("latest_ts"),
        ts_str(F.date_trunc("day", F.max("ts"))).alias("watermark_day"),
    )


@register(
    "pipeline_incremental_cutoff",
    oracle="""
SELECT event_id, user_id, event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts
FROM events
WHERE ts IS NULL OR ts >= TIMESTAMP '2024-01-25 00:00:00'
""",
    description="Strict-< incremental cutoff: rows on/after the watermark "
    "pass, NULL timestamps pass (reference F3, "
    "Skift/SkiftSource.py:165-173 — boundary day re-ingested by design).",
    tags=("pipeline",),
)
def pipeline_incremental_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    wm = F.lit("2024-01-25 00:00:00").cast("timestamp")
    return ev.filter(F.col("ts").isNull() | (F.col("ts") >= wm)).select(
        "event_id", "user_id", "event_type", ts_str("ts").alias("ts")
    )


@register(
    "pipeline_topn_latest",
    oracle="""
SELECT event_id, user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(value AS DOUBLE) AS value
FROM events
ORDER BY ts DESC NULLS LAST, event_id
LIMIT 10
""",
    description="Top-N latest — the reference's one consumer query "
    "(Database.query_topn_articles, database_utils/database_methods.py:109-130). "
    "Planned as TakeOrderedAndProject: per-partition top-K, driver merge, "
    "no global sort.",
    tags=("pipeline", "topk"),
)
def pipeline_topn_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc_nulls_last(), F.col("event_id"))
        .limit(10)
        .select(
            "event_id", "user_id", "event_type",
            ts_str("ts").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
    )


@register(
    "pipeline_upsert_merge",
    oracle="""
WITH target AS (
  SELECT doc_id, md5(text) AS content_key, 'old' AS version
  FROM documents WHERE doc_id % 3 != 0
), updates AS (
  SELECT doc_id, md5(text) AS content_key, 'new' AS version
  FROM documents WHERE doc_id % 2 = 0
)
SELECT doc_id, content_key, version FROM updates
UNION ALL
SELECT t.doc_id, t.content_key, t.version FROM target t
WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.doc_id = t.doc_id)
""",
    description="Keyed upsert (MERGE) semantics: update-all on match, insert "
    "on no-match — Database.upsert_articles "
    "(database_utils/database_methods.py:68-107) as anti-join + union; the "
    "batch side broadcasts, so the merge is one pass over the target.",
    tags=("pipeline",),
)
def pipeline_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators.upsert import merge_upsert_frames

    docs = t(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("Article_id"),
        F.md5("text").alias("content_key"),
        F.lit("old").alias("version"),
    )
    updates = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("Article_id"),
        F.md5("text").alias("content_key"),
        F.lit("new").alias("version"),
    )
    merged = merge_upsert_frames(target, updates)
    return merged.select(
        F.col("Article_id").alias("doc_id"), "content_key", "version"
    )


@register(
    "pipeline_first_seen_dedup",
    oracle="""
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    description="First-seen-wins dedup per (user,type) — the scan-order "
    "seen-set semantics (F4) made explicit with a deterministic ordering.",
    tags=("pipeline", "dedup"),
)
def pipeline_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )
