"""Eighth wave: CDC change-feed application (the Debezium/Delta
CDF-style apply-changes operator) and robust anomaly detection via
median absolute deviation — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "pipeline_cdc_apply",
    oracle="""
WITH base AS (
  SELECT doc_id, lang FROM documents WHERE doc_id % 4 != 0
), changes AS (
  SELECT doc_id,
         doc_id % 5 + 1 AS seq,
         CASE WHEN doc_id % 7 = 0 THEN 'D'
              WHEN doc_id % 3 = 0 THEN 'U'
              ELSE 'I' END AS op,
         upper(lang) AS new_lang
  FROM documents WHERE doc_id % 2 = 0
), latest AS (
  SELECT doc_id, op, new_lang FROM (
    SELECT doc_id, op, new_lang,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1
), applied AS (
  SELECT b.doc_id,
         COALESCE(l.new_lang, b.lang) AS lang
  FROM base b LEFT JOIN latest l ON b.doc_id = l.doc_id
  WHERE l.op IS NULL OR l.op != 'D'
  UNION ALL
  SELECT l.doc_id, l.new_lang AS lang
  FROM latest l
  WHERE l.op != 'D' AND l.doc_id NOT IN (SELECT doc_id FROM base)
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM applied GROUP BY lang ORDER BY lang
""",
    description="CDC apply — the change-data-capture consumer every "
    "warehouse ingest runs (Debezium feed -> Delta APPLY CHANGES shape): "
    "a change stream of (key, seq, op in I/U/D, payload) is first "
    "collapsed to the LATEST op per key by sequence number (out-of-order "
    "arrivals resolved by seq, not arrival), then applied to the base "
    "table in one pass: D drops the key, U/I upserts the new payload, "
    "unmatched inserts append. One window over the (tiny) change feed + "
    "one outer join against the base — at 100 TB the base side is "
    "file-pruned by the change keys' partitions exactly like the MERGE "
    "fast-path. The oracle reconstructs the applied table relationally.",
    tags=("pipeline", "cdc", "upsert"),
)
def pipeline_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0).select("doc_id", "lang")
    changes = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        (F.col("doc_id") % 5 + 1).alias("seq"),
        F.when(F.col("doc_id") % 7 == 0, "D")
        .when(F.col("doc_id") % 3 == 0, "U")
        .otherwise("I")
        .alias("op"),
        F.upper("lang").alias("new_lang"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("seq"))
    latest = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "op", "new_lang")
    )
    joined = base.join(F.broadcast(latest), "doc_id", "full_outer").select(
        "doc_id",
        "lang",
        "op",
        "new_lang",
        F.col("lang").isNotNull().alias("in_base"),
    )
    applied = joined.filter(
        (F.col("op").isNull()) | (F.col("op") != "D")
    ).filter(
        F.col("in_base") | F.col("op").isNotNull()
    ).select(
        "doc_id", F.coalesce("new_lang", "lang").alias("lang")
    )
    return (
        applied.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_ids"),
        )
        
    )


@register(
    "events_anomaly_mad",
    oracle="""
WITH med AS (
  SELECT event_type, median(value) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, med.med,
         median(abs(e.value - med.med)) AS mad
  FROM events e JOIN med ON e.event_type = med.event_type
  GROUP BY e.event_type, med.med
)
SELECT m.event_type,
       round(m.med, 6) AS med,
       round(m.mad, 6) AS mad,
       CAST(SUM(CASE WHEN abs(e.value - m.med) > 5 * m.mad
                      THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       COUNT(*) AS n_events
FROM events e JOIN mad m ON e.event_type = m.event_type
GROUP BY m.event_type, m.med, m.mad
ORDER BY m.event_type
""",
    description="Robust anomaly detection via median absolute deviation "
    "— the outlier flag that survives the outliers themselves (stddev "
    "z-scores are inflated by the very anomalies they hunt; MAD's 50% "
    "breakdown point is why monitoring pipelines use it): per-type "
    "median, then median of absolute deviations, then a 5xMAD flag "
    "pass. Three aggregates over the SAME (event_type) shuffle key — "
    "at scale the two median passes run on the type-partitioned table "
    "without extra exchanges, and exact medians per group cost one "
    "sort each (the approx_percentile twin drops that to a sketch "
    "merge). Median interpolation (mean of middle pair) is the same "
    "IEEE op in both engines.",
    tags=("events", "agg", "anomaly"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    flagged = ev.join(F.broadcast(mad), "event_type")
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.sum(
                (F.abs(F.col("value") - F.col("med")) > 5 * F.col("mad")).cast(
                    "long"
                )
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
            "n_events",
        )
        
    )
