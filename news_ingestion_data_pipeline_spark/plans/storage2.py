"""Second storage wave: schema evolution across batches, small-file
compaction (the table-maintenance op), and DELETE WHERE on the
manifest-commit table (retention/GDPR deletes as snapshot rewrites) —
each with a DuckDB oracle; layout assertions live in
tests/test_storage.py.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import dsum, register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("storage2")


def _sfx(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "scan_schema_evolution",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_status,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Schema evolution across producer generations: an early "
    "batch writes (key, priority, price), a later batch adds an "
    "o_orderstatus column; mergeSchema=true reconciles the footers at "
    "read time into the union schema, with the missing column NULL for "
    "old files — no rewrite of history, the way a long-lived 100 TB "
    "table actually absorbs new columns. The aggregate counts rows that "
    "carry the evolved column; the oracle derives the same split from "
    "the key parity that defined the batches, so the hash-match "
    "certifies both data fidelity and NULL-backfill semantics.",
    tags=("scan", "storage", "schema"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    path = f"{_ROOT}/orders_evolved_{_sfx(sf_dir)}"
    shutil.rmtree(path, ignore_errors=True)
    orders = t(spark, sf_dir, "orders")
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .coalesce(2)
        .write.mode("append")
        .parquet(path)
    )
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")
        .coalesce(2)
        .write.mode("append")
        .parquet(path)
    )
    evolved = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        evolved.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_orderstatus").isNotNull().cast("long")).alias(
                "n_with_status"
            ),
            dsum("o_totalprice").alias("revenue"),
        )
        
    )


@register(
    "storage_compact_small_files",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    description="Small-file compaction — the table-maintenance operation "
    "every streaming-ingested 100 TB table needs: a 64-file fragmented "
    "layout (what per-trigger micro-batch writes produce) is rewritten "
    "into 4 right-sized files. Small files poison scans (per-file open/"
    "footer cost, tiny row groups defeat vectorized reads) and the "
    "driver's file index; compaction is a pure physical rewrite, which "
    "the oracle certifies by hash-matching the compacted table's "
    "aggregate against the source of truth. A test asserts the file "
    "count actually dropped 64 -> 4 with bytes preserved.",
    tags=("storage", "compaction"),
)
def storage_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = _sfx(sf_dir)
    frag = f"{_ROOT}/events_fragmented_{sfx}"
    compact = f"{_ROOT}/events_compacted_{sfx}"
    ev = t(spark, sf_dir, "events").select("event_type", "user_id")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(
        compact
    )
    return (
        spark.read.parquet(compact)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        
    )


@register(
    "pipeline_delete_where",
    oracle="""
WITH tbl AS (
  SELECT doc_id, lang FROM documents WHERE doc_id % 3 != 0
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM tbl WHERE lang != 'de'
GROUP BY lang
ORDER BY lang
""",
    description="DELETE WHERE on immutable storage: on parquet (as on "
    "Delta/Iceberg) a delete is a REWRITE — surviving rows materialize "
    "as a fresh snapshot committed through the same atomic manifest "
    "rename as a MERGE, so readers see either the pre-delete or the "
    "post-delete table, never a torn state, and the predecessor snapshot "
    "stays readable until the next commit's GC (audit window for "
    "retention/GDPR deletes). The oracle reconstructs the surviving set "
    "relationally; a property test separately asserts the deleted rows "
    "are still present in the PREVIOUS snapshot.",
    tags=("pipeline", "storage", "upsert"),
)
def pipeline_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = f"{_ROOT}/delete_where_{_sfx(sf_dir)}"
    UP.drop_table(path)
    docs = t(spark, sf_dir, "documents")
    initial = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("Article_id"), "lang"
    )
    UP.upsert_articles(spark, path, initial)
    UP.delete_where(spark, path, F.col("lang") == "de")
    return (
        UP.read_articles(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("Article_id").alias("sum_ids"),
        )
        
    )
