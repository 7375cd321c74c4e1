"""Hundred-sixty-fourth wave: write-side Iceberg interop, completing
the read+write x Delta+Iceberg matrix.

The engine's MERGE commits genuine Iceberg snapshots: a fresh data
file, an ADDED manifest plus a DELETED manifest for the superseded
files, a new Avro manifest list, and a new vN.metadata.json whose
snapshot list retains history — so snapshot-id time travel into the
pre-merge state works through the standard resolution path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import iceberg as IB
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm164")


@register(
    "pipeline_iceberg_export_merge",
    oracle="""
WITH b1 AS (
  SELECT doc_id, lang, n_chars, 1 AS rev FROM documents WHERE lang <> 'fr'
), b2 AS (
  SELECT doc_id, lang, n_chars, 2 AS rev FROM documents WHERE n_chars >= 600
), merged AS (
  SELECT * FROM b2
  UNION ALL
  SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM b2)
), pre AS (
  SELECT COUNT(*) AS n FROM b1
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(rev) AS BIGINT) AS sum_rev,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST((SELECT n FROM pre) AS BIGINT) AS n_rows_at_snap1
FROM merged GROUP BY lang
""",
    description="Write-side Iceberg interop (the matrix-completing "
    "twin of pipeline_delta_export_merge): the engine's MERGE commits "
    "genuine Iceberg snapshots — fresh data file, ADDED + DELETED "
    "manifests, new Avro manifest list, new vN.metadata.json retaining "
    "snapshot history. The read-back goes through the standard "
    "3-layer resolution, and the audit column re-reads the PRE-merge "
    "snapshot by id (time travel through the exporter's own metadata) "
    "to prove history survived the commit. Update-all MERGE semantics "
    "certified per language against the generating SQL.",
    tags=("pipeline", "storage"),
)
def pipeline_iceberg_export_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/export_{sfx}"
    shutil.rmtree(root, ignore_errors=True)
    docs = t(spark, sf_dir, "documents")
    b1 = docs.filter(F.col("lang") != "fr").select(
        "doc_id", "lang", "n_chars", F.lit(1).alias("rev")
    )
    b2 = docs.filter(F.col("n_chars") >= 600).select(
        "doc_id", "lang", "n_chars", F.lit(2).alias("rev")
    )
    s1 = IB.export_merge_to_iceberg(spark, root, b1, key="doc_id")
    IB.export_merge_to_iceberg(spark, root, b2, key="doc_id")
    n_snap1 = IB.read_iceberg(spark, root, s1).count()
    back = IB.read_iceberg(spark, root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("rev").cast("bigint").alias("sum_rev"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.lit(n_snap1).cast("bigint").alias("n_rows_at_snap1"),
    )
