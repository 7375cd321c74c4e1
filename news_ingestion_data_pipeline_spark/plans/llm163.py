"""Hundred-sixty-third wave: write-side Delta interop — the engine's
MERGE committing to an open-format transaction log.

Wave 157/162 proved the engine READS Delta; this wave proves it WRITES
it: two incremental MERGE batches land as protocol-compliant commits
(v0 create + v1 rewrite, each adding the new snapshot file and
removing the superseded one), and the final state is read back through
the same clean-room log resolution. A downstream consumer holding any
spec-compliant Delta reader sees exactly the MERGE semantics the
engine's native upsert (operators/upsert.py) guarantees.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import deltalog as DL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm163")


@register(
    "pipeline_delta_export_merge",
    oracle="""
WITH b1 AS (
  SELECT doc_id, lang, n_chars, 1 AS rev FROM documents WHERE lang <> 'fr'
), b2 AS (
  SELECT doc_id, lang, n_chars, 2 AS rev FROM documents WHERE n_chars >= 600
), merged AS (
  SELECT * FROM b2
  UNION ALL
  SELECT * FROM b1 WHERE doc_id NOT IN (SELECT doc_id FROM b2)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(rev) AS BIGINT) AS sum_rev,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(2 AS BIGINT) AS n_commits
FROM merged GROUP BY lang
""",
    description="Write-side Delta interop: two incremental MERGE "
    "batches (batch 1 = non-French docs rev 1; batch 2 = all docs with "
    "n_chars >= 600 rev 2, update-all on doc_id) committed by the "
    "engine as protocol-compliant Delta versions — v0 creates the "
    "table (protocol + metaData + add), v1 rewrites it (add new "
    "snapshot file, remove superseded) — then read back through the "
    "log replay. Certifies that a consumer holding ANY spec-compliant "
    "Delta reader observes exactly the engine's MERGE semantics "
    "(matched keys take the incoming rev-2 row, unmatched survive), "
    "with the commit count as the audit column. Scale: identical "
    "metadata/payload split as the native upsert — the log is "
    "kilobytes; a partitioned MERGE would rewrite only matched "
    "partitions' files, as operators/upsert.py's partitioned variant "
    "already does against its own manifest.",
    tags=("pipeline", "storage"),
)
def pipeline_delta_export_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    v0 = DL.export_merge_to_delta(spark, root, b1, key="doc_id")
    v1 = DL.export_merge_to_delta(spark, root, b2, key="doc_id")
    back = DL.read_delta(spark, root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("rev").cast("bigint").alias("sum_rev"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.lit(v1 - v0 + 1).cast("bigint").alias("n_commits"),
    )
