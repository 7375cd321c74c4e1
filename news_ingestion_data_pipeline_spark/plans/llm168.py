"""Hundred-sixty-eighth wave: Iceberg v2 POSITIONAL delete files —
the second merge-on-read delete encoding (wave 167 covered equality
deletes).

Positional deletes identify rows by (data file, physical row ordinal),
the encoding engines emit when they already know exactly which rows a
DELETE touched (e.g. after a scan) — smaller and cheaper to apply than
equality deletes when keys are wide. The physical ordinals come from
the parquet reader's own ``_metadata.row_index`` column, so both the
delete WRITER and the READER stay single distributed scans with no
synthesized rank and no per-file driver loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import iceberg as IB
from news_ingestion_data_pipeline_spark.plans.llm157 import _LIVE_SQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm168")


@register(
    "scan_iceberg_positional_deletes",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
kept AS (SELECT * FROM live WHERE doc_id % 5 <> 0),
audit AS (
  SELECT (SELECT COUNT(*) FROM live WHERE doc_id % 5 = 0) AS n_deleted_rows
)
SELECT kept.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5,
       CAST(audit.n_deleted_rows AS BIGINT) AS n_deleted_rows
FROM kept CROSS JOIN audit
GROUP BY kept.lang, audit.n_deleted_rows
""",
    description="Iceberg v2 merge-on-read with POSITIONAL delete files: "
    "a DELETE of doc_id % 5 = 0 commits one (file_path, row ordinal) "
    "delete file + a content=1 manifest — zero data files rewritten — "
    "and the reader applies it as an anti-join on the parquet reader's "
    "own (_metadata.file_path, _metadata.row_index) identity, so both "
    "writer and reader are single distributed scans with REAL physical "
    "ordinals (no synthesized ranks, no per-file driver loop). "
    "Complements wave 167's equality encoding: positional is what "
    "engines emit when the deleting scan already located the rows; "
    "equality is what pure-key deletes (GDPR erasure) emit. Content "
    "checksums certify exactly the matching rows vanished.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_positional_deletes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_{sfx}"
    docs = t(spark, sf_dir, "documents")
    IB.write_iceberg_fixture(spark, docs, root)
    _, n_deleted = IB.append_positional_delete(
        spark, root, F.col("doc_id") % 5 == 0
    )
    back = IB.read_iceberg_positional(spark, root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "content_h"))
                    ),
                    lambda s: s["content_h"],
                ),
                "",
            )
        ).alias("content_md5"),
        F.lit(n_deleted).cast("bigint").alias("n_deleted_rows"),
    )
