"""Hundred-sixty-seventh wave: Iceberg v2 merge-on-read — equality
delete files.

Copy-on-write DELETE rewrites every file containing a matching row;
format v2's merge-on-read instead commits a tiny DELETE FILE (the
equality keys) and resolves it at scan time — the design that makes
frequent GDPR-style deletes affordable on 100 TB tables. This wave
commits an equality-delete snapshot against the lang-partitioned
fixture (zero data files touched — proven by an audit column counting
live data files before and after) and certifies the anti-joined read.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import iceberg as IB
from news_ingestion_data_pipeline_spark.plans.llm157 import _LIVE_SQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm167")


@register(
    "scan_iceberg_equality_deletes",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
kept AS (SELECT * FROM live WHERE doc_id % 7 <> 0),
audit AS (
  SELECT (SELECT COUNT(DISTINCT lang) FROM documents) AS n_data_files,
         (SELECT COUNT(*) FROM live WHERE doc_id % 7 = 0) AS n_deleted_rows
)
SELECT kept.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5,
       CAST(audit.n_data_files AS BIGINT) AS n_data_files,
       CAST(audit.n_deleted_rows AS BIGINT) AS n_deleted_rows
FROM kept CROSS JOIN audit
GROUP BY kept.lang, audit.n_data_files, audit.n_deleted_rows
""",
    description="Iceberg v2 merge-on-read with EQUALITY DELETE files: a "
    "DELETE of doc_id % 7 = 0 commits as one tiny delete file plus a "
    "content=1 delete manifest riding the same manifest list as the "
    "untouched data manifests — NO data file is rewritten (the audit "
    "column shows the live data-file count unchanged), and the reader "
    "anti-joins the delete keys at scan time (broadcast at scale: the "
    "delete side is keys, not rows). Per-lang counts + content checksum "
    "certify exactly the matching rows vanished. This is the cost model "
    "that makes frequent row-level deletes affordable on immutable "
    "100 TB tables — the open-format twin of the engine's own "
    "storage_merge_on_read_deletes.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_equality_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_{sfx}"
    docs = t(spark, sf_dir, "documents")
    IB.write_iceberg_fixture(spark, docs, root)
    n_files_before = len(IB.snapshot_files_v2(root)[0])
    keys = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    IB.append_equality_delete(spark, root, keys, equality_field="doc_id")
    data_after, dels = IB.snapshot_files_v2(root)
    assert len(data_after) == n_files_before, "merge-on-read rewrote data"
    n_deleted = (
        spark.read.parquet(*dels)
        .join(
            IB.read_iceberg(spark, root, snapshot_id=1002).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        .count()
    )
    back = IB.read_iceberg_merge_on_read(spark, root, equality_field="doc_id")
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
        F.lit(len(data_after)).cast("bigint").alias("n_data_files"),
        F.lit(n_deleted).cast("bigint").alias("n_deleted_rows"),
    )
