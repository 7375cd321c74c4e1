"""Hundred-sixty-second wave: Delta checkpoint resolution (log
compaction) — the read path a long-lived table actually exercises.

A Delta table that has committed thousands of times cannot make every
reader replay the whole JSON log; the protocol compacts state into
``N.checkpoint.parquet`` plus a ``_last_checkpoint`` pointer, and a
reader resolves: checkpoint baseline -> replay only the JSON commits
after it. This wave extends the fixture with a third commit (a second
French rewrite narrowing to n_chars in [600, 900)), checkpoints at
version 1, and certifies that checkpoint-based resolution produces
byte-identical content to the full-replay answer — with audit columns
proving the reader really started from the checkpoint and replayed
exactly one tail commit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import deltalog as DL
from news_ingestion_data_pipeline_spark.plans.llm157 import (
    _AGG_SQL,
    _snapshot_agg,
)
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm162")

_LIVE3_SQL = """
  SELECT doc_id, lang, n_chars, md5(text) AS content_h
  FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang, n_chars, md5(text)
  FROM documents WHERE lang = 'fr' AND n_chars >= 600 AND n_chars < 900
"""


def _fixture(spark: SparkSession, sf_dir: str) -> str:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_cp_{sfx}"
    docs = t(spark, sf_dir, "documents")
    DL.write_delta_fixture(spark, docs, root)
    # third commit: narrow the French slice again (remove + re-add)
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    )
    DL._write_single_parquet(
        slim.filter(
            (F.col("lang") == "fr")
            & (F.col("n_chars") >= 600)
            & (F.col("n_chars") < 900)
        ),
        root,
        "file-3.parquet",
    )
    import os

    DL._commit(
        root,
        2,
        [
            {
                "remove": {
                    "path": "file-2.parquet",
                    "deletionTimestamp": 1700000001000,
                    "dataChange": True,
                }
            },
            {
                "add": {
                    "path": "file-3.parquet",
                    "partitionValues": {},
                    "size": os.path.getsize(
                        os.path.join(root, "file-3.parquet")
                    ),
                    "modificationTime": 1700000001000,
                    "dataChange": True,
                }
            },
        ],
    )
    # compact the log at version 1: readers baseline there, replay v2
    DL.write_checkpoint(root, 1)
    return root


@register(
    "scan_delta_checkpoint",
    oracle=f"""
WITH live AS ({_LIVE3_SQL}),
agg AS ({_AGG_SQL.format(extra="", extra_grp="", src="live")})
SELECT agg.*,
       CAST(1 AS BIGINT) AS checkpoint_version,
       CAST(1 AS BIGINT) AS json_commits_replayed
FROM agg
""",
    description="Delta checkpoint resolution — log compaction, the "
    "read path of any long-lived table: the fixture commits three "
    "times, compacts at version 1 (checkpoint parquet + "
    "_last_checkpoint pointer), and the reader resolves the latest "
    "snapshot from the CHECKPOINT baseline plus exactly ONE tail JSON "
    "commit instead of replaying the whole log — at 100 TB and "
    "thousands of commits, the difference between O(1) metadata reads "
    "and an unbounded replay. Audit columns record the checkpoint "
    "version used and the tail-commit count; per-lang counts + content "
    "checksum certify the compacted resolution is byte-identical to "
    "the full-replay answer (and to the generating SQL).",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _fixture(spark, sf_dir)
    files, cp_version, replayed = DL.delta_snapshot_files_checkpointed(root)
    # belt-and-suspenders: compacted resolution == full JSON replay
    assert files == DL.delta_snapshot_files(root), (
        "checkpoint resolution diverged from full replay"
    )
    df = spark.read.parquet(*files)
    return _snapshot_agg(df).select(
        "*",
        F.lit(cp_version).cast("bigint").alias("checkpoint_version"),
        F.lit(replayed).cast("bigint").alias("json_commits_replayed"),
    )


@register(
    "scan_delta_checkpoint_v2",
    oracle=f"""
WITH live AS ({_LIVE3_SQL}),
agg AS ({_AGG_SQL.format(extra="", extra_grp="", src="live")})
SELECT agg.*,
       CAST(1 AS BIGINT) AS checkpoint_version,
       CAST(1 AS BIGINT) AS json_commits_replayed,
       CAST(2 AS BIGINT) AS n_sidecars
FROM agg
""",
    description="Delta V2 CHECKPOINT resolution (checkpointPolicy=v2): "
    "the same three-commit fixture compacts at version 1 into a "
    "UUID-named manifest (checkpointMetadata/protocol/metaData/sidecar "
    "actions) with the add actions split across TWO sidecar files under "
    "_delta_log/_sidecars/ — the layout that lets a huge table rewrite "
    "only changed sidecar slices between checkpoints. The reader "
    "resolves manifest -> sidecars -> one tail JSON commit; the "
    "embedded checkpointMetadata version is validated against the "
    "pointer and a missing sidecar is a hard named error (tests). "
    "Byte-identical to classic-checkpoint and full-replay resolution.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_checkpoint_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    root = _fixture(spark, sf_dir) + "_v2"
    if not os.path.exists(os.path.join(root, "_delta_log")):
        import shutil

        shutil.copytree(_fixture(spark, sf_dir), root)
        # drop the classic checkpoint; compact as v2 instead
        log = os.path.join(root, "_delta_log")
        for n in os.listdir(log):
            if ".checkpoint." in n or n == "_last_checkpoint":
                os.remove(os.path.join(log, n))
    DL.write_checkpoint_v2(root, 1, sidecars=2)
    n_sidecars = len(os.listdir(os.path.join(root, "_delta_log", "_sidecars")))
    files, cp_version, replayed = DL.delta_snapshot_files_checkpointed(root)
    assert files == DL.delta_snapshot_files(root), (
        "v2 checkpoint resolution diverged from full replay"
    )
    df = spark.read.parquet(*files)
    return _snapshot_agg(df).select(
        "*",
        F.lit(cp_version).cast("bigint").alias("checkpoint_version"),
        F.lit(replayed).cast("bigint").alias("json_commits_replayed"),
        F.lit(n_sidecars).cast("bigint").alias("n_sidecars"),
    )


@register(
    "pipeline_delta_version_checksum",
    oracle=f"""
WITH live AS ({_LIVE3_SQL}),
kept AS (SELECT * FROM live WHERE doc_id % 9 <> 0),
audit AS (
  SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 9 = 0) AS BIGINT)
           AS n_dv_deleted
  FROM live
)
SELECT kept.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5,
       CAST(2 AS BIGINT) AS num_files,
       audit.n_dv_deleted
FROM kept CROSS JOIN audit
GROUP BY kept.lang, audit.n_dv_deleted
""",
    description="Delta VERSION CHECKSUM (.crc) state validation: after "
    "a DV DELETE (doc_id % 9 = 0) the commit's %020d.crc records the "
    "snapshot's numFiles / numDeletedRecordsOpt / tableSizeBytes + "
    "protocol, and validate_version_checksum recomputes the state from "
    "log replay and cross-checks field-by-name (a tamper or replay bug "
    "is a hard error — unit-tested). The audit columns carry the "
    "VALIDATED numbers: numFiles stays 2 (DV delete rewrites zero data "
    "files) and numDeletedRecordsOpt equals the predicate count the "
    "oracle recomputes. The reader-side cheap integrity check a "
    "thousand-commit production table runs on every snapshot load.",
    tags=("scan", "storage", "pipeline"),
)
def pipeline_delta_version_checksum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = _fixture(spark, sf_dir)
    root = f"{_ROOT}/delta_crc_{sfx}"
    shutil.rmtree(root, ignore_errors=True)
    shutil.copytree(base, root)
    version, n_del = DL.delete_where_with_dv(
        spark, root, F.col("doc_id") % 9 == 0
    )
    DL.write_version_checksum(root, version)
    state = DL.validate_version_checksum(root, version)
    assert state["numDeletedRecordsOpt"] == n_del
    back = DL.read_delta(spark, root)
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
        F.lit(state["numFiles"]).cast("bigint").alias("num_files"),
        F.lit(n_del).cast("bigint").alias("n_dv_deleted"),
    )
