"""Hundred-fifty-eighth wave: Apache Iceberg reader — the second half
of open-format interop (Delta landed in wave 157).

Iceberg's metadata is layered deeper than Delta's: a versioned JSON
table file names snapshots, each snapshot names an Avro MANIFEST LIST,
each manifest-list row names an Avro MANIFEST whose entries carry
per-file status (EXISTING/ADDED/DELETED). Reading it therefore also
exercises a clean-room minimal Avro container codec
(operators/avro_lite.py — zigzag varints, schema-driven record
decoding, sync-marker blocks, all from the public Avro spec).

  * scan_iceberg_table — current snapshot resolved through
    metadata.json -> manifest list -> manifests -> non-DELETED files;
    per-lang counts + char sums + order-pinned content checksum.
  * scan_iceberg_time_travel — snapshot-id time travel: the append
    snapshot and the rewrite snapshot read side by side.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import iceberg as IB
from news_ingestion_data_pipeline_spark.plans.llm157 import (
    _AGG_SQL,
    _LIVE_SQL,
    _snapshot_agg,
)
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm158")


def _fixture(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Session-memoized: every consumer of this root is a pure READ
    (scan_iceberg_table / time_travel / partition_pruned /
    storage_iceberg_metadata_tables). The marker lands after a
    complete build; bench attribution records the reuse."""
    import os

    from news_ingestion_data_pipeline_spark.plans import artifact_cache

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_{sfx}"
    marker = os.path.join(root, ".fixture_ready")
    hit = os.path.exists(marker)
    artifact_cache.record("iceberg_fixture_llm158", hit)
    if hit:
        with open(marker) as fh:
            s1, s2 = (int(x) for x in fh.read().split(","))
        return root, s1, s2
    s1, s2 = IB.write_iceberg_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    with open(marker, "w") as fh:
        fh.write(f"{s1},{s2}")
    return root, s1, s2


@register(
    "scan_iceberg_table",
    oracle=f"""
WITH live AS ({_LIVE_SQL})
{_AGG_SQL.format(extra="", extra_grp="", src="live")}
""",
    description="Apache Iceberg reader (open-format interop): the "
    "documents table re-lands as a genuine Iceberg v2 layout — "
    "vN.metadata.json, Avro manifest list, Avro manifests with "
    "EXISTING/ADDED/DELETED entry statuses — and the engine resolves "
    "the current snapshot through all three metadata layers using a "
    "clean-room minimal Avro codec (no Iceberg or Avro library). The "
    "rewrite snapshot marks the French file DELETED in one manifest "
    "while a second manifest adds its n_chars >= 600 replacement, so a "
    "correct read must merge statuses ACROSS manifests. Certification "
    "and scale shape identical to scan_delta_log_table: kilobyte "
    "metadata driver-side, one distributed parquet scan over live "
    "files.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    root, _, _ = _fixture(spark, sf_dir)
    return _snapshot_agg(IB.read_iceberg(spark, root))


@register(
    "scan_iceberg_time_travel",
    oracle=f"""
WITH v0 AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h FROM documents
), live AS ({_LIVE_SQL}),
a0 AS ({_AGG_SQL.format(extra="0 AS version,", extra_grp="1,", src="v0")}),
a1 AS ({_AGG_SQL.format(extra="1 AS version,", extra_grp="1,", src="live")})
SELECT * FROM a0 UNION ALL SELECT * FROM a1
""",
    description="Iceberg snapshot-id time travel: the append snapshot "
    "(both original files live) and the rewrite snapshot (French file "
    "DELETED, filtered replacement ADDED) resolved from the same "
    "metadata.json and read side by side — proving historical manifest "
    "lists stay resolvable and the status replay is snapshot-scoped, "
    "not global.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    root, s1, s2 = _fixture(spark, sf_dir)
    v0 = _snapshot_agg(IB.read_iceberg(spark, root, s1)).select(
        F.lit(0).alias("version"), "*"
    )
    v1 = _snapshot_agg(IB.read_iceberg(spark, root, s2)).select(
        F.lit(1).alias("version"), "*"
    )
    return v0.unionByName(v1)


@register(
    "scan_iceberg_partition_pruned",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
sel AS (SELECT * FROM live WHERE lang IN ('en', 'de')),
audit AS (
  SELECT (SELECT COUNT(DISTINCT lang) FROM documents
          WHERE lang IN ('en', 'de')) AS n_files_scanned,
         (SELECT COUNT(DISTINCT lang) FROM documents) AS n_files_live
)
SELECT sel.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5,
       CAST(audit.n_files_scanned AS BIGINT) AS n_files_scanned,
       CAST(audit.n_files_live AS BIGINT) AS n_files_live
FROM sel CROSS JOIN audit
GROUP BY sel.lang, audit.n_files_scanned, audit.n_files_live
""",
    description="Iceberg metadata-level partition pruning — the "
    "mechanism that makes the format matter at 100 TB: the table is "
    "lang-partitioned (one data file per language, each manifest entry "
    "carrying its partition record), and a lang IN ('en','de') read "
    "resolves ONLY those entries from the manifests — the other "
    "languages' data files are never opened, proven by the audit "
    "columns (files scanned vs files live, counted during metadata "
    "resolution, matching the oracle's per-language file arithmetic). "
    "The scan itself then pushes further predicates down into exactly "
    "the surviving parquet files.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    root, _, _ = _fixture(spark, sf_dir)
    files, n_live = IB.snapshot_files(
        root, partition_filter={"lang": {"en", "de"}}
    )
    df = spark.read.parquet(*files)
    return _snapshot_agg(df).select(
        "*",
        F.lit(len(files)).cast("bigint").alias("n_files_scanned"),
        F.lit(n_live).cast("bigint").alias("n_files_live"),
    )
