"""Hundred-fifty-seventh wave: open-format interop — reading a Delta
Lake table from its public transaction-log protocol.

The engine's own storage layer (operators/upsert.py) is manifest-
pointer based; a real lakehouse hands you Delta/Iceberg tables instead.
These queries prove the engine ingests a genuine Delta layout — JSON
commits, add/remove replay, snapshot isolation, time travel — using
only the published protocol (clean-room parser in
operators/deltalog.py), with the data path staying one ordinary
distributed parquet scan over the snapshot's live files.

  * scan_delta_log_table — latest-version read: per-lang counts, char
    sums and an order-pinned content checksum over the live files
    (v1 replaced the French slice with its n_chars >= 600 rewrite).
  * scan_delta_time_travel — versions 0 and 1 read side by side from
    the SAME directory: the pre-rewrite snapshot is still perfectly
    readable because removes are logical (files stay until vacuum).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import deltalog as DL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm157")

_LIVE_SQL = """
  SELECT doc_id, lang, n_chars, md5(text) AS content_h
  FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang, n_chars, md5(text)
  FROM documents WHERE lang = 'fr' AND n_chars >= 600
"""

_AGG_SQL = """
SELECT {extra} lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5
FROM {src}
GROUP BY {extra_grp} lang
"""


def _fixture(spark: SparkSession, sf_dir: str) -> str:
    """Session-memoized: every consumer of this root is a pure READ
    (scan_delta_log_table / scan_delta_time_travel), so rebuilding per
    query only re-pays the write. The marker lands after a complete
    build; bench attribution records the reuse like any artifact
    cache."""
    import os

    from news_ingestion_data_pipeline_spark.plans import artifact_cache

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_{sfx}"
    marker = os.path.join(root, ".fixture_ready")
    hit = os.path.exists(marker)
    artifact_cache.record("delta_fixture_llm157", hit)
    if not hit:
        DL.write_delta_fixture(spark, t(spark, sf_dir, "documents"), root)
        open(marker, "w").close()
    return root


def _snapshot_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("lang").agg(
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
    )


@register(
    "scan_delta_log_table",
    oracle=f"""
WITH live AS ({_LIVE_SQL})
{_AGG_SQL.format(extra="", extra_grp="", src="live")}
""",
    description="Delta Lake reader (open-format interop): the documents "
    "table re-lands as a genuine Delta layout — parquet data files plus "
    "_delta_log JSON commits per the published protocol — and the "
    "engine resolves the LATEST snapshot by replaying add/remove "
    "actions (clean-room parser, operators/deltalog.py). Commit v1 is a "
    "quality rewrite of the French slice (remove + re-add filtered at "
    "n_chars >= 600), so a correct replay must both drop the dead file "
    "and pick up its replacement; per-lang counts + char sums + an "
    "order-pinned md5-of-content-hashes certify file-level resolution "
    "AND row-level content. Scale: the log is kilobyte metadata parsed "
    "exactly like production Delta readers resolve snapshots; the data "
    "path is one distributed parquet scan over live files with "
    "pushdown/pruning intact.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_log_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _fixture(spark, sf_dir)
    return _snapshot_agg(DL.read_delta(spark, root))


@register(
    "scan_delta_time_travel",
    oracle=f"""
WITH v0 AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h FROM documents
), live AS ({_LIVE_SQL}),
a0 AS ({_AGG_SQL.format(extra="0 AS version,", extra_grp="1,", src="v0")}),
a1 AS ({_AGG_SQL.format(extra="1 AS version,", extra_grp="1,", src="live")})
SELECT * FROM a0 UNION ALL SELECT * FROM a1
""",
    description="Delta time travel: versions 0 and 1 of the same table "
    "directory read side by side — v0 (pre-rewrite: every document, "
    "French slice unfiltered) resolves through the SAME log replay "
    "stopped at an earlier commit, and stays readable because Delta "
    "removes are logical (the dead file persists until vacuum). "
    "Certifies snapshot isolation of the log replay: both versions' "
    "per-lang counts and content checksums must match their generating "
    "SQL simultaneously.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _fixture(spark, sf_dir)
    v0 = _snapshot_agg(DL.read_delta(spark, root, version=0)).select(
        F.lit(0).alias("version"), "*"
    )
    v1 = _snapshot_agg(DL.read_delta(spark, root, version=1)).select(
        F.lit(1).alias("version"), "*"
    )
    return v0.unionByName(v1)
