"""Keyed upsert (MERGE) into a parquet-backed articles table.

Reference: ``Database.upsert_articles``
(database_utils/database_methods.py:68-107): per-row
``INSERT ... ON CONFLICT(Article_id) DO UPDATE SET`` all non-key columns,
refreshing Processed_at, one transaction per batch. Idempotence of re-runs
(modulo Processed_at) is the pipeline's correctness backbone.

Spark-first design (SURVEY.md §4.3.2): Delta's MERGE INTO is the production
fast-path; this module also ships a dependency-free parquet emulation —
anti-join + union overwrite with an atomic directory swap — with the same
observable semantics:

  * matched rows  → incoming version wins (update-all), Processed_at refreshed
  * unmatched     → inserted
  * target rows untouched by the batch survive unchanged

Scale notes (100 TB): the emulation rewrites the full target, which is what
non-ACID formats force; at scale you'd partition the target (e.g. by
publish date) and rewrite only partitions containing matched keys — MERGE on
Delta/Iceberg does exactly that file-level pruning. The join side is a
broadcast when the batch is small (an incremental scrape always is), so the
plan is scan-target + broadcast-anti-join + union + write: one pass over the
target, zero shuffles.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert_frames(target: DataFrame | None, updates: DataFrame) -> DataFrame:
    """Pure-DataFrame MERGE: rows of ``target`` not keyed in ``updates``,
    plus all of ``updates`` (key = Article_id, update-all semantics).

    ``updates`` must already be key-unique (normalize_pipeline guarantees
    it). Broadcast the update keys: an incremental batch is tiny relative
    to the accumulated table, so the anti-join runs map-side.
    """
    deduped = updates.dropDuplicates(["Article_id"])
    if target is None:
        return deduped
    keys = deduped.select("Article_id")
    survivors = target.join(F.broadcast(keys), "Article_id", "left_anti")
    return survivors.unionByName(deduped)


def upsert_articles(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
) -> None:
    """MERGE ``updates`` into the parquet table at ``table_path``.

    Write-temp-then-atomic-swap so a failed run never leaves a half-written
    table (the reference gets this from SQLite's transaction; we get it from
    a directory rename).
    """
    target = read_articles(spark, table_path)
    merged = merge_upsert_frames(target, updates)
    parent = os.path.dirname(os.path.abspath(table_path)) or "."
    os.makedirs(parent, exist_ok=True)
    tmp_path = os.path.join(
        tempfile.mkdtemp(dir=parent, prefix="._upsert_"), "data"
    )
    merged.write.mode("overwrite").parquet(tmp_path)
    # atomic-ish swap: move old aside, move new in, drop old
    old_path = os.path.join(parent, f"._old_{uuid.uuid4().hex}")
    if os.path.exists(table_path):
        os.rename(table_path, old_path)
    os.rename(tmp_path, table_path)
    shutil.rmtree(os.path.dirname(tmp_path), ignore_errors=True)
    shutil.rmtree(old_path, ignore_errors=True)


def read_articles(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Read the articles table; None when it doesn't exist yet (the
    create-if-not-exists analog, reference
    database_utils/database_methods.py:132-155)."""
    if not os.path.exists(table_path):
        return None
    return spark.read.parquet(table_path)


def drop_table(table_path: str) -> None:
    """DROP TABLE IF EXISTS analog (reference
    database_utils/database_methods.py:157-170)."""
    shutil.rmtree(table_path, ignore_errors=True)
