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

Commit protocol (miniature of Delta's log / Iceberg's metadata pointer):
the table directory holds immutable snapshot dirs plus a ``_MANIFEST``
file naming the current one. A writer materializes the full new snapshot,
fsyncs a temp manifest, and commits with ONE atomic ``os.rename`` — there
is no instant at which a reader (who resolves through the manifest) can
observe a missing or half-written table, and a crash at any step leaves
the previous snapshot live (the orphan snapshot is GC'd by the next
successful commit, which also retains the immediately-previous snapshot
so in-flight readers holding the old pointer never lose their files).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST"


def _current_snapshot(table_path: str) -> str | None:
    """Name of the committed snapshot dir, or None (missing table or a
    pre-manifest legacy flat-parquet layout)."""
    mf = os.path.join(table_path, _MANIFEST)
    if not os.path.exists(mf):
        return None
    with open(mf, encoding="utf-8") as f:
        snap = f.read().strip()
    return snap or None


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

    Snapshot-then-manifest commit (the reference gets atomicity from
    SQLite's transaction; we get it from one atomic manifest rename):

      1. write the merged result to a fresh immutable ``snap-*`` dir;
      2. fsync a temp manifest naming it;
      3. ``os.rename`` the temp manifest over ``_MANIFEST`` — the commit
         point. A crash before (2-3) leaves the old manifest (and table)
         intact; there is no two-rename window in which the table pointer
         does not exist.
      4. GC snapshots other than the new one and its immediate
         predecessor (kept for readers that already resolved the old
         pointer).
    """
    target = read_articles(spark, table_path)
    prev_snap = _current_snapshot(table_path)
    merged = merge_upsert_frames(target, updates)
    os.makedirs(table_path, exist_ok=True)
    snap = f"snap-{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(os.path.join(table_path, snap))
    tmp_mf = os.path.join(table_path, f"._manifest_{uuid.uuid4().hex}")
    with open(tmp_mf, "w", encoding="utf-8") as f:
        f.write(snap + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp_mf, os.path.join(table_path, _MANIFEST))  # commit point
    _gc_snapshots(table_path, keep={snap} | ({prev_snap} if prev_snap else set()))


def _gc_snapshots(table_path: str, keep: set[str]) -> None:
    """Drop superseded snapshot dirs, orphaned temp manifests, and any
    legacy flat-layout parquet files; best-effort (a failed GC only leaks
    space, never correctness)."""
    for name in os.listdir(table_path):
        if name == _MANIFEST or name in keep:
            continue
        p = os.path.join(table_path, name)
        try:
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
            else:
                os.remove(p)
        except OSError:
            pass


def read_articles(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Read the articles table; None when it doesn't exist yet (the
    create-if-not-exists analog, reference
    database_utils/database_methods.py:132-155). Resolves through the
    ``_MANIFEST`` pointer; falls back to reading ``table_path`` directly
    for pre-manifest flat-parquet layouts."""
    if not os.path.exists(table_path):
        return None
    snap = _current_snapshot(table_path)
    if snap is not None:
        return spark.read.parquet(os.path.join(table_path, snap))
    return spark.read.parquet(table_path)


def delete_where(spark: SparkSession, table_path: str, condition) -> None:
    """DELETE FROM table WHERE condition — on immutable storage this is a
    REWRITE: materialize the surviving rows as a fresh snapshot and commit
    it through the same atomic manifest rename as an upsert (GDPR-style
    retention deletes work exactly like this on Delta/Iceberg, minus
    their file-level pruning of untouched files). The predecessor
    snapshot remains readable until the next commit's GC."""
    target = read_articles(spark, table_path)
    if target is None:
        return
    prev_snap = _current_snapshot(table_path)
    survivors = target.filter(~condition)
    snap = f"snap-{uuid.uuid4().hex}"
    survivors.write.mode("overwrite").parquet(os.path.join(table_path, snap))
    tmp_mf = os.path.join(table_path, f"._manifest_{uuid.uuid4().hex}")
    with open(tmp_mf, "w", encoding="utf-8") as f:
        f.write(snap + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp_mf, os.path.join(table_path, _MANIFEST))  # commit point
    _gc_snapshots(table_path, keep={snap} | ({prev_snap} if prev_snap else set()))


def read_previous_snapshot(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Time-travel read of the immediately-previous committed snapshot.

    The commit protocol's GC (see ``upsert_articles``) deliberately
    retains the predecessor snapshot alongside the current one — both for
    in-flight readers and for exactly this one-version time travel (the
    miniature of Delta's ``VERSION AS OF``). Returns None when the table
    has fewer than two committed versions."""
    snap = _current_snapshot(table_path)
    if snap is None:
        return None
    prev = [
        name
        for name in os.listdir(table_path)
        if name.startswith("snap-") and name != snap
        and os.path.isdir(os.path.join(table_path, name))
    ]
    if not prev:
        return None
    if len(prev) > 1:  # GC is best-effort; resolve by mtime
        prev.sort(key=lambda n: os.path.getmtime(os.path.join(table_path, n)))
        prev = prev[-1:]
    return spark.read.parquet(os.path.join(table_path, prev[0]))


def drop_table(table_path: str) -> None:
    """DROP TABLE IF EXISTS analog (reference
    database_utils/database_methods.py:157-170)."""
    shutil.rmtree(table_path, ignore_errors=True)
