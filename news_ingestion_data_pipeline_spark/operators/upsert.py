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

Multi-writer safety is optimistic concurrency, the same shape as Delta's
commit-version CAS: the manifest rename happens under an O_EXCL commit
lock and only if the pointer still names the base the writer merged
against; a loser discards its snapshot and re-merges against the winner's
(``CommitConflict`` retry loop). In-flight snapshot dirs carry
``.inflight-*`` markers so one writer's GC never sweeps another's
half-written snapshot; a crashed writer's marker goes stale after
``_STALE_SEC`` and is reclaimed.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_MANIFEST"
_LOCK = "_COMMIT_LOCK"
#: a lock/in-flight marker older than this is a crashed writer — steal it
_STALE_SEC = 120.0
#: optimistic-concurrency retries before giving up
_MAX_RETRIES = 5


class CommitConflict(Exception):
    """Another writer committed between this writer's base read and its
    commit attempt — the merge must be recomputed against the new base."""


def _acquire_lock(table_path: str, timeout: float = 30.0) -> str:
    """Take the commit critical section via O_CREAT|O_EXCL — the portable
    single-filesystem mutex. Holders only compare-and-swap one manifest
    pointer inside it (microseconds), never write data. A holder that
    died is detected by marker age and its lock stolen."""
    lock = os.path.join(table_path, _LOCK)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {time.time()}\n".encode())
            os.close(fd)
            return lock
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock) > _STALE_SEC:
                    os.remove(lock)  # crashed holder
                    continue
            except OSError:
                continue  # holder released between exists-check and stat
            if time.monotonic() > deadline:
                raise TimeoutError(f"commit lock busy: {lock}")
            time.sleep(0.05)


def _release_lock(lock: str) -> None:
    try:
        os.remove(lock)
    except OSError:
        pass


def _inflight_marker(table_path: str, snap: str) -> str:
    return os.path.join(table_path, f".inflight-{snap}")


def _commit_snapshot(table_path: str, snap: str, expected_base: str | None) -> None:
    """Compare-and-swap the manifest pointer to ``snap`` iff it still
    names ``expected_base``; raise :class:`CommitConflict` otherwise.

    The check-and-rename pair runs under the O_EXCL lock so two writers
    can't both observe the same base and both win — the loser recomputes
    its merge against the winner's snapshot (optimistic concurrency, the
    same shape as Delta's commit-version CAS)."""
    lock = _acquire_lock(table_path)
    try:
        current = _current_snapshot(table_path)
        if current != expected_base:
            raise CommitConflict(
                f"manifest moved {expected_base!r} -> {current!r}"
            )
        tmp_mf = os.path.join(table_path, f"._manifest_{uuid.uuid4().hex}")
        with open(tmp_mf, "w", encoding="utf-8") as f:
            f.write(snap + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp_mf, os.path.join(table_path, _MANIFEST))  # commit point
    finally:
        _release_lock(lock)


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

      1. resolve the base snapshot and read the target THROUGH it (never
         through a second manifest read — the pointer may move under us);
      2. write the merged result to a fresh immutable ``snap-*`` dir,
         registered with an in-flight marker so a concurrent winner's GC
         doesn't sweep it mid-write;
      3. compare-and-swap the manifest to the new snapshot under the
         commit lock (:func:`_commit_snapshot`). If another writer
         committed first, discard our snapshot and RETRY the whole merge
         against the new base — multi-writer safety is optimistic
         concurrency, not last-writer-wins clobbering;
      4. GC snapshots other than the new one and its immediate
         predecessor (kept for readers that already resolved the old
         pointer) and anything another writer has in flight.

    A crash at any step leaves the previously-committed snapshot live;
    the orphan dir/marker is swept by the next successful commit.
    """
    os.makedirs(table_path, exist_ok=True)
    for _ in range(_MAX_RETRIES + 1):
        prev_snap = _current_snapshot(table_path)
        target = _read_snapshot(spark, table_path, prev_snap)
        merged = merge_upsert_frames(target, updates)
        snap = f"snap-{uuid.uuid4().hex}"
        marker = _inflight_marker(table_path, snap)
        with open(marker, "w", encoding="utf-8") as f:
            f.write(f"{os.getpid()} {time.time()}\n")
        merged.write.mode("overwrite").parquet(os.path.join(table_path, snap))
        try:
            _commit_snapshot(table_path, snap, expected_base=prev_snap)
        except CommitConflict:
            shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
            try:
                os.remove(marker)
            except OSError:
                pass
            continue
        try:
            os.remove(marker)
        except OSError:
            pass
        _gc_snapshots(
            table_path, keep={snap} | ({prev_snap} if prev_snap else set())
        )
        return
    raise RuntimeError(
        f"upsert lost the commit race {_MAX_RETRIES + 1} times: {table_path}"
    )


def _read_snapshot(
    spark: SparkSession, table_path: str, snap: str | None
) -> DataFrame | None:
    """Read the table pinned to an already-resolved snapshot name (or the
    legacy flat layout when ``snap`` is None)."""
    if snap is not None:
        return spark.read.parquet(os.path.join(table_path, snap))
    if os.path.exists(table_path) and any(
        n.endswith(".parquet") or n == "_SUCCESS"
        for n in os.listdir(table_path)
    ):
        return spark.read.parquet(table_path)
    return None


def _gc_snapshots(table_path: str, keep: set[str]) -> None:
    """Drop superseded snapshot dirs, orphaned temp manifests, and any
    legacy flat-layout parquet files; best-effort (a failed GC only leaks
    space, never correctness). Snapshots another writer has in flight
    (live ``.inflight-*`` marker) are spared — a crashed writer's marker
    goes stale after ``_STALE_SEC`` and its orphan is swept then."""
    def _inflight_live(snap_name: str) -> bool:
        m = _inflight_marker(table_path, snap_name)
        try:
            return time.time() - os.path.getmtime(m) <= _STALE_SEC
        except OSError:
            return False

    for name in os.listdir(table_path):
        if name == _MANIFEST or name == _LOCK or name in keep:
            continue
        if name.startswith(".inflight-"):
            if _inflight_live(name[len(".inflight-"):]) or name[
                len(".inflight-"):
            ] in keep:
                continue
        elif name.startswith("snap-") and _inflight_live(name):
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
    if not os.path.exists(table_path):
        return
    for _ in range(_MAX_RETRIES + 1):
        prev_snap = _current_snapshot(table_path)
        target = _read_snapshot(spark, table_path, prev_snap)
        if target is None:
            return
        survivors = target.filter(~condition)
        snap = f"snap-{uuid.uuid4().hex}"
        marker = _inflight_marker(table_path, snap)
        with open(marker, "w", encoding="utf-8") as f:
            f.write(f"{os.getpid()} {time.time()}\n")
        survivors.write.mode("overwrite").parquet(
            os.path.join(table_path, snap)
        )
        try:
            _commit_snapshot(table_path, snap, expected_base=prev_snap)
        except CommitConflict:
            shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
            try:
                os.remove(marker)
            except OSError:
                pass
            continue
        try:
            os.remove(marker)
        except OSError:
            pass
        _gc_snapshots(
            table_path, keep={snap} | ({prev_snap} if prev_snap else set())
        )
        return
    raise RuntimeError(
        f"delete lost the commit race {_MAX_RETRIES + 1} times: {table_path}"
    )


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
