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


#: token this process wrote into each lock it currently holds —
#: release verifies it so a stolen-and-reacquired lock is never
#: removed by the old holder.
_HELD_TOKENS: dict[str, bytes] = {}


def _acquire_lock(table_path: str, timeout: float = 30.0) -> str:
    """Take the commit critical section via O_CREAT|O_EXCL — the portable
    single-filesystem mutex. Holders only compare-and-swap one manifest
    pointer inside it (microseconds), never write data. A holder that
    died is detected by marker age and its lock stolen; the steal is
    rename-to-unique (only one of several stealers wins) AND identity-
    verified (the renamed file's content must equal what the staleness
    check observed — if the stale holder released and a fresh writer
    re-created the lock in between, the fresh lock is restored via a
    non-clobbering link and the stealer retries)."""
    lock = os.path.join(table_path, _LOCK)
    token = f"{os.getpid()} {uuid.uuid4().hex} {time.time()}\n".encode()
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, token)
            os.close(fd)
            _HELD_TOKENS[lock] = token
            return lock
        except FileExistsError:
            try:
                with open(lock, "rb") as fh:
                    observed = fh.read()
                if time.time() - os.path.getmtime(lock) > _STALE_SEC:
                    stale = f"{lock}.stale-{uuid.uuid4().hex}"
                    os.rename(lock, stale)
                    with open(stale, "rb") as fh:
                        got = fh.read()
                    if got == observed:
                        os.remove(stale)  # confirmed the crashed holder's
                    else:
                        # raced a release + fresh re-create: we displaced a
                        # LIVE lock. Restore the path without clobbering
                        # (link refuses if a newer lock already appeared;
                        # token-verified release keeps that case safe too).
                        try:
                            os.link(stale, lock)
                        except OSError:
                            pass
                        try:
                            os.remove(stale)
                        except OSError:
                            pass
                    continue
            except OSError:
                continue  # holder released between exists-check and stat
            if time.monotonic() > deadline:
                raise TimeoutError(f"commit lock busy: {lock}")
            time.sleep(0.05)


def _release_lock(lock: str) -> None:
    token = _HELD_TOKENS.pop(lock, None)
    try:
        if token is not None:
            with open(lock, "rb") as fh:
                if fh.read() != token:
                    return  # lock was stolen and re-acquired — not ours
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
        _gc_snapshots(
            table_path, keep={snap} | ({prev_snap} if prev_snap else set())
        )
        # the in-flight marker outlives our GC: a concurrent writer whose
        # keep-set predates our commit still sees it and spares our snapshot
        try:
            os.remove(marker)
        except OSError:
            pass
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
    goes stale after ``_STALE_SEC`` and its orphan is swept then.

    Runs UNDER the commit lock with the current manifest re-read inside
    it: without that, a concurrent writer could commit (and drop its
    in-flight marker) between this writer's keep-set computation and its
    sweep, and the sweep would delete the now-current snapshot (the GC
    TOCTOU race). Holding the lock means no commit can land mid-sweep;
    if the lock is busy, GC is simply skipped — the next commit sweeps.
    """
    try:
        lock = _acquire_lock(table_path, timeout=5.0)
    except (TimeoutError, OSError):
        return
    try:
        cur = _current_snapshot(table_path)
        if cur:
            keep = keep | {cur}
        _gc_snapshots_locked(table_path, keep)
    finally:
        _release_lock(lock)


def _gc_snapshots_locked(table_path: str, keep: set[str]) -> None:
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


def vacuum_snapshots(table_path: str, keep_latest: int = 1) -> tuple[int, int]:
    """Expire superseded snapshots beyond a retention count (the VACUUM /
    expire_snapshots maintenance command of a Delta/Iceberg table).

    Under the commit lock (so the manifest can't move mid-scan): keep the
    ``keep_latest`` newest ``snap-*`` dirs by mtime — always including the
    manifest's current snapshot, whatever its age — plus anything a live
    writer has in flight; remove the rest and their stale markers.

    Returns ``(n_snapshots_before, n_removed)``. Removing the previous
    snapshot trades time-travel depth for space — exactly the contract of
    ``VACUUM table RETAIN n``; readers pinned to an expired snapshot must
    re-resolve, which is also the production semantics.
    """
    lock = _acquire_lock(table_path)
    try:
        current = _current_snapshot(table_path)

        def _live(snap_name: str) -> bool:
            m = _inflight_marker(table_path, snap_name)
            try:
                return time.time() - os.path.getmtime(m) <= _STALE_SEC
            except OSError:
                return False

        snaps = [
            n
            for n in os.listdir(table_path)
            if n.startswith("snap-")
            and os.path.isdir(os.path.join(table_path, n))
        ]
        snaps.sort(
            key=lambda n: os.path.getmtime(os.path.join(table_path, n)),
            reverse=True,
        )
        keep = set(snaps[: max(keep_latest, 0)])
        if current:
            keep.add(current)
        removed = 0
        for name in snaps:
            if name in keep or _live(name):
                continue
            shutil.rmtree(os.path.join(table_path, name), ignore_errors=True)
            try:
                os.remove(_inflight_marker(table_path, name))
            except OSError:
                pass
            removed += 1
        return len(snaps), removed
    finally:
        _release_lock(lock)


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
        _gc_snapshots(
            table_path, keep={snap} | ({prev_snap} if prev_snap else set())
        )
        # the in-flight marker outlives our GC: a concurrent writer whose
        # keep-set predates our commit still sees it and spares our snapshot
        try:
            os.remove(marker)
        except OSError:
            pass
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


# ---------------------------------------------------------------------------
# Partition-pruned MERGE (the Delta/Iceberg file-pruning story)
# ---------------------------------------------------------------------------

_PMANIFEST = "_MANIFEST_PARTS"
_PMANIFEST_PREV = "_MANIFEST_PARTS.prev"
#: partition values become directory names — keep them filesystem-clean
_SAFE_PART = __import__("re").compile(r"^[A-Za-z0-9._-]+$")


def _read_pmanifest(table_path: str, name: str = _PMANIFEST) -> dict:
    """{"partition_col": str, "parts": {value: snapshot-dir}} or {}."""
    import json

    mf = os.path.join(table_path, name)
    if not os.path.exists(mf):
        return {}
    with open(mf, encoding="utf-8") as f:
        return json.load(f)


def upsert_partitioned(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    partition_col: str,
) -> list[str]:
    """Partition-pruned MERGE: rewrite ONLY the partitions the batch
    touches — the flat emulation's full-table rewrite is what non-ACID
    storage forces, and THIS is what Delta/Iceberg MERGE actually does
    with its file-level pruning (SURVEY.md §4.3.2 scale note; reference
    semantics unchanged from ``upsert_articles``).

    Layout: immutable ``snap-*`` dirs hold hive-partitioned parquet
    (``<col>=<value>/``); ``_MANIFEST_PARTS`` is a JSON map
    partition-value → owning snapshot. A MERGE reads only the affected
    partitions (pointer lookup + pruned scan), writes a snapshot
    containing only those partitions rewritten, and commits by CAS on
    the affected POINTER ENTRIES under the commit lock — so two writers
    touching DISJOINT partitions both succeed first-try (Delta-style
    partition-level conflict detection), and only a genuine overlap
    forces the loser to re-merge.

    Contract: a key's partition value must be immutable (derive it from
    an immutable attribute — e.g. publish DATE — exactly the constraint
    Delta's dynamic partition overwrite carries); values must be
    non-null and filesystem-safe. Returns the rewritten partition list.
    """
    import json

    os.makedirs(table_path, exist_ok=True)
    updates = updates.withColumn(
        partition_col, F.col(partition_col).cast("string")
    )
    affected = sorted(
        # driver-ok: distinct partition values — bounded partition
        # domain (one row per touched partition, never per data row)
        r[0] for r in updates.select(partition_col).distinct().collect()
    )
    for v in affected:
        if v is None or not _SAFE_PART.match(v):
            raise ValueError(f"bad partition value for {partition_col}: {v!r}")
    for _ in range(_MAX_RETRIES + 1):
        m = _read_pmanifest(table_path)
        if m and m.get("partition_col") not in (None, partition_col):
            raise ValueError(
                f"table is partitioned by {m['partition_col']!r}, "
                f"not {partition_col!r}"
            )
        base_parts = dict(m.get("parts", {}))
        target = _read_partition_slice(
            spark,
            table_path,
            {p: base_parts[p] for p in affected if p in base_parts},
            partition_col,
        )
        merged = merge_upsert_frames(target, updates)
        snap = f"snap-{uuid.uuid4().hex}"
        marker = _inflight_marker(table_path, snap)
        with open(marker, "w", encoding="utf-8") as f:
            f.write(f"{os.getpid()} {time.time()}\n")
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            os.path.join(table_path, snap)
        )
        lock = _acquire_lock(table_path)
        try:
            cur = _read_pmanifest(table_path)
            cur_parts = dict(cur.get("parts", {}))
            if any(cur_parts.get(p) != base_parts.get(p) for p in affected):
                conflict = True
            else:
                conflict = False
                new_m = {
                    "partition_col": partition_col,
                    "parts": {**cur_parts, **{p: snap for p in affected}},
                }
                if os.path.exists(os.path.join(table_path, _PMANIFEST)):
                    shutil.copy(
                        os.path.join(table_path, _PMANIFEST),
                        os.path.join(table_path, _PMANIFEST_PREV),
                    )
                tmp_mf = os.path.join(
                    table_path, f"._pmanifest_{uuid.uuid4().hex}"
                )
                with open(tmp_mf, "w", encoding="utf-8") as f:
                    json.dump(new_m, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.rename(
                    tmp_mf, os.path.join(table_path, _PMANIFEST)
                )  # commit point
        finally:
            _release_lock(lock)
        if conflict:
            shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
            try:
                os.remove(marker)
            except OSError:
                pass
            continue
        _gc_partitioned(table_path)
        # marker removed only after GC — see _gc_snapshots' TOCTOU note
        try:
            os.remove(marker)
        except OSError:
            pass
        return affected
    raise RuntimeError(
        f"partitioned upsert lost the commit race "
        f"{_MAX_RETRIES + 1} times: {table_path}"
    )


def _read_partition_slice(
    spark: SparkSession,
    table_path: str,
    part_to_snap: dict,
    partition_col: str,
) -> DataFrame | None:
    """Read exactly the given partition→snapshot pointers (pruned scan:
    only the named hive dirs are listed, nothing else is touched)."""
    if not part_to_snap:
        return None
    by_snap: dict[str, list[str]] = {}
    for p, s in part_to_snap.items():
        by_snap.setdefault(s, []).append(p)
    out = None
    for snap, vals in sorted(by_snap.items()):
        base = os.path.join(table_path, snap)
        paths = [os.path.join(base, f"{partition_col}={v}") for v in vals]
        df = (
            spark.read.option("basePath", base)
            .parquet(*paths)
            # partition-dir type inference varies per snapshot (an
            # all-digit value infers int); normalize for unionByName
            .withColumn(partition_col, F.col(partition_col).cast("string"))
        )
        out = df if out is None else out.unionByName(df)
    return out


def read_partitioned(spark: SparkSession, table_path: str) -> DataFrame | None:
    """Read the partitioned table's current committed state."""
    m = _read_pmanifest(table_path)
    if not m:
        return None
    return _read_partition_slice(
        spark, table_path, m["parts"], m["partition_col"]
    )


def _gc_partitioned(table_path: str) -> None:
    """Sweep snapshots referenced by NEITHER the current nor the
    previous manifest (kept for in-flight readers), sparing live
    in-flight writers — same policy as the flat table's GC.

    Like :func:`_gc_snapshots`, the manifest read AND the sweep run
    under the commit lock so a concurrent writer cannot commit (and
    drop its marker) between keep-set computation and rmtree — the
    window in which this GC would delete a freshly current snapshot.
    Lock busy -> skip; the next commit sweeps."""
    try:
        lock = _acquire_lock(table_path, timeout=5.0)
    except (TimeoutError, OSError):
        return
    try:
        keep = set(
            _read_pmanifest(table_path).get("parts", {}).values()
        ) | set(
            _read_pmanifest(table_path, _PMANIFEST_PREV)
            .get("parts", {})
            .values()
        )

        def _live(snap_name: str) -> bool:
            mk = _inflight_marker(table_path, snap_name)
            try:
                return time.time() - os.path.getmtime(mk) <= _STALE_SEC
            except OSError:
                return False

        for name in os.listdir(table_path):
            if not name.startswith("snap-") or name in keep or _live(name):
                continue
            shutil.rmtree(os.path.join(table_path, name), ignore_errors=True)
    finally:
        _release_lock(lock)


def delete_where_partitioned(
    spark: SparkSession,
    table_path: str,
    condition,
    partition_values: list[str] | None = None,
) -> list[str]:
    """Partition-pruned DELETE: rewrite only partitions that can hold
    matching rows. ``partition_values`` names them when the caller knows
    (a retention delete on the partition column itself — the common
    case, where pruning is free); None falls back to scanning each
    partition for matches first and rewriting only those with hits.
    Commit/conflict semantics identical to :func:`upsert_partitioned`.
    """
    import json

    for _ in range(_MAX_RETRIES + 1):
        m = _read_pmanifest(table_path)
        if not m:
            return []
        pcol = m["partition_col"]
        base_parts = dict(m.get("parts", {}))
        if partition_values is not None:
            affected = sorted(set(partition_values) & set(base_parts))
        else:
            affected = sorted(
                p
                for p in base_parts
                if _read_partition_slice(
                    spark, table_path, {p: base_parts[p]}, pcol
                )
                .filter(condition)
                .limit(1)
                .count()
                > 0
            )
        if not affected:
            return []
        survivors = _read_partition_slice(
            spark, table_path, {p: base_parts[p] for p in affected}, pcol
        ).filter(~condition)
        snap = f"snap-{uuid.uuid4().hex}"
        marker = _inflight_marker(table_path, snap)
        with open(marker, "w", encoding="utf-8") as f:
            f.write(f"{os.getpid()} {time.time()}\n")
        survivors.write.mode("overwrite").partitionBy(pcol).parquet(
            os.path.join(table_path, snap)
        )
        # a partition whose rows were ALL deleted writes no hive dir —
        # its pointer must be dropped, not pointed at a missing path
        emptied = {
            p
            for p in affected
            if not os.path.isdir(
                os.path.join(table_path, snap, f"{pcol}={p}")
            )
        }
        lock = _acquire_lock(table_path)
        try:
            cur = _read_pmanifest(table_path)
            cur_parts = dict(cur.get("parts", {}))
            if any(cur_parts.get(p) != base_parts.get(p) for p in affected):
                conflict = True
            else:
                conflict = False
                new_parts = {
                    p: (snap if p in affected else s)
                    for p, s in cur_parts.items()
                    if not (p in emptied)
                }
                new_m = {"partition_col": pcol, "parts": new_parts}
                if os.path.exists(os.path.join(table_path, _PMANIFEST)):
                    shutil.copy(
                        os.path.join(table_path, _PMANIFEST),
                        os.path.join(table_path, _PMANIFEST_PREV),
                    )
                tmp_mf = os.path.join(
                    table_path, f"._pmanifest_{uuid.uuid4().hex}"
                )
                with open(tmp_mf, "w", encoding="utf-8") as f:
                    json.dump(new_m, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.rename(tmp_mf, os.path.join(table_path, _PMANIFEST))
        finally:
            _release_lock(lock)
        if conflict:
            shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
            try:
                os.remove(marker)
            except OSError:
                pass
            continue
        _gc_partitioned(table_path)
        # marker removed only after GC — see _gc_snapshots' TOCTOU note
        try:
            os.remove(marker)
        except OSError:
            pass
        return affected
    raise RuntimeError(
        f"partitioned delete lost the commit race "
        f"{_MAX_RETRIES + 1} times: {table_path}"
    )


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    target_files_per_partition: int = 1,
    partition_values: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> list[str]:
    """OPTIMIZE analog for the partitioned table: rewrite each selected
    partition's many small files into ``target_files_per_partition``
    coalesced files — data unchanged, only layout — and swap the
    pointers with the same partition-level CAS as a MERGE, so a
    concurrent writer on other partitions is untouched and a concurrent
    writer on a compacted partition wins cleanly (compaction retries or
    skips; it never clobbers data commits). Partitions already at or
    below the target file count are skipped (nothing to do).

    ``cluster_by`` is the OPTIMIZE ... ZORDER BY analog: output files
    are split by RANGE over the cluster columns (repartitionByRange +
    sortWithinPartitions) instead of by hash, so each file covers a
    disjoint cluster-key range and min/max footer zone maps prune
    key-filtered scans to one file instead of all of them — the whole
    point of clustering. For multi-column z-ordering, pass a
    precomputed interleaved-bits column (plans/llm24's Morton zval
    construction) as the single cluster key."""
    import glob as _glob
    import json

    for _ in range(_MAX_RETRIES + 1):
        m = _read_pmanifest(table_path)
        if not m:
            return []
        pcol = m["partition_col"]
        base_parts = dict(m.get("parts", {}))
        todo = sorted(
            p
            for p in (partition_values or base_parts)
            if p in base_parts
            and (
                cluster_by is not None  # re-layout is the point: no skip
                or len(
                    _glob.glob(
                        os.path.join(
                            table_path,
                            base_parts[p],
                            f"{pcol}={p}",
                            "*.parquet",
                        )
                    )
                )
                > target_files_per_partition
            )
        )
        if not todo:
            return []
        data = _read_partition_slice(
            spark, table_path, {p: base_parts[p] for p in todo}, pcol
        )
        n_out = target_files_per_partition * len(todo)
        if cluster_by:
            data = data.repartitionByRange(
                n_out, pcol, *cluster_by
            ).sortWithinPartitions(pcol, *cluster_by)
        else:
            data = data.repartition(n_out, pcol)
        snap = f"snap-{uuid.uuid4().hex}"
        marker = _inflight_marker(table_path, snap)
        with open(marker, "w", encoding="utf-8") as f:
            f.write(f"{os.getpid()} {time.time()}\n")
        data.write.mode("overwrite").partitionBy(pcol).parquet(
            os.path.join(table_path, snap)
        )
        lock = _acquire_lock(table_path)
        try:
            cur = _read_pmanifest(table_path)
            cur_parts = dict(cur.get("parts", {}))
            if any(cur_parts.get(p) != base_parts.get(p) for p in todo):
                conflict = True
            else:
                conflict = False
                new_m = {
                    "partition_col": pcol,
                    "parts": {**cur_parts, **{p: snap for p in todo}},
                }
                if os.path.exists(os.path.join(table_path, _PMANIFEST)):
                    shutil.copy(
                        os.path.join(table_path, _PMANIFEST),
                        os.path.join(table_path, _PMANIFEST_PREV),
                    )
                tmp_mf = os.path.join(
                    table_path, f"._pmanifest_{uuid.uuid4().hex}"
                )
                with open(tmp_mf, "w", encoding="utf-8") as f:
                    json.dump(new_m, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.rename(tmp_mf, os.path.join(table_path, _PMANIFEST))
        finally:
            _release_lock(lock)
        if conflict:
            shutil.rmtree(os.path.join(table_path, snap), ignore_errors=True)
            try:
                os.remove(marker)
            except OSError:
                pass
            continue
        _gc_partitioned(table_path)
        # marker removed only after GC — see _gc_snapshots' TOCTOU note
        try:
            os.remove(marker)
        except OSError:
            pass
        return todo
    raise RuntimeError(
        f"compaction lost the commit race {_MAX_RETRIES + 1} times: "
        f"{table_path}"
    )
