"""Keyed-upsert (MERGE) semantics + idempotence (SURVEY.md §2.8 K1, §5.2.3).

Reference behavior (database_utils/database_methods.py:68-107): matched keys
update all non-key columns and refresh Processed_at; unmatched insert; rows
not in the batch survive. Re-running the same batch changes nothing except
Processed_at.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from pyspark.sql import Row

from news_ingestion_data_pipeline_spark.operators import upsert
from news_ingestion_data_pipeline_spark.schemas import ARTICLE_SCHEMA

TS = dt.datetime(2025, 8, 1, 12, 0, 0)


def art(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                Article_id=r[0],
                News_link=f"https://x/{r[0]}",
                News_title=r[1],
                Author_name=None,
                News_published_time=r[2],
                Source_name="Skift",
                Processed_at=r[3],
            )
            for r in rows
        ],
        ARTICLE_SCHEMA,
    )


def test_merge_update_insert_survive(spark):
    target = art(spark, [("a", "old-a", TS, TS), ("b", "old-b", TS, TS)])
    updates = art(
        spark,
        [("a", "new-a", TS, TS + dt.timedelta(hours=1)),
         ("c", "new-c", TS, TS + dt.timedelta(hours=1))],
    )
    out = {
        r["Article_id"]: (r["News_title"], r["Processed_at"])
        for r in upsert.merge_upsert_frames(target, updates).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["a"][0] == "new-a"  # matched → incoming wins
    assert out["a"][1] == TS + dt.timedelta(hours=1)  # Processed_at refreshed
    assert out["b"] == ("old-b", TS)  # untouched row survives unchanged
    assert out["c"][0] == "new-c"  # unmatched → inserted


def test_upsert_roundtrip_and_idempotence(spark, tmp_path):
    path = os.path.join(str(tmp_path), "articles_tbl")
    batch = art(spark, [("a", "t-a", TS, TS), ("b", "t-b", TS, TS)])
    upsert.upsert_articles(spark, path, batch)
    first = {r["Article_id"]: r for r in upsert.read_articles(spark, path).collect()}
    assert set(first) == {"a", "b"}

    # re-run the identical batch → table unchanged (same Processed_at since
    # the batch carries it; the reference refreshes it via CURRENT_TIMESTAMP
    # which our finalize_articles stamps before the merge)
    upsert.upsert_articles(spark, path, batch)
    second = {r["Article_id"]: r for r in upsert.read_articles(spark, path).collect()}
    assert first == second

    # boundary-day re-ingest: same key, newer Processed_at → refreshed
    newer = art(spark, [("a", "t-a", TS, TS + dt.timedelta(days=1))])
    upsert.upsert_articles(spark, path, newer)
    third = {r["Article_id"]: r for r in upsert.read_articles(spark, path).collect()}
    assert third["a"]["Processed_at"] == TS + dt.timedelta(days=1)
    assert third["b"] == second["b"]


def test_upsert_creates_table_when_missing(spark, tmp_path):
    path = os.path.join(str(tmp_path), "fresh_tbl")
    assert upsert.read_articles(spark, path) is None
    upsert.upsert_articles(spark, path, art(spark, [("z", "t", TS, TS)]))
    assert upsert.read_articles(spark, path).count() == 1
    upsert.drop_table(path)
    assert upsert.read_articles(spark, path) is None


def _rows(spark, path):
    return {
        r["Article_id"]: (r["News_title"], r["Processed_at"])
        for r in upsert.read_articles(spark, path).collect()
    }


def test_crash_before_manifest_commit_preserves_table(spark, tmp_path, monkeypatch):
    """Kill the writer after the snapshot is fully written but BEFORE the
    manifest rename (the window that lost the table pointer under the old
    double-rename swap): the committed table must be untouched, and a
    clean re-run must land the update."""
    path = os.path.join(str(tmp_path), "crash_tbl")
    upsert.upsert_articles(spark, path, art(spark, [("a", "v1", TS, TS)]))
    before = _rows(spark, path)

    real_rename = os.rename

    def exploding_rename(src, dst):
        if os.path.basename(dst) == upsert._MANIFEST:
            raise OSError("simulated crash at commit point")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", exploding_rename)
    try:
        upsert.upsert_articles(
            spark, path, art(spark, [("a", "v2", TS, TS + dt.timedelta(hours=1))])
        )
    except OSError:
        pass
    monkeypatch.setattr(os, "rename", real_rename)

    # old snapshot still committed and readable
    assert _rows(spark, path) == before
    # recovery: rerun commits normally and GCs the orphan snapshot
    upsert.upsert_articles(
        spark, path, art(spark, [("a", "v2", TS, TS + dt.timedelta(hours=1))])
    )
    assert _rows(spark, path)["a"][0] == "v2"


def test_crash_during_snapshot_write_preserves_table(spark, tmp_path):
    """A half-written snapshot dir (no manifest update) must be invisible
    to readers and swept by the next successful commit."""
    path = os.path.join(str(tmp_path), "halfsnap_tbl")
    upsert.upsert_articles(spark, path, art(spark, [("a", "v1", TS, TS)]))
    before = _rows(spark, path)
    # simulate a writer that died mid-snapshot: orphan dir, no manifest change
    orphan = os.path.join(path, "snap-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _rows(spark, path) == before
    upsert.upsert_articles(spark, path, art(spark, [("b", "v1", TS, TS)]))
    assert set(_rows(spark, path)) == {"a", "b"}
    assert not os.path.exists(orphan)


def test_manifest_commit_is_single_atomic_rename(spark, tmp_path, monkeypatch):
    """Exactly one rename lands on the manifest per upsert — the commit is
    a single atomic operation, not a multi-step swap."""
    path = os.path.join(str(tmp_path), "atomic_tbl")
    real_rename = os.rename
    manifest_renames = []

    def counting_rename(src, dst):
        if os.path.basename(dst) == upsert._MANIFEST:
            manifest_renames.append((src, dst))
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", counting_rename)
    upsert.upsert_articles(spark, path, art(spark, [("a", "v1", TS, TS)]))
    assert len(manifest_renames) == 1


def test_legacy_flat_layout_still_readable_and_upgradable(spark, tmp_path):
    """Tables written before the manifest protocol (parquet files directly
    at table_path) read fine and are upgraded in place by the next upsert."""
    path = os.path.join(str(tmp_path), "legacy_tbl")
    art(spark, [("a", "v1", TS, TS)]).write.parquet(path)
    assert _rows(spark, path)["a"][0] == "v1"
    upsert.upsert_articles(spark, path, art(spark, [("b", "v1", TS, TS)]))
    assert set(_rows(spark, path)) == {"a", "b"}
    assert os.path.exists(os.path.join(path, upsert._MANIFEST))


def test_concurrent_writers_one_wins_one_retries(spark, tmp_path, monkeypatch):
    """Two writers racing from the same base: the first commit wins, the
    second hits CommitConflict and must RE-MERGE against the winner's
    snapshot — no last-writer-wins clobbering of the winner's rows."""
    path = os.path.join(str(tmp_path), "race_tbl")
    upsert.upsert_articles(spark, path, art(spark, [("a", "v1", TS, TS)]))

    real_commit = upsert._commit_snapshot
    commit_attempts = []

    def racing_commit(table_path, snap, expected_base):
        commit_attempts.append(expected_base)
        if len(commit_attempts) == 1:
            # writer B sneaks in a full successful upsert between writer
            # A's base read and A's commit attempt
            upsert.upsert_articles(
                spark, path, art(spark, [("b", "from-b", TS, TS)])
            )
        return real_commit(table_path, snap, expected_base)

    monkeypatch.setattr(upsert, "_commit_snapshot", racing_commit)
    upsert.upsert_articles(spark, path, art(spark, [("c", "from-a", TS, TS)]))
    monkeypatch.undo()

    rows = _rows(spark, path)
    assert set(rows) == {"a", "b", "c"}, "loser's retry dropped a row"
    # A's first attempt + B's commit + A's retry
    assert len(commit_attempts) == 3
    # no lock / marker / temp-manifest debris
    leftovers = [
        n for n in os.listdir(path)
        if n.startswith((".inflight-", "._manifest_")) or n == upsert._LOCK
    ]
    assert leftovers == []


def test_stale_commit_lock_is_stolen(spark, tmp_path):
    """A lock left by a crashed writer (mtime past the stale window) must
    not block the next commit forever."""
    path = os.path.join(str(tmp_path), "stale_lock_tbl")
    upsert.upsert_articles(spark, path, art(spark, [("a", "v1", TS, TS)]))
    lock = os.path.join(path, upsert._LOCK)
    with open(lock, "w", encoding="utf-8") as f:
        f.write("99999 0\n")
    old = dt.datetime.now().timestamp() - upsert._STALE_SEC - 10
    os.utime(lock, (old, old))
    upsert.upsert_articles(spark, path, art(spark, [("b", "v2", TS, TS)]))
    assert set(_rows(spark, path)) == {"a", "b"}
    assert not os.path.exists(lock)


def test_gc_spares_live_inflight_snapshot_then_sweeps_stale(spark, tmp_path):
    """GC must not sweep a snapshot another writer is mid-writing (live
    .inflight marker); once the marker goes stale the orphan is swept."""
    path = os.path.join(str(tmp_path), "inflight_tbl")
    upsert.upsert_articles(spark, path, art(spark, [("a", "v1", TS, TS)]))
    snap = "snap-inflightwriter"
    os.makedirs(os.path.join(path, snap))
    marker = upsert._inflight_marker(path, snap)
    with open(marker, "w", encoding="utf-8") as f:
        f.write("123 now\n")

    upsert.upsert_articles(spark, path, art(spark, [("b", "v1", TS, TS)]))
    assert os.path.exists(os.path.join(path, snap)), "swept a live in-flight"

    old = dt.datetime.now().timestamp() - upsert._STALE_SEC - 10
    os.utime(marker, (old, old))
    upsert.upsert_articles(spark, path, art(spark, [("c", "v1", TS, TS)]))
    assert not os.path.exists(os.path.join(path, snap))
    assert not os.path.exists(marker)


def _part_df(spark, rows):
    """rows: (Article_id, version, part)"""
    return spark.createDataFrame(
        [Row(Article_id=a, version=v, part=p) for a, v, p in rows]
    )


def test_partitioned_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """The batch touches one partition: every other partition's parquet
    files must remain byte-for-byte in place (same paths, same mtimes) —
    the file-pruning behavior Delta/Iceberg MERGE provides."""
    import glob

    path = os.path.join(str(tmp_path), "ptbl")
    upsert.upsert_partitioned(
        spark,
        path,
        _part_df(spark, [("a", "v1", "p1"), ("b", "v1", "p1"), ("c", "v1", "p2"), ("d", "v1", "p3")]),
        "part",
    )
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "*", "part=p2", "*.parquet"))
        + glob.glob(os.path.join(path, "*", "part=p3", "*.parquet"))
    }
    assert before, "expected hive partition dirs"
    rewritten = upsert.upsert_partitioned(
        spark, path, _part_df(spark, [("a", "v2", "p1"), ("e", "v1", "p1")]), "part"
    )
    assert rewritten == ["p1"]
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "*", "part=p2", "*.parquet"))
        + glob.glob(os.path.join(path, "*", "part=p3", "*.parquet"))
    }
    assert after == before, "untouched partitions were rewritten"
    out = {
        r.Article_id: (r.version, r.part)
        for r in upsert.read_partitioned(spark, path).collect()
    }
    assert out == {
        "a": ("v2", "p1"),
        "b": ("v1", "p1"),
        "c": ("v1", "p2"),
        "d": ("v1", "p3"),
        "e": ("v1", "p1"),
    }


def test_partitioned_upsert_idempotent_rerun(spark, tmp_path):
    path = os.path.join(str(tmp_path), "ptbl_idem")
    batch = _part_df(spark, [("a", "v1", "p1"), ("c", "v1", "p2")])
    upsert.upsert_partitioned(spark, path, batch, "part")
    once = sorted(
        tuple(r) for r in upsert.read_partitioned(spark, path).collect()
    )
    upsert.upsert_partitioned(spark, path, batch, "part")
    twice = sorted(
        tuple(r) for r in upsert.read_partitioned(spark, path).collect()
    )
    assert once == twice


def test_partitioned_disjoint_writers_no_conflict(spark, tmp_path, monkeypatch):
    """Writers touching DISJOINT partitions must both commit without a
    retry — partition-level conflict detection, not whole-table CAS."""
    path = os.path.join(str(tmp_path), "ptbl_race")
    upsert.upsert_partitioned(
        spark, path, _part_df(spark, [("a", "v1", "p1"), ("c", "v1", "p2")]), "part"
    )

    real_read = upsert._read_pmanifest
    state = {"injected": False}

    def racing_read(table_path, name=upsert._PMANIFEST):
        m = real_read(table_path, name)
        # inject writer B's commit AFTER writer A has read its base
        # manifest (first read of the outer upsert) but before A commits
        if not state["injected"] and name == upsert._PMANIFEST:
            state["injected"] = True
            monkeypatch.setattr(upsert, "_read_pmanifest", real_read)
            upsert.upsert_partitioned(
                spark, path, _part_df(spark, [("z", "v9", "p2")]), "part"
            )
            monkeypatch.setattr(upsert, "_read_pmanifest", racing_read)
        return m

    monkeypatch.setattr(upsert, "_read_pmanifest", racing_read)
    upsert.upsert_partitioned(
        spark, path, _part_df(spark, [("b", "v2", "p1")]), "part"
    )
    monkeypatch.undo()
    out = {
        r.Article_id: (r.version, r.part)
        for r in upsert.read_partitioned(spark, path).collect()
    }
    assert out == {
        "a": ("v1", "p1"),
        "b": ("v2", "p1"),
        "c": ("v1", "p2"),
        "z": ("v9", "p2"),
    }


def test_partitioned_overlapping_writers_loser_remerges(
    spark, tmp_path, monkeypatch
):
    """Writers racing on the SAME partition: the loser must re-merge and
    keep the winner's rows."""
    path = os.path.join(str(tmp_path), "ptbl_race2")
    upsert.upsert_partitioned(
        spark, path, _part_df(spark, [("a", "v1", "p1")]), "part"
    )

    real_read = upsert._read_pmanifest
    state = {"injected": False}

    def racing_read(table_path, name=upsert._PMANIFEST):
        m = real_read(table_path, name)
        if not state["injected"] and name == upsert._PMANIFEST:
            state["injected"] = True
            monkeypatch.setattr(upsert, "_read_pmanifest", real_read)
            upsert.upsert_partitioned(
                spark, path, _part_df(spark, [("w", "vW", "p1")]), "part"
            )
            monkeypatch.setattr(upsert, "_read_pmanifest", racing_read)
        return m

    monkeypatch.setattr(upsert, "_read_pmanifest", racing_read)
    upsert.upsert_partitioned(
        spark, path, _part_df(spark, [("b", "v2", "p1")]), "part"
    )
    monkeypatch.undo()
    out = {
        r.Article_id: r.version
        for r in upsert.read_partitioned(spark, path).collect()
    }
    assert out == {"a": "v1", "w": "vW", "b": "v2"}, "winner's row lost"


def test_partitioned_delete_prunes_and_drops_emptied_partition(spark, tmp_path):
    """Retention delete on the partition column touches only that
    partition (others' files untouched); a fully-emptied partition's
    pointer disappears from the manifest."""
    import glob

    from pyspark.sql import functions as F

    path = os.path.join(str(tmp_path), "pdel_tbl")
    upsert.upsert_partitioned(
        spark,
        path,
        _part_df(
            spark,
            [("a", "v1", "p1"), ("b", "v1", "p1"), ("c", "v1", "p2"), ("d", "v1", "p3")],
        ),
        "part",
    )
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "*", "part=p1", "*.parquet"))
    }
    # delete ALL of p2 (partition known a priori — the retention shape)
    deleted = upsert.delete_where_partitioned(
        spark, path, F.col("part") == "p2", partition_values=["p2"]
    )
    assert deleted == ["p2"]
    m = upsert._read_pmanifest(path)
    assert "p2" not in m["parts"], "emptied partition pointer must drop"
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(path, "*", "part=p1", "*.parquet"))
    }
    assert after == before, "untouched partition rewritten by delete"
    out = {r.Article_id for r in upsert.read_partitioned(spark, path).collect()}
    assert out == {"a", "b", "d"}

    # predicate NOT on the partition column: fallback scan finds the one
    # partition with matches and rewrites only it
    deleted = upsert.delete_where_partitioned(
        spark, path, F.col("Article_id") == "a"
    )
    assert deleted == ["p1"]
    out = {r.Article_id for r in upsert.read_partitioned(spark, path).collect()}
    assert out == {"b", "d"}


def test_compact_partitions_reduces_files_keeps_data(spark, tmp_path):
    """OPTIMIZE analog: many small files per partition become one; data
    hash-identical; already-compact partitions are skipped."""
    import glob

    import json

    path = os.path.join(str(tmp_path), "ctbl")
    # seed a deliberately fragmented snapshot by hand (MERGE writes are
    # AQE-coalesced, so fragmentation in production accrues from many
    # commits — emulate the accrued state directly)
    snap = "snap-fragmented0"
    wide = spark.createDataFrame(
        [Row(Article_id=f"k{i}", version="v1", part="p1") for i in range(40)]
        + [Row(Article_id="solo", version="v1", part="p2")]
    ).repartition(8)
    wide.write.partitionBy("part").parquet(os.path.join(path, snap))
    with open(os.path.join(path, upsert._PMANIFEST), "w") as f:
        json.dump(
            {"partition_col": "part", "parts": {"p1": snap, "p2": snap}}, f
        )
    m = upsert._read_pmanifest(path)
    p1_files = glob.glob(
        os.path.join(path, m["parts"]["p1"], "part=p1", "*.parquet")
    )
    assert len(p1_files) > 1, "fixture failed to fragment p1"
    before = sorted(
        tuple(r) for r in upsert.read_partitioned(spark, path).collect()
    )
    p2_snap = m["parts"]["p2"]

    compacted = upsert.compact_partitions(spark, path)
    m2 = upsert._read_pmanifest(path)
    assert "p1" in compacted
    assert m2["parts"]["p2"] == p2_snap or "p2" in compacted
    p1_after = glob.glob(
        os.path.join(path, m2["parts"]["p1"], "part=p1", "*.parquet")
    )
    assert len(p1_after) == 1
    after = sorted(
        tuple(r) for r in upsert.read_partitioned(spark, path).collect()
    )
    assert after == before, "compaction changed data"
    # second pass: nothing left to do
    assert upsert.compact_partitions(spark, path) == []


def test_clustered_compaction_yields_disjoint_file_ranges(spark, tmp_path):
    """OPTIMIZE ... ZORDER analog: cluster_by splits a partition into
    files covering DISJOINT key ranges (zone-map-prunable), where hash
    compaction leaves every file spanning the full key range."""
    import glob
    import json

    from pyspark.sql import functions as F

    path = os.path.join(str(tmp_path), "ztbl")
    snap = "snap-seed0"
    rows = [
        Row(Article_id=f"k{i}", version=str(i % 997), part="p1")
        for i in range(400)
    ]
    spark.createDataFrame(rows).repartition(8).write.partitionBy(
        "part"
    ).parquet(os.path.join(path, snap))
    with open(os.path.join(path, upsert._PMANIFEST), "w") as f:
        json.dump({"partition_col": "part", "parts": {"p1": snap}}, f)

    def file_key_ranges():
        m = upsert._read_pmanifest(path)
        out = []
        for fp in glob.glob(
            os.path.join(path, m["parts"]["p1"], "part=p1", "*.parquet")
        ):
            r = (
                spark.read.parquet(fp)
                .agg(F.min("Article_id"), F.max("Article_id"))
                .collect()[0]
            )
            out.append((r[0], r[1]))
        return sorted(out)

    upsert.compact_partitions(
        spark, path, target_files_per_partition=4, cluster_by=["Article_id"]
    )
    ranges = file_key_ranges()
    assert len(ranges) >= 2, "clustered compaction produced a single file"
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: {ranges}"
    # data unchanged
    got = {
        r.Article_id: r.version
        for r in upsert.read_partitioned(spark, path).collect()
    }
    assert got == {f"k{i}": str(i % 997) for i in range(400)}


def test_steal_verifies_identity_before_discarding(tmp_path):
    """ADVICE r5: if the stale holder releases and a FRESH writer
    re-creates the lock between the staleness check and the rename,
    the stealer must restore the fresh lock instead of discarding it."""
    import threading
    import time as _time

    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = str(tmp_path / "tbl")
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, UP._LOCK)
    # a stale lock from a "crashed" writer
    with open(lock, "wb") as fh:
        fh.write(b"999999 deadbeef 0\n")
    old = _time.time() - UP._STALE_SEC - 10
    os.utime(lock, (old, old))

    # fresh writer takes over the path the instant the stale file is
    # observed: monkeypatch os.rename to interleave release+recreate
    real_rename = os.rename
    fresh_token = b"fresh-holder\n"
    done = {"swapped": False}

    def raced_rename(src, dst):
        if src == lock and not done["swapped"]:
            done["swapped"] = True
            real_rename(lock, lock + ".gone")  # stale holder releases
            os.remove(lock + ".gone")
            with open(lock, "wb") as fh:  # fresh writer re-creates
                fh.write(fresh_token)
        return real_rename(src, dst)

    os.rename = raced_rename
    try:
        # stealer sees a fresh (non-stale) lock after the failed steal
        # and must time out rather than enter the critical section
        with pytest.raises(TimeoutError):
            UP._acquire_lock(path, timeout=1.0)
    finally:
        os.rename = real_rename
    # the fresh holder's lock survived the attempted steal
    with open(lock, "rb") as fh:
        assert fh.read() == fresh_token


def test_release_refuses_foreign_lock(tmp_path):
    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = str(tmp_path / "tbl2")
    os.makedirs(path, exist_ok=True)
    lock = UP._acquire_lock(path, timeout=1.0)
    # simulate a steal + re-acquire by another process
    with open(lock, "wb") as fh:
        fh.write(b"other-process\n")
    UP._release_lock(lock)
    assert os.path.exists(lock)  # not ours anymore -> untouched
    os.remove(lock)
