"""Protocol-level tests for the clean-room Delta log reader
(operators/deltalog.py): add/remove replay, commit ordering, version
pinning, and error surfaces — independent of the registry queries."""

import json
import os

import pytest

from news_ingestion_data_pipeline_spark.operators import deltalog as DL


def _mk_table(tmp_path, commits):
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    for v, actions in commits.items():
        with open(
            os.path.join(root, "_delta_log", f"{v:020d}.json"),
            "w",
            encoding="utf-8",
        ) as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
    return root


def _add(p):
    return {"add": {"path": p, "partitionValues": {}, "size": 1,
                    "modificationTime": 0, "dataChange": True}}


def _rm(p):
    return {"remove": {"path": p, "deletionTimestamp": 0,
                       "dataChange": True}}


def test_replay_add_then_remove(tmp_path):
    root = _mk_table(tmp_path, {0: [_add("a.parquet"), _add("b.parquet")],
                                1: [_rm("a.parquet")]})
    assert [os.path.basename(f) for f in DL.delta_snapshot_files(root)] == [
        "b.parquet"
    ]
    # time travel: v0 still sees both
    assert [os.path.basename(f) for f in DL.delta_snapshot_files(root, 0)] == [
        "a.parquet",
        "b.parquet",
    ]


def test_re_add_after_remove_is_live(tmp_path):
    root = _mk_table(
        tmp_path,
        {0: [_add("a.parquet")], 1: [_rm("a.parquet")], 2: [_add("a.parquet")]},
    )
    assert [os.path.basename(f) for f in DL.delta_snapshot_files(root)] == [
        "a.parquet"
    ]
    assert DL.delta_snapshot_files(root, 1) == []


def test_within_commit_order_wins(tmp_path):
    # a remove followed by an add of the same path in ONE commit = live
    root = _mk_table(tmp_path, {0: [_add("a.parquet")],
                                1: [_rm("a.parquet"), _add("a.parquet")]})
    assert [os.path.basename(f) for f in DL.delta_snapshot_files(root)] == [
        "a.parquet"
    ]


def test_ignores_checkpoints_and_crc(tmp_path):
    root = _mk_table(tmp_path, {0: [_add("a.parquet")]})
    log = os.path.join(root, "_delta_log")
    open(os.path.join(log, f"{0:020d}.checkpoint.parquet"), "w").close()
    open(os.path.join(log, f"{0:020d}.crc"), "w").close()
    open(os.path.join(log, "_last_checkpoint"), "w").close()
    assert DL.list_commit_versions(root) == [0]


def test_unknown_version_raises(tmp_path):
    root = _mk_table(tmp_path, {0: [_add("a.parquet")]})
    with pytest.raises(ValueError):
        DL.delta_snapshot_files(root, 7)


def test_empty_log_raises(tmp_path):
    root = str(tmp_path / "tbl2")
    os.makedirs(os.path.join(root, "_delta_log"))
    with pytest.raises(FileNotFoundError):
        DL.delta_snapshot_files(root)


def test_checkpoint_resolution_matches_full_replay(tmp_path):
    import pyarrow  # noqa: F401  (checkpoint codec dependency)

    root = _mk_table(
        tmp_path,
        {
            0: [_add("a.parquet"), _add("b.parquet")],
            1: [_rm("a.parquet"), _add("c.parquet")],
            2: [_rm("b.parquet"), _add("d.parquet")],
        },
    )
    DL.write_checkpoint(root, 1)
    files, cp_v, replayed = DL.delta_snapshot_files_checkpointed(root)
    assert cp_v == 1 and replayed == 1
    assert files == DL.delta_snapshot_files(root)
    assert [os.path.basename(f) for f in files] == ["c.parquet", "d.parquet"]
    # a version BEFORE the checkpoint falls back to pure JSON replay
    files0, cp_v0, replayed0 = DL.delta_snapshot_files_checkpointed(root, 0)
    assert cp_v0 == -1 and replayed0 == 1
    assert [os.path.basename(f) for f in files0] == ["a.parquet", "b.parquet"]


def test_checkpoint_exactly_at_requested_version(tmp_path):
    root = _mk_table(tmp_path, {0: [_add("a.parquet")], 1: [_rm("a.parquet")]})
    DL.write_checkpoint(root, 1)
    files, cp_v, replayed = DL.delta_snapshot_files_checkpointed(root, 1)
    assert cp_v == 1 and replayed == 0 and files == []


def test_export_merge_update_all_semantics(tmp_path, spark):
    root = str(tmp_path / "exp")
    b1 = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 1)], "k long, v string, rev int"
    )
    b2 = spark.createDataFrame(
        [(2, "y2", 2), (3, "z", 2)], "k long, v string, rev int"
    )
    v0 = DL.export_merge_to_delta(spark, root, b1, key="k")
    v1 = DL.export_merge_to_delta(spark, root, b2, key="k")
    assert (v0, v1) == (0, 1)
    rows = {r.k: (r.v, r.rev) for r in DL.read_delta(spark, root).collect()}
    assert rows == {1: ("x", 1), 2: ("y2", 2), 3: ("z", 2)}
    # the superseded v0 file is logically removed but still time-travels
    rows0 = {r.k: r.v for r in DL.read_delta(spark, root, 0).collect()}
    assert rows0 == {1: "x", 2: "y"}
    # exactly one live file after the rewrite commit
    assert len(DL.delta_snapshot_files(root)) == 1
