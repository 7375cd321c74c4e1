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


# ---------------------------------------------------------------------------
# deletion vectors + protocol gate
# ---------------------------------------------------------------------------


def test_z85_roundtrip():
    for raw in (b"\x00" * 4, b"\xff" * 16, bytes(range(32))):
        assert DL._z85_decode(DL._z85_encode(raw)) == raw


def test_roaring_roundtrip_array_bitmap_and_high_bits():
    idx = (
        list(range(100))                      # array container
        + list(range(70000, 75000))           # dense -> bitmap container
        + [1 << 33, (1 << 33) + 7]            # second 32-bit bitmap
    )
    assert DL._roaring_array_deserialize(
        DL._roaring_array_serialize(idx)
    ) == sorted(idx)


def test_roaring_run_container_decode():
    # hand-build a run-cookie bitmap: one container, runs [5..9],[20..20]
    body = bytearray()
    body += ((1 - 1) << 16 | DL._SERIAL_COOKIE).to_bytes(4, "little")
    body += b"\x01"  # run bitset: container 0 is a run container
    body += (0).to_bytes(2, "little")  # key
    body += (6 - 1).to_bytes(2, "little")  # cardinality-1
    # < 4 containers with run cookie -> no offset header
    body += (2).to_bytes(2, "little")  # n_runs
    body += (5).to_bytes(2, "little") + (4).to_bytes(2, "little")
    body += (20).to_bytes(2, "little") + (0).to_bytes(2, "little")
    vals, pos = DL._roaring32_deserialize(bytes(body), 0)
    assert vals == [5, 6, 7, 8, 9, 20] and pos == len(body)


def test_protocol_gate_unknown_reader_feature(tmp_path):
    # v2Checkpoint and typeWidening became SUPPORTED reader features in
    # round 7 — use a feature this reader genuinely does not implement
    root = _mk_table(
        tmp_path,
        {0: [{"protocol": {"minReaderVersion": 3,
                           "readerFeatures": ["variantType"]}},
             _add("a.parquet")]},
    )
    with pytest.raises(ValueError, match="variantType"):
        DL.delta_snapshot_files(root)
    # supported v3 features pass the gate
    root2 = _mk_table(
        tmp_path / "ok",
        {0: [{"protocol": {"minReaderVersion": 3,
                           "readerFeatures": ["v2Checkpoint",
                                              "deletionVectors"]}},
             _add("a.parquet")]},
    )
    assert len(DL.delta_snapshot_files(root2)) == 1


def test_protocol_gate_column_mapping(tmp_path):
    # an UNKNOWN mapping mode still raises; 'name'/'id' are supported
    root = _mk_table(
        tmp_path,
        {0: [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
             {"metaData": {"id": "x", "schemaString": "{}",
                           "configuration":
                               {"delta.columnMapping.mode": "weird"}}},
             _add("a.parquet")]},
    )
    with pytest.raises(ValueError, match="columnMapping"):
        DL.delta_snapshot_files(root)
    # reader version 2 with mapping off is fine
    root2 = _mk_table(
        tmp_path / "ok",
        {0: [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
             _add("a.parquet")]},
    )
    assert len(DL.delta_snapshot_files(root2)) == 1


def test_snapshot_files_refuses_dv_table(tmp_path):
    a = _add("a.parquet")
    a["add"]["deletionVector"] = {
        "storageType": "i", "pathOrInlineDv": "x", "offset": 0,
        "sizeInBytes": 1, "cardinality": 1,
    }
    root = _mk_table(tmp_path, {0: [a]})
    with pytest.raises(ValueError, match="deletion vectors"):
        DL.delta_snapshot_files(root)


def test_dv_delete_end_to_end(tmp_path, spark):
    root = str(tmp_path / "dv")
    from pyspark.sql import functions as F

    b = spark.createDataFrame(
        [(i, chr(97 + i % 26)) for i in range(20)], "k long, v string"
    )
    DL.export_merge_to_delta(spark, root, b, key="k")
    v1, n1 = DL.delete_where_with_dv(spark, root, F.col("k") % 4 == 0)
    assert n1 == 5
    rows = {r.k for r in DL.read_delta(spark, root).collect()}
    assert rows == {k for k in range(20) if k % 4 != 0}
    # chained second DV delete merges bitmaps and counts live-only
    v2, n2 = DL.delete_where_with_dv(spark, root, F.col("k") % 2 == 0)
    assert n2 == 5  # evens minus the multiples of 4 already gone
    rows = {r.k for r in DL.read_delta(spark, root).collect()}
    assert rows == {k for k in range(20) if k % 2 == 1}
    # time travel: pre-delete snapshot complete, mid-chain correct
    assert len(DL.read_delta(spark, root, v1 - 1).collect()) == 20
    assert {r.k for r in DL.read_delta(spark, root, v1).collect()} == {
        k for k in range(20) if k % 4 != 0
    }
    # MERGE after DV deletes must not resurrect deleted rows
    up = spark.createDataFrame([(1, "Z"), (2, "NEW")], "k long, v string")
    DL.export_merge_to_delta(spark, root, up, key="k")
    rows = {r.k: r.v for r in DL.read_delta(spark, root).collect()}
    assert 4 not in rows and rows[1] == "Z" and rows[2] == "NEW"
    assert set(rows) == {k for k in range(20) if k % 2 == 1} | {2}


def test_dv_inline_descriptor(tmp_path, spark):
    root = str(tmp_path / "inline")
    b = spark.createDataFrame([(i,) for i in range(8)], "k long")
    DL.export_merge_to_delta(spark, root, b, key="k")
    adds, _, _ = DL._replay(root)
    (path,) = adds
    data = DL._roaring_array_serialize([0, 3])
    pad = (-len(data)) % 4
    enc = DL._z85_encode(data + b"\x00" * pad)
    a = dict(adds[path])
    a["deletionVector"] = {
        "storageType": "i", "pathOrInlineDv": enc,
        "sizeInBytes": len(data), "cardinality": 2,
    }
    DL._commit(root, 1, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"remove": {"path": path, "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": a},
    ])
    ks = sorted(r.k for r in DL.read_delta(spark, root).collect())
    assert len(ks) == 6  # rows at file positions 0 and 3 dropped


def test_checkpoint_carries_protocol_and_metadata(tmp_path, spark):
    import pyarrow.parquet as pq

    root = str(tmp_path / "cp")
    b = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    DL.export_merge_to_delta(spark, root, b, key="k")
    cp = DL.write_checkpoint(root, 0)
    t = pq.read_table(cp).to_pylist()
    protos = [r["protocol"] for r in t if r["protocol"] is not None]
    metas = [r["metaData"] for r in t if r["metaData"] is not None]
    assert protos == [{"minReaderVersion": 1, "minWriterVersion": 2,
                       "readerFeatures": None, "writerFeatures": None}]
    assert len(metas) == 1
    schema = json.loads(metas[0]["schemaString"])
    assert [f["name"] for f in schema["fields"]] == ["k", "v"]
    # checkpointed resolution still matches full replay
    files, cpv, replayed = DL.delta_snapshot_files_checkpointed(root)
    assert cpv == 0 and files == DL.delta_snapshot_files(root)


def test_export_writes_real_schema_string(tmp_path, spark):
    root = str(tmp_path / "schema")
    b = spark.createDataFrame([(1, 2.5)], "k long, x double")
    DL.export_merge_to_delta(spark, root, b, key="k")
    _, _, meta = DL._replay(root)
    fields = json.loads(meta["schemaString"])["fields"]
    assert [(f["name"], f["type"]) for f in fields] == [
        ("k", "long"), ("x", "double")
    ]


def test_column_mapping_name_mode(tmp_path, spark):
    root = str(tmp_path / "cm")
    docs = spark.createDataFrame(
        [(1, "en", 100), (2, "fr", 200)],
        "doc_id long, lang string, n_chars long",
    )
    DL.write_delta_column_mapping_fixture(spark, docs, root)
    # current version: the metaData-only rename commit applies
    cur = DL.read_delta(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count"]
    assert {r.doc_id: r.char_count for r in cur.collect()} == {1: 100, 2: 200}
    # time travel to v0 reads under the OLD logical name
    v0 = DL.read_delta(spark, root, 0)
    assert v0.columns == ["doc_id", "lang", "n_chars"]
    # physical layer never leaks
    assert "col-1" not in cur.columns


def test_column_mapping_id_mode_prefers_footer_ids(tmp_path, spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "cmid")
    docs = spark.createDataFrame(
        [(1, "en", 100)], "doc_id long, lang string, n_chars long"
    )
    DL.write_delta_column_mapping_fixture(spark, docs, root, mode="id")
    # rewrite the data file with pyarrow footers whose PHYSICAL NAMES
    # are wrong but field ids correct — id resolution must win
    def _f(name, typ, fid):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    t = pa.table(
        {"x1": [7], "x2": ["de"], "x3": [999]},
        schema=pa.schema(
            [_f("x1", pa.int64(), 1), _f("x2", pa.string(), 2),
             _f("x3", pa.int64(), 3)]
        ),
    )
    pq.write_table(t, os.path.join(root, "file-0.parquet"))
    cur = DL.read_delta(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count"]
    assert cur.collect()[0].asDict() == {
        "doc_id": 7, "lang": "de", "char_count": 999
    }


def test_column_mapping_added_column_reads_null(tmp_path, spark):
    root = str(tmp_path / "cmadd")
    docs = spark.createDataFrame(
        [(1, "en", 100)], "doc_id long, lang string, n_chars long"
    )
    DL.write_delta_column_mapping_fixture(spark, docs, root)
    # a v2 metaData commit ADDS a logical column no file carries
    adds, proto, meta = DL._replay(root)
    schema = json.loads(meta["schemaString"])
    schema["fields"].append(
        {"name": "quality", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.id": 4,
                      "delta.columnMapping.physicalName": "col-4"}}
    )
    meta2 = dict(meta)
    meta2["schemaString"] = json.dumps(schema)
    DL._commit(root, 2, [{"metaData": meta2}])
    cur = DL.read_delta(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count", "quality"]
    row = cur.collect()[0]
    assert row.quality is None
    assert dict(cur.dtypes)["quality"] == "double"


def test_checkpoint_carries_deletion_vectors(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "cpdv")
    b = spark.createDataFrame([(i,) for i in range(10)], "k long")
    DL.export_merge_to_delta(spark, root, b, key="k")
    v_dv, n = DL.delete_where_with_dv(spark, root, F.col("k") % 3 == 0)
    assert n == 4
    DL.write_checkpoint(root, v_dv)
    # one tail commit after the checkpoint
    up = spark.createDataFrame([(100,)], "k long")
    DL.append_batch_to_delta(spark, root, up, app_id="t", batch_id=0)
    # checkpointed read applies the DV from the checkpoint's add row
    got = {r.k for r in DL.read_delta_checkpointed(spark, root).collect()}
    want = {k for k in range(10) if k % 3 != 0} | {100}
    assert got == want
    # matches the full-replay read exactly
    full = {r.k for r in DL.read_delta(spark, root).collect()}
    assert got == full
    # the bare file-list path refuses DV snapshots
    with pytest.raises(ValueError, match="deletion vectors"):
        DL.delta_snapshot_files_checkpointed(root)


def test_checkpoint_carries_column_mapping_metadata(tmp_path, spark):
    root = str(tmp_path / "cpcm")
    docs = spark.createDataFrame(
        [(1, "en", 100), (2, "fr", 200)],
        "doc_id long, lang string, n_chars long",
    )
    DL.write_delta_column_mapping_fixture(spark, docs, root)
    DL.write_checkpoint(root, 1)
    cur = DL.read_delta_checkpointed(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count"]
    assert {r.doc_id: r.char_count for r in cur.collect()} == {
        1: 100, 2: 200
    }


def test_vacuum_deletes_unreferenced_files_only(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "vac")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b2 = spark.createDataFrame([(2, "b2")], "k long, v string")
    DL.export_merge_to_delta(spark, root, b1, key="k")
    DL.export_merge_to_delta(spark, root, b2, key="k")  # rewrite commit
    # v0's file is logically removed but physically present
    assert os.path.exists(os.path.join(root, "part-00000.parquet"))
    deleted = DL.vacuum_delta(root, retain_last=1)
    # v0's data file goes; v1's change-data file is retained with v1
    assert deleted == ["part-00000.parquet"]
    assert os.path.exists(
        os.path.join(root, "_change_data", "cdc-00001.parquet")
    )
    # current read unaffected; time travel beyond retention now breaks
    rows = {r.k: r.v for r in DL.read_delta(spark, root).collect()}
    assert rows == {1: "a", 2: "b2"}
    with pytest.raises(Exception):
        DL.read_delta(spark, root, 0).collect()


def test_vacuum_keeps_live_dv_sidecars(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "vacdv")
    b = spark.createDataFrame([(i,) for i in range(6)], "k long")
    DL.export_merge_to_delta(spark, root, b, key="k")
    DL.delete_where_with_dv(spark, root, F.col("k") % 2 == 0)
    deleted = DL.vacuum_delta(root, retain_last=1)
    assert deleted == []  # data file re-added with DV; sidecar live
    assert {r.k for r in DL.read_delta(spark, root).collect()} == {1, 3, 5}
    # a rewrite commit orphans both the old file and its DV sidecar
    DL.export_merge_to_delta(
        spark, root, spark.createDataFrame([(9,)], "k long"), key="k"
    )
    deleted = DL.vacuum_delta(root, retain_last=1)
    assert any(d.endswith(".bin") for d in deleted)
    assert any(d.endswith(".parquet") for d in deleted)
    assert {r.k for r in DL.read_delta(spark, root).collect()} == {1, 3, 5, 9}


def test_change_data_feed_merge_and_append(tmp_path, spark):
    root = str(tmp_path / "cdf")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    b2 = spark.createDataFrame(
        [(2, "b2"), (3, "c")], "k long, v string"
    )
    DL.export_merge_to_delta(spark, root, b1, key="k")
    DL.export_merge_to_delta(spark, root, b2, key="k")
    ch = DL.read_delta_changes(spark, root, 0, 1)
    got = {
        (r.k, r._change_type, r._commit_version) for r in ch.collect()
    }
    assert got == {
        (1, "insert", 0), (2, "insert", 0),          # v0 initial load
        (2, "update_preimage", 1), (2, "update_postimage", 1),
        (3, "insert", 1),
    }
    # preimage carries the OLD value, postimage the new
    vals = {(r._change_type, r.v) for r in ch.filter("k = 2").collect()}
    assert vals == {("insert", "b"), ("update_preimage", "b"),
                    ("update_postimage", "b2")}
    # range restriction: only v1's changes
    ch1 = DL.read_delta_changes(spark, root, 1)
    assert {r._change_type for r in ch1.collect()} == {
        "update_preimage", "update_postimage", "insert"
    }


def test_compact_delta_preserves_rows_and_folds_dvs(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "opt")
    for i in range(4):  # 4 small append commits
        DL.append_batch_to_delta(
            spark, root,
            spark.createDataFrame([(i * 10 + j,) for j in range(5)],
                                  "k long"),
            app_id="load", batch_id=i,
        )
    DL.delete_where_with_dv(spark, root, F.col("k") % 10 == 0)
    before = {r.k for r in DL.read_delta(spark, root).collect()}
    v, n_before, n_after = DL.compact_delta(spark, root)
    assert (n_before, n_after) == (4, 1)
    after = {r.k for r in DL.read_delta(spark, root).collect()}
    assert after == before  # rows identical, deletions folded in
    # compaction is dataChange=false: the CDF reader must skip it
    with pytest.raises(ValueError):
        DL.read_delta_changes(spark, root, v, v)
    # post-compaction snapshot has no DVs left -> plain file list works
    files = DL.delta_snapshot_files(root)
    assert len(files) == 1
    # vacuum now reclaims the 4 small files + the DV sidecar
    deleted = DL.vacuum_delta(root, retain_last=1)
    assert len([d for d in deleted if d.endswith(".parquet")]) == 4
    assert {r.k for r in DL.read_delta(spark, root).collect()} == before


def test_restore_rolls_back_as_new_commit(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "restore")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b2 = spark.createDataFrame([(2, "BAD")], "k long, v string")
    DL.export_merge_to_delta(spark, root, b1, key="k")
    DL.export_merge_to_delta(spark, root, b2, key="k")
    v = DL.restore_delta(spark, root, 0)
    assert v == 2  # history stays linear
    rows = {r.k: r.v for r in DL.read_delta(spark, root).collect()}
    assert rows == {1: "a", 2: "b"}
    # the bad version remains auditable via time travel
    assert {r.v for r in DL.read_delta(spark, root, 1).collect()} == {
        "a", "BAD"
    }
    # restore survives DV state: delete, restore past it, rows return
    DL.delete_where_with_dv(spark, root, F.col("k") == 1)
    assert {r.k for r in DL.read_delta(spark, root).collect()} == {2}
    DL.restore_delta(spark, root, v)
    assert {r.k for r in DL.read_delta(spark, root).collect()} == {1, 2}


def test_stats_based_file_skipping(tmp_path, spark):
    root = str(tmp_path / "skip")
    # 4 range-clustered batches: k in [0,10), [10,20), [20,30), [30,40)
    for i in range(4):
        DL.append_batch_to_delta(
            spark, root,
            spark.createDataFrame(
                [(i * 10 + j, f"v{j}") for j in range(10)],
                "k long, v string",
            ),
            app_id="skip", batch_id=i,
        )
    files, n_total = DL.delta_snapshot_files_pruned(root, {"k": (25, None)})
    assert n_total == 4 and len(files) == 2  # batches 2 and 3 survive
    rows = spark.read.parquet(*files).filter("k >= 25").count()
    assert rows == 15
    # upper-bounded range keeps only the first file
    files_lo, _ = DL.delta_snapshot_files_pruned(root, {"k": (None, 5)})
    assert len(files_lo) == 1
    # a column with no stats never prunes
    files_ns, _ = DL.delta_snapshot_files_pruned(root, {"nope": (0, 1)})
    assert len(files_ns) == 4
    # stats JSON carries numRecords + both bounds
    adds, _, _ = DL._replay(root)
    s = json.loads(list(adds.values())[0]["stats"])
    assert s["numRecords"] == 10 and "k" in s["minValues"]


def test_compact_delta_column_mapped_table(tmp_path, spark):
    """OPTIMIZE on a column-mapped table must write the compacted file
    under the schemaString's PHYSICAL names (col-N) — a logical-name
    rewrite would make the next read's physical->logical projection
    come up empty and return all-NULL rows."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "cm_opt")
    docs = spark.createDataFrame(
        [(1, "en", 100), (2, "fr", 200)],
        "doc_id long, lang string, n_chars long",
    )
    DL.write_delta_column_mapping_fixture(spark, docs, root)
    before = {r.doc_id: r.char_count for r in DL.read_delta(spark, root).collect()}
    conf_before = spark.conf.get("spark.sql.parquet.fieldId.write.enabled", None)
    v, n_before, n_after = DL.compact_delta(spark, root)
    assert (n_before, n_after) == (1, 1)
    cur = DL.read_delta(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count"]
    after = {r.doc_id: r.char_count for r in cur.collect()}
    assert after == before  # values survive, no all-NULL rows
    # the compacted file's footer carries the physical names + field ids
    files = DL.delta_snapshot_files(root)
    sch = pq.read_schema(files[0])
    assert sch.names == ["col-1", "col-2", "col-3"]
    fid = (sch.field(0).metadata or {}).get(b"PARQUET:field_id")
    assert fid == b"1"
    # the session conf side effect is restored to its prior value
    assert spark.conf.get(
        "spark.sql.parquet.fieldId.write.enabled", None
    ) == conf_before


def test_multipart_checkpoint_roundtrip(tmp_path):
    """parts>1 writes N spec-named part files; resolution unions them
    and matches full JSON replay exactly."""
    import glob

    root = _mk_table(
        tmp_path,
        {
            0: [_add(f"f{i}.parquet") for i in range(5)],
            1: [_rm("f0.parquet"), _add("g.parquet")],
            2: [_add("h.parquet")],
        },
    )
    DL.write_checkpoint(root, 1, parts=3)
    names = sorted(
        os.path.basename(p)
        for p in glob.glob(
            os.path.join(root, "_delta_log", "*.checkpoint.*.parquet")
        )
    )
    assert names == [
        f"{1:020d}.checkpoint.{i + 1:010d}.{3:010d}.parquet"
        for i in range(3)
    ]
    assert DL._last_checkpoint(root)["parts"] == 3
    files, cp_v, replayed = DL.delta_snapshot_files_checkpointed(root)
    assert cp_v == 1 and replayed == 1
    assert files == DL.delta_snapshot_files(root)
    # a missing part file is a hard, named error — never a silent subset
    os.remove(
        os.path.join(
            root,
            "_delta_log",
            f"{1:020d}.checkpoint.{2:010d}.{3:010d}.parquet",
        )
    )
    with pytest.raises(FileNotFoundError, match="multi-part"):
        DL.delta_snapshot_files_checkpointed(root)


def test_v2_checkpoint_roundtrip(tmp_path):
    """The v2Checkpoint layout (UUID-named manifest + sidecar files in
    _delta_log/_sidecars) writes and resolves: sidecar adds splice into
    the state, the manifest's checkpointMetadata version is validated,
    and a missing sidecar is a hard named error."""
    root = _mk_table(
        tmp_path,
        {
            0: [_add(f"f{i}.parquet") for i in range(5)],
            1: [_rm("f0.parquet"), _add("g.parquet")],
            2: [_add("h.parquet")],
        },
    )
    cp = DL.write_checkpoint_v2(root, 1, sidecars=2)
    assert os.path.basename(cp).startswith(f"{1:020d}.checkpoint.")
    side = os.path.join(root, "_delta_log", "_sidecars")
    assert len(os.listdir(side)) == 2
    files, cp_v, replayed = DL.delta_snapshot_files_checkpointed(root)
    assert cp_v == 1 and replayed == 1
    assert files == DL.delta_snapshot_files(root)
    # protocol/metaData reconstruct from the manifest
    adds, protocol, metadata, _, _ = DL._replay_from_checkpoint(root, 1)
    assert sorted(adds) == [f"f{i}.parquet" for i in range(1, 5)] + [
        "g.parquet"
    ]
    # a missing sidecar is a hard error, never a silent subset
    victims = sorted(os.listdir(side))
    os.remove(os.path.join(side, victims[0]))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        DL.delta_snapshot_files_checkpointed(root)


def test_v2_checkpoint_version_mismatch_raises(tmp_path):
    root = _mk_table(tmp_path, {0: [_add("a.parquet")],
                                1: [_add("b.parquet")]})
    DL.write_checkpoint_v2(root, 1, sidecars=1)
    # corrupt the pointer to disagree with the manifest's own version
    with open(
        os.path.join(root, "_delta_log", "_last_checkpoint"), "w"
    ) as fh:
        json.dump({"version": 0, "size": 4}, fh)
    os.rename(
        [
            os.path.join(root, "_delta_log", n)
            for n in os.listdir(os.path.join(root, "_delta_log"))
            if ".checkpoint." in n and n.endswith(".parquet")
        ][0],
        os.path.join(
            root, "_delta_log",
            f"{0:020d}.checkpoint.00000000-0000-0000-0000-000000000000.parquet",
        ),
    )
    with pytest.raises(ValueError, match="version"):
        DL.delta_snapshot_files_checkpointed(root, 1)


def test_checkpoint_carries_full_add_actions_and_features(tmp_path):
    """The checkpoint must round-trip partitionValues/size/stats and the
    protocol's feature lists — data skipping and reader gating both have
    to survive checkpoint-seeded replay."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "_delta_log"), exist_ok=True)
    stats = json.dumps(
        {"numRecords": 7, "minValues": {"k": 1}, "maxValues": {"k": 9}}
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": "t",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct",
                     "fields": [{"name": "k", "type": "long",
                                 "nullable": True, "metadata": {}}]}
                ),
                "partitionColumns": ["p"],
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "p=1/a.parquet",
                "partitionValues": {"p": "1"},
                "size": 1234,
                "modificationTime": 1700000000000,
                "dataChange": True,
                "stats": stats,
            }
        },
    ]
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    cp = DL.write_checkpoint(root, 0)
    # raw checkpoint rows carry the spec-required fields
    rows = pq.read_table(cp).to_pylist()
    add_rows = [r["add"] for r in rows if r.get("add")]
    assert add_rows[0]["size"] == 1234
    assert dict(add_rows[0]["partitionValues"]) == {"p": "1"}
    assert json.loads(add_rows[0]["stats"])["numRecords"] == 7
    proto_rows = [r["protocol"] for r in rows if r.get("protocol")]
    assert proto_rows[0]["readerFeatures"] == ["deletionVectors"]
    assert proto_rows[0]["writerFeatures"] == ["deletionVectors"]
    # checkpoint-seeded replay reconstructs the same action state
    adds, protocol, metadata, cp_v, replayed = DL._replay_from_checkpoint(root)
    assert cp_v == 0 and replayed == 0
    a = adds["p=1/a.parquet"]
    assert a["partitionValues"] == {"p": "1"}
    assert a["size"] == 1234
    assert json.loads(a["stats"])["maxValues"]["k"] == 9
    assert protocol["readerFeatures"] == ["deletionVectors"]


def test_version_checksum_roundtrip_and_tamper(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "crc")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    DL.export_merge_to_delta(spark, root, b1, key="k")
    DL.delete_where_with_dv(spark, root, F.col("k") == 1)
    p = DL.write_version_checksum(root)
    assert os.path.basename(p) == f"{1:020d}.crc"
    state = DL.validate_version_checksum(root)
    assert state["numFiles"] == 1 and state["numDeletedRecordsOpt"] == 1
    assert state["tableSizeBytes"] > 0
    # tampering with the recorded state is detected field-by-name
    with open(p) as fh:
        rec = json.load(fh)
    rec["numFiles"] = 99
    with open(p, "w") as fh:
        json.dump(rec, fh)
    with pytest.raises(ValueError, match="numFiles"):
        DL.validate_version_checksum(root)
    # missing checksum is a named FileNotFoundError
    with pytest.raises(FileNotFoundError):
        DL.validate_version_checksum(root, 0)


def test_type_widening_read_and_dv_compose(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "fr" if i % 3 == 0 else "en", 100 + i, f"t{i}")
         for i in range(12)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "widen")
    DL.write_delta_type_widening_fixture(spark, docs, root)
    # latest snapshot: widened LONG column, values above int32 range
    cur = DL.read_delta(spark, root)
    assert dict(cur.dtypes)["score"] == "bigint"
    assert cur.filter(F.col("score") > 2_147_483_647).count() == 4
    assert cur.count() == 12
    # pre-widen snapshot: still the narrow INTEGER schema
    pre = DL.read_delta(spark, root, 0)
    assert dict(pre.dtypes)["score"] == "int"
    assert pre.count() == 8
    # merge-on-read DV delete composes with widening: the condition
    # filters on the widened logical type, and the protocol upgrade
    # must PRESERVE the typeWidening feature (protocol actions replace)
    v, n = DL.delete_where_with_dv(
        spark, root, F.col("score") > 2_147_483_647
    )
    assert n == 4
    after = DL.read_delta(spark, root)
    assert after.count() == 8
    assert dict(after.dtypes)["score"] == "bigint"
    _, protocol, _ = DL._replay(root)
    assert set(protocol["readerFeatures"]) == {
        "deletionVectors",
        "typeWidening",
    }


def test_type_widening_gate_accepts_feature(tmp_path):
    root = _mk_table(
        tmp_path,
        {0: [{"protocol": {"minReaderVersion": 3,
                           "readerFeatures": ["typeWidening"]}},
             _add("a.parquet")]},
    )
    assert len(DL.delta_snapshot_files(root)) == 1


def test_ict_monotonic_clamp_and_resolution(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "en", 500 + 100 * i, f"t{i}") for i in range(6)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "ict")
    t0, t1, t2 = DL.write_delta_ict_fixture(spark, docs, root)
    # inclusive boundary + mid-window + before-first error
    assert DL.version_as_of_timestamp(root, t0) == 0
    assert DL.version_as_of_timestamp(root, t1 - 1) == 0
    assert DL.version_as_of_timestamp(root, t1) == 1
    assert DL.version_as_of_timestamp(root, t2 + 10**9) == 2
    with pytest.raises(ValueError, match="precedes the first commit"):
        DL.version_as_of_timestamp(root, t0 - 1)
    # a wall clock at/behind the previous ICT is clamped to prev + 1
    ict = DL.commit_with_ict(root, 3, [], t1)
    assert ict == t2 + 1
    # a hand-corrupted non-monotonic log is detected by name
    DL._commit(root, 4, [{"commitInfo": {"inCommitTimestamp": t0}}])
    with pytest.raises(ValueError, match="non-monotonic"):
        DL.version_as_of_timestamp(root, t2)


def test_domain_metadata_and_row_tracked_append(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "en", 100 + i, f"t{i}") for i in range(10)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "rowtrack")
    DL.write_delta_row_tracking_fixture(spark, docs, root)
    # seed the high-water mark domain (fixture assigns ids 0..9)
    DL._commit(root, 2, [{
        "domainMetadata": {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": 9}),
            "removed": False,
        }
    }])
    assert json.loads(
        DL.replay_domain_metadata(root)["delta.rowTracking"]
    ) == {"rowIdHighWaterMark": 9}
    # append assigns baseRowId = hwm + 1 and advances the domain
    extra = spark.createDataFrame(
        [(100, "fr", 900), (101, "fr", 950)],
        "doc_id long, lang string, n_chars long",
    )
    v, base = DL.append_batch_with_row_tracking(spark, root, extra)
    assert base == 10
    ids = {
        r.doc_id: r._row_id
        for r in DL.read_delta_with_row_ids(spark, root).collect()
    }
    assert ids[100] == 10 and ids[101] == 11
    assert len(set(ids.values())) == 12  # all row ids distinct
    assert json.loads(
        DL.replay_domain_metadata(root)["delta.rowTracking"]
    ) == {"rowIdHighWaterMark": 11}
    # a second append continues from the advanced mark
    v2, base2 = DL.append_batch_with_row_tracking(
        spark,
        root,
        spark.createDataFrame([(200, "de", 10)],
                              "doc_id long, lang string, n_chars long"),
    )
    assert base2 == 12
    # a removed tombstone drops the domain
    DL._commit(root, v2 + 1, [{
        "domainMetadata": {"domain": "delta.rowTracking",
                           "configuration": "{}", "removed": True}
    }])
    assert "delta.rowTracking" not in DL.replay_domain_metadata(root)


def test_compact_zorder_stats_and_pruning(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(64)],
        "doc_id long, n_chars long",
    )
    root = str(tmp_path / "zorder")
    DL.export_merge_to_delta(spark, root, docs, key="doc_id")
    version, n_before, n_after = DL.compact_delta(
        spark, root, max_files=4, zorder_by=("doc_id", "n_chars")
    )
    assert n_after >= 2
    # every compacted add carries footer-derived stats
    adds, _, _ = DL._replay(root)
    for a in adds.values():
        s = json.loads(a["stats"])
        assert s["numRecords"] > 0
        assert "n_chars" in s["minValues"]
    # pruning drops at least one file for a tight range, keeps all rows
    kept, total = DL.delta_snapshot_files_pruned(
        root, {"n_chars": (450, None)}
    )
    assert len(kept) < total
    got = spark.read.parquet(*kept).filter("n_chars >= 450").count()
    want = docs.filter("n_chars >= 450").count()
    assert got == want
    # full read-back unchanged by the clustered rewrite
    assert DL.read_delta(spark, root).count() == 64
    # the clustering state is recorded for future OPTIMIZE runs
    assert json.loads(
        DL.replay_domain_metadata(root)["delta.clustering"]
    ) == {"clusteringColumns": ["doc_id", "n_chars"]}


def test_checkpoint_preserves_row_tracking(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "en", 100 + i, f"t{i}") for i in range(8)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "cp_rowtrack")
    DL.write_delta_row_tracking_fixture(spark, docs, root)
    DL.write_checkpoint(root, 1)
    adds, _, _, = DL._replay_from_checkpoint(root)[:3]
    bases = sorted(a["baseRowId"] for a in adds.values())
    assert bases == [0, 4]


def test_read_delta_partitioned_reconstitutes_column(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 100 + i, f"t{i}") for i in range(8)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "part")
    DL.write_delta_partitioned_fixture(spark, docs, root)
    df = DL.read_delta(spark, root)
    assert "lang" in df.columns
    assert df.count() == 8
    assert {r.lang for r in df.select("lang").distinct().collect()} == {
        "en", "fr",
    }
    # pruned read: only the fr file opens
    pruned, n_scanned, n_total = DL.read_delta_partition_pruned(
        spark, root, {"lang": {"fr"}}
    )
    assert (n_scanned, n_total) == (1, 2)
    assert pruned.count() == 4


def test_partition_pruning_keeps_files_without_recorded_value(
    spark, tmp_path
):
    """Conservative pruning: an add action whose partitionValues carry
    NO entry for the filtered column must be KEPT (never judged), while
    a recorded non-matching value still prunes."""
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 100 + i, f"t{i}") for i in range(8)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "part_cons")
    DL.write_delta_partitioned_fixture(spark, docs, root)
    # strip the recorded lang from one add action (simulates a writer
    # that omitted partitionValues for the column)
    import glob as _glob
    import json as _json

    logp = sorted(_glob.glob(os.path.join(root, "_delta_log", "*.json")))[0]
    lines = []
    stripped = 0
    for ln in open(logp, encoding="utf-8"):
        act = _json.loads(ln)
        if "add" in act and not stripped:
            act["add"]["partitionValues"] = {}
            stripped = 1
        lines.append(_json.dumps(act))
    open(logp, "w", encoding="utf-8").write("\n".join(lines) + "\n")
    _, n_scanned, n_total = DL.read_delta_partition_pruned(
        spark, root, {"lang": {"fr"}}
    )
    # the value-stripped file is kept (can't judge) alongside the fr
    # file — whichever file lost its value, both now scan
    assert (n_scanned, n_total) == (2, 2)


def test_commit_exclusive_create_and_rebase(tmp_path):
    root = _mk_table(tmp_path, {0: [_add("a.parquet")]})
    # overwriting an existing version is refused — the optimistic-
    # concurrency loser must never clobber the winner's commit
    with pytest.raises(FileExistsError):
        DL._commit(root, 0, [_add("b.parquet")])
    # a blind append rebases onto the tip it finds
    v = DL.commit_append_with_rebase(root, [_add("b.parquet")])
    assert v == 1
    # simulate losing the race: someone lands version 2 first
    DL._commit(root, 2, [_add("c.parquet")])
    v2 = DL.commit_append_with_rebase(root, [_add("d.parquet")])
    assert v2 == 3
    assert len(DL.delta_snapshot_files(root)) == 4
    # non-append actions are refused by name
    with pytest.raises(ValueError, match="conflict resolution"):
        DL.commit_append_with_rebase(root, [_rm("a.parquet")])


def test_widening_with_column_mapping_gated(tmp_path):
    schema = json.dumps({
        "type": "struct",
        "fields": [{
            "name": "v", "type": "long", "nullable": True,
            "metadata": {
                "delta.typeChanges": [
                    {"fromType": "integer", "toType": "long",
                     "tableVersion": 1}
                ],
                "delta.columnMapping.physicalName": "col-0",
                "delta.columnMapping.id": 0,
            },
        }],
    })
    root = _mk_table(tmp_path, {0: [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening",
                                         "columnMapping"]}},
        {"metaData": {"id": "x",
                      "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {
                          "delta.columnMapping.mode": "name"}}},
        _add("a.parquet"),
    ]})
    import pytest as _pytest

    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _grouped_scan,
        _replay,
    )
    adds, _, metadata = _replay(root)
    with _pytest.raises(ValueError, match="columnMapping"):
        _grouped_scan(None, root, ["a.parquet"], metadata, False)


def test_shallow_clone_isolated_evolution(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "en", 500 + i, f"t{i}") for i in range(10)],
        "doc_id long, lang string, n_chars long, text string",
    )
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    DL.write_delta_fixture(spark, docs, src)
    n = DL.clone_delta_shallow(src, dst)
    assert n == len(DL.delta_snapshot_files(src))
    # mutate the clone; the source must not move
    DL.delete_where_with_dv(spark, dst, F.col("doc_id") < 5)
    assert DL.read_delta(spark, src).count() == 10
    assert DL.read_delta(spark, dst).count() == 5
    # cloning onto an existing log is refused
    with pytest.raises(ValueError, match="already exists"):
        DL.clone_delta_shallow(src, dst)


def test_generated_partition_filter_derivation(tmp_path):
    import datetime as dt

    meta = {
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [
                {"name": "ts", "type": "timestamp", "nullable": True,
                 "metadata": {}},
                {"name": "day", "type": "date", "nullable": True,
                 "metadata": {
                     "delta.generationExpression": "CAST(ts AS DATE)"}},
            ],
        }),
        "partitionColumns": ["day"],
    }
    f = DL.partition_filter_from_generated(
        meta, "ts", dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 13)
    )
    assert f == {"day": {"2024-01-10", "2024-01-11", "2024-01-12"}}
    # a non-midnight upper bound includes its own day
    f2 = DL.partition_filter_from_generated(
        meta, "ts", dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 12, 5)
    )
    assert f2["day"] == {"2024-01-10", "2024-01-11", "2024-01-12"}
    # an expression the deriver does not understand raises by name
    meta2 = json.loads(json.dumps(meta))
    sch = json.loads(meta2["schemaString"])
    sch["fields"][1]["metadata"]["delta.generationExpression"] = (
        "date_trunc('week', ts)"
    )
    meta2["schemaString"] = json.dumps(sch)
    with pytest.raises(ValueError, match="generationExpression"):
        DL.partition_filter_from_generated(
            meta2, "ts", dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 13)
        )


def test_append_only_and_column_defaults(spark, tmp_path):
    from pyspark.sql import functions as F

    root = str(tmp_path / "ao")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    DL.append_batch_to_delta(spark, root, b, app_id="ao", batch_id=0)
    # flip appendOnly on and add a default column via metaData update
    _, proto, meta = DL._replay(root)
    new_meta = dict(meta)
    new_meta["configuration"] = {"delta.appendOnly": "true"}
    sch = json.loads(meta["schemaString"])
    sch["fields"].append({
        "name": "tier", "type": "string", "nullable": True,
        "metadata": {"CURRENT_DEFAULT": "'standard'"},
    })
    new_meta["schemaString"] = json.dumps(sch)
    DL._commit(root, 1, [{"metaData": new_meta}])
    # a batch missing the defaulted column gets it filled
    DL.append_batch_to_delta(
        spark, root,
        spark.createDataFrame([(3, "z")], "k long, v string"),
        app_id="ao", batch_id=1,
    )
    got = {r.k: r.tier for r in DL.read_delta(spark, root).collect()}
    assert got[3] == "standard" and got[1] is None
    # remove-producing commands are refused on the appendOnly table
    with pytest.raises(ValueError, match="appendOnly"):
        DL.delete_where_with_dv(spark, root, F.col("k") == 1)
    with pytest.raises(ValueError, match="appendOnly"):
        DL.compact_delta(spark, root)
    with pytest.raises(ValueError, match="appendOnly"):
        DL.restore_delta(spark, root, 0)


def test_liquid_clustering_refused_by_name(tmp_path):
    """A foreign liquid-clustered table (clusteredTable writer feature
    or clusteringProvider table property) raises BY NAME — this
    engine's maintenance paths are ZORDER-based, not clustering-aware."""
    proto = {
        "protocol": {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["clusteredTable"],
        }
    }
    meta = {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet"},
            "schemaString": json.dumps(
                {"type": "struct", "fields": []}
            ),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    root = _mk_table(tmp_path, {0: [proto, meta, _add("a.parquet")]})
    with pytest.raises(ValueError, match="clusteredTable"):
        DL.read_delta(spark=None, root=root)  # gate fires before any scan

    # property-only signal (no writer feature) is also refused
    meta2 = json.loads(json.dumps(meta))
    meta2["metaData"]["configuration"] = {"clusteringProvider": "liquid"}
    proto2 = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    root2 = str(tmp_path / "tbl2")
    os.makedirs(os.path.join(root2, "_delta_log"))
    with open(
        os.path.join(root2, "_delta_log", f"{0:020d}.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        for a in (proto2, meta2, _add("a.parquet")):
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="clusteringProvider"):
        DL.read_delta(spark=None, root=root2)


def test_liquid_clustering_refused_without_protocol_action(tmp_path):
    """The clustering gate fires even when the log carries NO protocol
    action (or the caller passes protocol=None): the configuration half
    of the signal needs only metadata, so the by-name refusal must not
    sit behind the protocol-None early exit."""
    meta = {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet"},
            "schemaString": json.dumps({"type": "struct", "fields": []}),
            "partitionColumns": [],
            "configuration": {"clusteringProvider": "liquid"},
        }
    }
    root = str(tmp_path / "tbl_noproto")
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        for a in (meta, _add("a.parquet")):
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="clusteringProvider"):
        DL.read_delta(spark=None, root=root)
    # direct call with protocol=None must also refuse
    with pytest.raises(ValueError, match="clusteringProvider"):
        DL._check_protocol(None, meta["metaData"])
