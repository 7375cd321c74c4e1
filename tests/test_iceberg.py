"""Unit tests for the clean-room Avro codec and Iceberg metadata
resolution (operators/avro_lite.py, operators/iceberg.py)."""

import json
import os

import pytest

from news_ingestion_data_pipeline_spark.operators import avro_lite as AV
from news_ingestion_data_pipeline_spark.operators import iceberg as IB


def test_avro_roundtrip_all_types(tmp_path):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "int"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
            {
                "name": "rec",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
        ],
    }
    recs = [
        {"s": "héllo", "n": -(1 << 40), "u": None, "arr": [1, -2, 3],
         "m": {"a": "b"}, "b": True, "d": 3.5, "rec": {"x": 7}},
        {"s": "", "n": 0, "u": 42, "arr": [], "m": {}, "b": False,
         "d": -1.25, "rec": {"x": -1}},
    ]
    p = str(tmp_path / "t.avro")
    AV.write_container(p, schema, recs)
    schema2, out = AV.read_container(p)
    assert out == recs
    assert schema2 == schema


def test_avro_zigzag_edge_values(tmp_path):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, -1, 1, 63, 64, -64, -65, (1 << 62), -(1 << 62)]
    p = str(tmp_path / "z.avro")
    AV.write_container(p, schema, [{"v": v} for v in vals])
    _, out = AV.read_container(p)
    assert [r["v"] for r in out] == vals


def test_avro_rejects_non_avro(tmp_path):
    p = str(tmp_path / "x.bin")
    open(p, "wb").write(b"PAR1not-avro")
    with pytest.raises(ValueError):
        AV.read_container(p)


def test_avro_empty_container(tmp_path):
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    p = str(tmp_path / "e.avro")
    AV.write_container(p, schema, [])
    _, out = AV.read_container(p)
    assert out == []


def _mk_iceberg(tmp_path, statuses_by_snapshot):
    """Tiny synthetic table: one manifest per snapshot, entries given as
    {snapshot_id: [(status, path), ...]}, current = max snapshot id."""
    root = str(tmp_path / "tbl")
    os.makedirs(os.path.join(root, "metadata"))
    snapshots = []
    for sid, entries in statuses_by_snapshot.items():
        mname = f"m{sid}.avro"
        AV.write_container(
            os.path.join(root, "metadata", mname),
            IB._MANIFEST_SCHEMA,
            [
                {
                    "status": st,
                    "snapshot_id": sid,
                    "data_file": {
                        "file_path": p,
                        "file_format": "PARQUET",
                        "partition": {"lang": None},
                        "record_count": 0,
                        "file_size_in_bytes": 0,
                    },
                }
                for st, p in entries
            ],
        )
        lname = f"snap-{sid}.avro"
        AV.write_container(
            os.path.join(root, "metadata", lname),
            IB._MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": f"metadata/{mname}",
                    "manifest_length": 1,
                    "partition_spec_id": 0,
                    "added_snapshot_id": sid,
                }
            ],
        )
        snapshots.append(
            {"snapshot-id": sid, "manifest-list": f"metadata/{lname}"}
        )
    meta = {
        "format-version": 2,
        "current-snapshot-id": max(statuses_by_snapshot),
        "snapshots": snapshots,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    return root


def test_iceberg_status_replay(tmp_path):
    root = _mk_iceberg(
        tmp_path,
        {
            1: [(1, "data/a.parquet"), (1, "data/b.parquet")],
            2: [(0, "data/a.parquet"), (2, "data/b.parquet")],
        },
    )
    files, n_total = IB.snapshot_files(root)
    assert [os.path.basename(f) for f in files] == ["a.parquet"]
    assert n_total == 1
    v1, _ = IB.snapshot_files(root, 1)
    assert [os.path.basename(f) for f in v1] == ["a.parquet", "b.parquet"]


def test_iceberg_unknown_snapshot_raises(tmp_path):
    root = _mk_iceberg(tmp_path, {1: [(1, "data/a.parquet")]})
    with pytest.raises(ValueError):
        IB.snapshot_files(root, 99)


def test_iceberg_picks_highest_metadata_version(tmp_path):
    root = _mk_iceberg(tmp_path, {1: [(1, "data/a.parquet")]})
    # a newer metadata version supersedes: point it at nothing live
    meta = {
        "format-version": 2,
        "current-snapshot-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "manifest-list": "metadata/snap-1.avro"}
        ],
    }
    with open(
        os.path.join(root, "metadata", "v10.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    assert IB.current_metadata(root)["current-snapshot-id"] == 1


def test_iceberg_partition_pruning(tmp_path):
    root = _mk_iceberg(tmp_path, {1: [(1, "data/a.parquet"),
                                      (1, "data/b.parquet")]})
    # tag partitions: rewrite the manifest with lang values
    AV.write_container(
        os.path.join(root, "metadata", "m1.avro"),
        IB._MANIFEST_SCHEMA,
        [
            {"status": 1, "snapshot_id": 1,
             "data_file": {"file_path": "data/a.parquet",
                           "file_format": "PARQUET",
                           "partition": {"lang": "en"},
                           "record_count": 0, "file_size_in_bytes": 0}},
            {"status": 1, "snapshot_id": 1,
             "data_file": {"file_path": "data/b.parquet",
                           "file_format": "PARQUET",
                           "partition": {"lang": "fr"},
                           "record_count": 0, "file_size_in_bytes": 0}},
        ],
    )
    files, n_total = IB.snapshot_files(
        root, partition_filter={"lang": {"en"}}
    )
    assert [os.path.basename(f) for f in files] == ["a.parquet"]
    assert n_total == 2  # pruning happened at metadata level


def test_export_merge_iceberg_roundtrip(tmp_path, spark):
    root = str(tmp_path / "exp")
    b1 = spark.createDataFrame(
        [(1, "x", 1), (2, "y", 1)], "k long, v string, rev int"
    )
    b2 = spark.createDataFrame(
        [(2, "y2", 2), (3, "z", 2)], "k long, v string, rev int"
    )
    s1 = IB.export_merge_to_iceberg(spark, root, b1, key="k")
    s2 = IB.export_merge_to_iceberg(spark, root, b2, key="k")
    assert s2 == s1 + 1
    rows = {r.k: (r.v, r.rev) for r in IB.read_iceberg(spark, root).collect()}
    assert rows == {1: ("x", 1), 2: ("y2", 2), 3: ("z", 2)}
    # time travel into the pre-merge snapshot via the retained history
    rows1 = {r.k: r.v for r in IB.read_iceberg(spark, root, s1).collect()}
    assert rows1 == {1: "x", 2: "y"}
    # exactly one live file after the rewrite snapshot
    files, n_total = IB.snapshot_files(root)
    assert len(files) == 1 and n_total == 1


def test_equality_delete_merge_on_read(tmp_path, spark):
    root = str(tmp_path / "mor")
    b1 = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
    )
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    n_data_before = len(IB.snapshot_files_v2(root)[0])
    dels = spark.createDataFrame([(2,)], "k long")
    snap = IB.append_equality_delete(spark, root, dels, equality_field="k")
    data, del_files = IB.snapshot_files_v2(root, snap)
    assert len(data) == n_data_before  # zero data files rewritten
    assert len(del_files) == 1
    rows = {r.k for r in
            IB.read_iceberg_merge_on_read(spark, root, "k").collect()}
    assert rows == {1, 3}
    # the PRE-delete snapshot still reads everything
    prev = {r.k for r in
            IB.read_iceberg_merge_on_read(spark, root, "k", snap - 1).collect()}
    assert prev == {1, 2, 3}


def test_positional_delete_merge_on_read(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "posdel")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    snap, n_del = IB.append_positional_delete(
        spark, root, F.col("k") % 2 == 0
    )
    assert n_del == 2
    rows = {r.k for r in IB.read_iceberg_positional(spark, root).collect()}
    assert rows == {1, 3}
    # data files untouched (merge-on-read), one delete file added
    data, dels = IB.snapshot_files_v2(root, snap)
    assert len(data) == 1 and len(dels) == 1
    # pre-delete snapshot still complete
    prev = {r.k for r in
            IB.read_iceberg_positional(spark, root, snap - 1).collect()}
    assert prev == {1, 2, 3, 4}


def test_snapshot_files_skips_delete_manifests(tmp_path, spark):
    # ADVICE r5 (medium): a v2 snapshot carrying a content=1 manifest
    # must never surface delete files as live data through the
    # content-unaware snapshot_files path.
    root = str(tmp_path / "skipdel")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    dels = spark.createDataFrame([(2,)], "k long")
    IB.append_equality_delete(spark, root, dels, equality_field="k")
    files, _ = IB.snapshot_files(root)
    assert all("eqdel" not in f for f in files)
    data, del_files = IB.snapshot_files_v2(root)
    assert sorted(files) == sorted(data) and len(del_files) == 1


def test_merge_after_equality_delete_no_resurrection(tmp_path, spark):
    root = str(tmp_path / "chain1")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    dels = spark.createDataFrame([(2,)], "k long")
    IB.append_equality_delete(spark, root, dels, equality_field="k")
    # MERGE after the delete: k=2 must stay gone, k=4 inserts, k=3 updates
    b2 = spark.createDataFrame([(3, "c2"), (4, "d")], "k long, v string")
    IB.export_merge_to_iceberg(spark, root, b2, key="k")
    rows = {r.k: r.v for r in IB.read_iceberg(spark, root).collect()}
    assert rows == {1: "a", 3: "c2", 4: "d"}


def test_positional_after_equality_delete_counts_live_only(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "chain2")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    dels = spark.createDataFrame([(2,)], "k long")
    IB.append_equality_delete(spark, root, dels, equality_field="k")
    # k % 2 == 0 matches {2, 4}, but 2 is already equality-deleted:
    # only the live row k=4 may be recorded/counted.
    snap, n_del = IB.append_positional_delete(
        spark, root, F.col("k") % 2 == 0
    )
    assert n_del == 1
    rows = {r.k for r in IB.read_iceberg_resolved(spark, root).collect()}
    assert rows == {1, 3}
    # pre-chain snapshot still complete through the resolver
    assert {
        r.k for r in IB.read_iceberg_resolved(spark, root, snap - 2).collect()
    } == {1, 2, 3, 4}


def test_resolved_reader_mixed_delete_kinds(tmp_path, spark):
    from pyspark.sql import functions as F

    root = str(tmp_path / "mixed")
    b1 = spark.createDataFrame(
        [(i, chr(96 + i)) for i in range(1, 7)], "k long, v string"
    )
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    IB.append_positional_delete(spark, root, F.col("k") == 5)
    dels = spark.createDataFrame([(1,), (6,)], "k long")
    IB.append_equality_delete(spark, root, dels, equality_field="k")
    rows = {r.k for r in IB.read_iceberg_resolved(spark, root).collect()}
    assert rows == {2, 3, 4}


def test_avro_deflate_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
        ],
    }
    recs = [{"s": "x" * 100, "n": i} for i in range(50)]
    p_def = str(tmp_path / "d.avro")
    p_null = str(tmp_path / "n.avro")
    AV.write_container(p_def, schema, recs, codec="deflate")
    AV.write_container(p_null, schema, recs)
    _, out = AV.read_container(p_def)
    assert out == recs
    # compression actually happened on the repetitive payload
    assert os.path.getsize(p_def) < os.path.getsize(p_null)


def test_avro_deflate_raw_rfc1951_blocks(tmp_path):
    # Hand-build a deflate container (the shape a foreign Iceberg writer
    # produces): raw-deflate block body, zlib-headered data must FAIL.
    import io
    import json as _json
    import zlib

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    body = b"".join(AV._encode(schema, {"v": i}) for i in range(5))
    sync = b"\x00" * 16
    meta = {"avro.schema": _json.dumps(schema).encode(),
            "avro.codec": b"deflate"}
    z = zlib.compressobj(wbits=-15)
    comp = z.compress(body) + z.flush()
    p = str(tmp_path / "foreign.avro")
    with open(p, "wb") as fh:
        fh.write(b"Obj\x01")
        fh.write(AV._encode({"type": "map", "values": "bytes"}, meta))
        fh.write(sync)
        fh.write(AV._zigzag_encode(5))
        fh.write(AV._zigzag_encode(len(comp)))
        fh.write(comp)
        fh.write(sync)
    _, out = AV.read_container(p)
    assert [r["v"] for r in out] == [0, 1, 2, 3, 4]


def test_avro_unknown_codec_rejected(tmp_path):
    with pytest.raises(ValueError):
        AV.write_container(
            str(tmp_path / "x.avro"),
            {"type": "record", "name": "r",
             "fields": [{"name": "v", "type": "long"}]},
            [],
            codec="snappy",
        )


def test_field_id_rename_resolution(tmp_path, spark):
    root = str(tmp_path / "rename")
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr", 100 + i) for i in range(10)],
        "doc_id long, lang string, n_chars long",
    )
    s1, s2 = IB.write_iceberg_rename_fixture(spark, docs, root)
    # current snapshot: BOTH files resolve to the renamed column
    cur = IB.read_iceberg(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count"]
    rows = {r.doc_id: r.char_count for r in cur.collect()}
    assert rows == {i: 100 + i for i in range(10)}
    # time travel to snapshot 1 reads under the PINNED old schema
    old = IB.read_iceberg(spark, root, s1)
    assert old.columns == ["doc_id", "lang", "n_chars"]
    assert {r.doc_id: r.n_chars for r in old.collect()} == {
        i: 100 + i for i in range(10) if i % 2 == 0
    }


def test_field_id_missing_column_reads_null(tmp_path, spark):
    import json as _json

    root = str(tmp_path / "addcol")
    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "fr", 20)],
        "doc_id long, lang string, n_chars long",
    )
    IB.write_iceberg_rename_fixture(spark, docs, root)
    # simulate a schema-evolution ADD: field 4 exists in no data file
    mpath = os.path.join(root, "metadata", "v2.metadata.json")
    meta = _json.load(open(mpath))
    meta["schemas"][1]["fields"].append(
        {"id": 4, "name": "quality", "type": "double", "required": False}
    )
    _json.dump(meta, open(mpath, "w"))
    cur = IB.read_iceberg(spark, root)
    assert cur.columns == ["doc_id", "lang", "char_count", "quality"]
    assert all(r.quality is None for r in cur.collect())
    assert dict(cur.dtypes)["quality"] == "double"


def test_fixtures_without_schema_info_unchanged(tmp_path, spark):
    # legacy fixtures carry no schema key -> plain name-based read
    root = str(tmp_path / "legacy")
    docs = spark.createDataFrame(
        [(1, "en", 700, "t1"), (2, "fr", 800, "t2")],
        "doc_id long, lang string, n_chars long, text string",
    )
    IB.write_iceberg_fixture(spark, docs, root)
    out = IB.read_iceberg(spark, root)
    assert set(out.columns) == {"doc_id", "lang", "n_chars", "content_h"}


def test_metrics_pruning_skips_by_bounds(tmp_path, spark):
    root = str(tmp_path / "metrics")
    docs = spark.createDataFrame(
        [(i, "en", 100 + i * 50, f"t{i}") for i in range(10)],
        "doc_id long, lang string, n_chars long, text string",
    )
    bounds = IB.write_iceberg_metrics_fixture(spark, docs, root)
    assert len(bounds) == 4  # n_chars 100..550 spans all buckets
    all_files, n_total = IB.snapshot_files(root)
    assert n_total == 4
    # n_chars >= 300: buckets [0,150) and [150,300) prune away
    files, n = IB.snapshot_files(root, range_filter={3: (300, None)})
    assert n == 4 and len(files) == 2
    rows = spark.read.parquet(*files).filter("n_chars >= 300").count()
    assert rows == sum(1 for i in range(10) if 100 + i * 50 >= 300)
    # upper-bounded range: n_chars <= 140 keeps only the first bucket
    files_lo, _ = IB.snapshot_files(root, range_filter={3: (None, 140)})
    assert len(files_lo) == 1
    # a field with no recorded metrics never prunes
    files_nm, _ = IB.snapshot_files(root, range_filter={99: (0, 1)})
    assert len(files_nm) == 4


def test_export_writes_schema_with_field_ids(tmp_path, spark):
    import pyarrow.parquet as pq

    root = str(tmp_path / "expschema")
    b1 = spark.createDataFrame([(1, "x")], "k long, v string")
    IB.export_merge_to_iceberg(spark, root, b1, key="k")
    meta = IB.current_metadata(root)
    schema = meta["schemas"][meta["current-schema-id"]]
    assert [(f["id"], f["name"], f["type"]) for f in schema["fields"]] == [
        (1, "k", "long"), (2, "v", "string")
    ]
    # parquet footers carry the matching field ids
    files, _ = IB.snapshot_files(root)
    ids = {
        int((f.metadata or {})[b"PARQUET:field_id"]): f.name
        for f in pq.read_schema(files[0])
    }
    assert ids == {1: "k", 2: "v"}
    # an evolution commit (new column) bumps the schema id, keeps ids
    b2 = spark.createDataFrame([(2, "y", 7)], "k long, v string, extra long")
    IB.export_merge_to_iceberg(
        spark, root, b2.unionByName(b1.withColumn("extra", b1.k * 0),
                                    allowMissingColumns=True), key="k"
    )
    meta2 = IB.current_metadata(root)
    assert meta2["current-schema-id"] == 1 and len(meta2["schemas"]) == 2
    cur = {f["name"]: f["id"] for f in meta2["schemas"][1]["fields"]}
    assert cur == {"k": 1, "v": 2, "extra": 3}
    out = IB.read_iceberg(spark, root)
    assert set(out.columns) == {"k", "v", "extra"}


def test_murmur3_known_vectors():
    # public murmur3_x86_32 test vectors (seed 0)
    assert IB._murmur3_32(b"") == 0
    assert IB._murmur3_32(b"hello") == 0x248BFA47
    assert IB._murmur3_32(b"The quick brown fox jumps over the lazy dog") \
        == 0x2E4FF723
    # Iceberg spec appendix: bucket hash of long 34 -> 2017239379
    assert IB._murmur3_32((34).to_bytes(8, "little", signed=True)) \
        == 2017239379


def test_transform_values():
    assert IB.transform_value("identity", "en") == "en"
    assert IB.transform_value("truncate[100]", 253) == 200
    assert IB.transform_value("truncate[100]", -53) == -100
    assert IB.transform_value("truncate[3]", "iceberg") == "ice"
    # spec example: bucket[16] of 34 = 2017239379 % 16
    assert IB.transform_value("bucket[16]", 34) == 2017239379 % 16
    with pytest.raises(ValueError):
        IB.transform_value("void", 1)


def test_hidden_partition_pruning(tmp_path, spark):
    root = str(tmp_path / "hidden")
    docs = spark.createDataFrame(
        [(i, "en", 80 + i * 60, f"t{i}") for i in range(8)],  # 80..500
        "doc_id long, lang string, n_chars long, text string",
    )
    n_files = IB.write_iceberg_hidden_partition_fixture(spark, docs, root)
    assert n_files == 6  # trunc values 0,100,200,300,400,500
    pf = IB.partition_filter_for(root, {"n_chars": {200, 300}})
    assert pf == {"nc_trunc": {200, 300}}
    files, n_total = IB.snapshot_files(root, partition_filter=pf)
    assert n_total == 6 and len(files) == 2
    rows = {r.doc_id for r in spark.read.parquet(*files).collect()}
    assert rows == {i for i in range(8) if 200 <= 80 + i * 60 < 400}
    # a source column with no spec field contributes nothing
    assert IB.partition_filter_for(root, {"lang": {"en"}}) == {}


def test_date_transforms_epoch_ordinals():
    import datetime as dt

    d = dt.date(2017, 11, 16)  # the spec's own example date
    assert IB.transform_value("year", d) == 47
    assert IB.transform_value("month", d) == 574
    assert IB.transform_value("day", d) == 17486
    ts = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert IB.transform_value("day", ts) == 17486


def test_incremental_scan_between_snapshots(tmp_path, spark):
    root = str(tmp_path / "incr")
    docs = spark.createDataFrame(
        [(1, "en", 700, "a"), (2, "fr", 800, "b"), (3, "fr", 500, "c")],
        "doc_id long, lang string, n_chars long, text string",
    )
    s1, s2 = IB.write_iceberg_fixture(spark, docs, root)
    # snapshot 2 added only the filtered fr replacement (n_chars >= 600)
    inc = IB.read_iceberg_incremental(spark, root, s1)
    rows = {(r.doc_id, r._snapshot_id) for r in inc.collect()}
    assert rows == {(2, s2)}
    # full range from 0 sees both snapshots' adds
    inc0 = IB.read_iceberg_incremental(spark, root, 0)
    assert {r._snapshot_id for r in inc0.collect()} == {s1, s2}
    with pytest.raises(ValueError):
        IB.read_iceberg_incremental(spark, root, s2)


def test_expire_snapshots(tmp_path, spark):
    root = str(tmp_path / "expire")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b2 = spark.createDataFrame([(2, "b2"), (3, "c")], "k long, v string")
    s1 = IB.export_merge_to_iceberg(spark, root, b1, key="k")
    s2 = IB.export_merge_to_iceberg(spark, root, b2, key="k")
    # both snapshots readable before expiry
    assert len(IB.read_iceberg(spark, root, s1).collect()) == 2
    deleted = IB.expire_snapshots(root, keep_last=1)
    # s1's data file + its metadata avro files are gone
    assert any(d.endswith(".parquet") for d in deleted)
    assert any(d.endswith(".avro") for d in deleted)
    # current snapshot untouched
    rows = {r.k: r.v for r in IB.read_iceberg(spark, root).collect()}
    assert rows == {1: "a", 2: "b2", 3: "c"}
    # time travel into the expired snapshot now raises
    with pytest.raises(ValueError):
        IB.snapshot_files(root, s1)
    # a later commit keeps working on the trimmed history
    b3 = spark.createDataFrame([(4, "d")], "k long, v string")
    IB.export_merge_to_iceberg(spark, root, b3, key="k")
    assert len(IB.read_iceberg(spark, root).collect()) == 4


def test_rollback_is_metadata_only(tmp_path, spark):
    import glob

    root = str(tmp_path / "rollback")
    b1 = spark.createDataFrame([(1, "a")], "k long, v string")
    b2 = spark.createDataFrame([(1, "BAD")], "k long, v string")
    s1 = IB.export_merge_to_iceberg(spark, root, b1, key="k")
    IB.export_merge_to_iceberg(spark, root, b2, key="k")
    files_before = sorted(glob.glob(os.path.join(root, "data", "*")))
    IB.rollback_to_snapshot(root, s1)
    assert {r.v for r in IB.read_iceberg(spark, root).collect()} == {"a"}
    # nothing moved or deleted — pure metadata
    assert sorted(glob.glob(os.path.join(root, "data", "*"))) == files_before
    # the rolled-back-over snapshot stays time-travelable
    with pytest.raises(ValueError):
        IB.rollback_to_snapshot(root, 999999)


def test_expire_snapshots_retains_current_after_rollback(tmp_path, spark):
    """expireSnapshots must never expire the snapshot current-snapshot-id
    points at — after a rollback the current snapshot sits OUTSIDE the
    keep_last tail, and dropping it would physically delete live data."""
    root = str(tmp_path / "expire_rb")
    b1 = spark.createDataFrame([(1, "a")], "k long, v string")
    b2 = spark.createDataFrame([(2, "b")], "k long, v string")
    b3 = spark.createDataFrame([(3, "c")], "k long, v string")
    s1 = IB.export_merge_to_iceberg(spark, root, b1, key="k")
    IB.export_merge_to_iceberg(spark, root, b2, key="k")
    IB.export_merge_to_iceberg(spark, root, b3, key="k")
    IB.rollback_to_snapshot(root, s1)
    # keep_last=1 would retain only s3; s1 (current) must survive too
    IB.expire_snapshots(root, keep_last=1)
    meta = IB.current_metadata(root)
    assert meta["current-snapshot-id"] == s1
    assert s1 in {s["snapshot-id"] for s in meta["snapshots"]}
    # live read still works — s1's data files were NOT deleted
    assert {r.v for r in IB.read_iceberg(spark, root).collect()} == {"a"}


def test_format_version_gate(tmp_path, spark):
    root = str(tmp_path / "v3gate")
    b = spark.createDataFrame([(1, "a")], "k long, v string")
    IB.export_merge_to_iceberg(spark, root, b, key="k")
    meta = IB.current_metadata(root)
    meta["format-version"] = 3
    with open(
        os.path.join(root, "metadata", "v99.metadata.json"), "w"
    ) as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="format-version 3"):
        IB.read_iceberg(spark, root)
    with pytest.raises(ValueError, match="format-version 3"):
        IB.snapshot_files_v2(root)


def test_equality_delete_sequence_scoping(tmp_path, spark):
    """A key appended AFTER an equality delete must survive resolution:
    the delete file applies only to data files with strictly lower
    sequence numbers."""
    root = str(tmp_path / "seqscope")
    b = spark.createDataFrame(
        [(1, "a"), (2, "old"), (3, "c")], "k long, v string"
    )
    IB.export_merge_to_iceberg(spark, root, b, key="k")
    IB.append_equality_delete(
        spark, root, spark.createDataFrame([(2,)], "k long"), "k"
    )
    # resurrection commit: same key appended after the delete
    IB.append_data_file(
        spark, root, spark.createDataFrame([(2, "new")], "k long, v string")
    )
    rows = {r.k: r.v for r in IB.read_iceberg_resolved(spark, root).collect()}
    assert rows == {1: "a", 2: "new", 3: "c"}
    # the old k=2 row stays deleted; the delete is not globally unscoped
    assert "old" not in rows.values()
    # positional delete chained on top only sees live rows
    from pyspark.sql import functions as F

    snap, n = IB.append_positional_delete(spark, root, F.col("k") == 2)
    assert n == 1  # exactly the NEW row, not the already-deleted old one
    rows2 = {r.k: r.v for r in IB.read_iceberg_resolved(spark, root).collect()}
    assert rows2 == {1: "a", 3: "c"}


def test_v3_deletion_vector_roundtrip(tmp_path, spark):
    """Puffin DV fixture -> read_iceberg_v3 applies the bitmap; the v2
    resolvers gate on format-version 3 by name."""
    root = str(tmp_path / "v3dv")
    docs = spark.createDataFrame(
        [(1, "en", 700), (2, "fr", 800), (3, "fr", 500), (4, "de", 900)],
        "doc_id long, lang string, n_chars long",
    )
    s1, s2 = IB.write_iceberg_v3_dv_fixture(spark, docs, root)
    rows = {r.doc_id for r in IB.read_iceberg_v3(spark, root).collect()}
    assert rows == {1, 4}  # fr rows deleted positionally via the DV
    # snapshot 1 (pre-delete) still sees everything
    rows1 = {r.doc_id for r in IB.read_iceberg_v3(spark, root, s1).collect()}
    assert rows1 == {1, 2, 3, 4}
    # blob validates: CRC + length framing + magic
    foot = IB._puffin_footer(os.path.join(root, "data", "dv-1.puffin"))
    assert foot["blobs"][0]["type"] == "deletion-vector-v1"
    with open(os.path.join(root, "data", "dv-1.puffin"), "rb") as fh:
        raw = fh.read()
    b = foot["blobs"][0]
    assert IB._dv_blob_decode(raw, b["offset"], b["length"]) == [1, 2]
    # v2 resolvers refuse the v3 table by feature name
    with pytest.raises(ValueError, match="format-version 3"):
        IB.read_iceberg(spark, root)
    with pytest.raises(ValueError, match="format-version 3"):
        IB.read_iceberg_resolved(spark, root)


def test_dv_blob_corruption_detected(tmp_path):
    blob = IB._dv_blob_encode([0, 5, 1 << 33])
    raw = b"XX" + blob
    assert IB._dv_blob_decode(raw, 2, len(blob)) == [0, 5, 1 << 33]
    bad = bytearray(raw)
    bad[10] ^= 0xFF
    with pytest.raises(ValueError):
        IB._dv_blob_decode(bytes(bad), 2, len(blob))


def test_append_dv_delete_chained(tmp_path, spark):
    """v3 DV DELETE write path: two chained DV commits — the second
    folds the first file's positions into ONE superseding bitmap per
    data file (the spec's one-DV-per-data-file rule), zero data files
    rewritten, and time travel across the chain stays exact."""
    import glob

    from pyspark.sql import functions as F

    root = str(tmp_path / "dvw")
    docs = spark.createDataFrame(
        [(1, "en", 700), (2, "fr", 800), (3, "fr", 500), (4, "de", 900),
         (5, "en", 100)],
        "doc_id long, lang string, n_chars long",
    )
    s1, s2 = IB.write_iceberg_v3_dv_fixture(spark, docs, root)
    data_before = sorted(glob.glob(os.path.join(root, "data", "*.parquet")))
    # chained DV delete on the LIVE rows (fr already gone)
    s3, n = IB.append_dv_delete(spark, root, F.col("n_chars") < 500)
    assert n == 1  # only doc 5; the fr rows were already DV-deleted
    assert {r.doc_id for r in IB.read_iceberg_v3(spark, root).collect()} == {1, 4}
    # zero data files rewritten
    assert sorted(glob.glob(os.path.join(root, "data", "*.parquet"))) == data_before
    # one superseding DV per data file: the new snapshot references
    # exactly one delete manifest whose bitmap is the UNION {2,3} ∪ {5}
    meta = IB.current_metadata(root)
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, manifests = AV.read_container(
        IB._resolve(root, snaps[s3]["manifest-list"])
    )
    dv_manifests = [m for m in manifests if m.get("content", 0) == 1]
    assert len(dv_manifests) == 1
    _, entries = AV.read_container(
        IB._resolve(root, dv_manifests[0]["manifest_path"])
    )
    assert len(entries) == 1 and entries[0]["data_file"]["record_count"] == 3
    # time travel: s2 sees the first deletion only, s1 sees everything
    assert {r.doc_id for r in IB.read_iceberg_v3(spark, root, s2).collect()} \
        == {1, 4, 5}
    assert {r.doc_id for r in IB.read_iceberg_v3(spark, root, s1).collect()} \
        == {1, 2, 3, 4, 5}
    # idempotent second predicate: nothing new to delete
    s4, n2 = IB.append_dv_delete(spark, root, F.col("lang") == "fr")
    assert n2 == 0
    assert {r.doc_id for r in IB.read_iceberg_v3(spark, root).collect()} == {1, 4}


def test_v3_row_lineage_assignment(tmp_path, spark):
    """Row ids: file's first_row_id + position; appended file starts at
    the table's next-row-id; ids are unique and stable across reads."""
    root = str(tmp_path / "v3lin")
    docs = spark.createDataFrame(
        [(1, "en", 700), (2, "fr", 800), (3, "fr", 500), (4, "de", 900),
         (6, "en", 100)],
        "doc_id long, lang string, n_chars long",
    )
    s1, s2 = IB.write_iceberg_v3_lineage_fixture(spark, docs, root)
    out = {r.doc_id: r._row_id
           for r in IB.read_iceberg_v3_lineage(spark, root).collect()}
    # evens (2,4,6) get 0..2 in doc_id order; odds (1,3) get 3..4
    assert out == {2: 0, 4: 1, 6: 2, 1: 3, 3: 4}
    assert IB.current_metadata(root)["next-row-id"] == 5
    # snapshot 1 sees only the even batch, same ids (durable)
    out1 = {r.doc_id: r._row_id
            for r in IB.read_iceberg_v3_lineage(spark, root, s1).collect()}
    assert out1 == {2: 0, 4: 1, 6: 2}
    # a data file without first_row_id cannot serve lineage — named error
    root2 = str(tmp_path / "v3dv")
    IB.write_iceberg_v3_dv_fixture(spark, docs, root2)
    with pytest.raises(ValueError, match="first_row_id"):
        IB.read_iceberg_v3_lineage(spark, root2)


def test_refs_pin_snapshots_from_expiry(tmp_path, spark):
    """Tags/branches: set_ref is pure metadata; expire_snapshots
    retains every ref-pinned snapshot; resolve_ref('main') defaults to
    current-snapshot-id; unknown refs raise by name."""
    root = str(tmp_path / "refs")
    b1 = spark.createDataFrame([(1, "a")], "k long, v string")
    b2 = spark.createDataFrame([(2, "b")], "k long, v string")
    b3 = spark.createDataFrame([(3, "c")], "k long, v string")
    s1 = IB.export_merge_to_iceberg(spark, root, b1, key="k")
    s2 = IB.export_merge_to_iceberg(spark, root, b2, key="k")
    IB.export_merge_to_iceberg(spark, root, b3, key="k")
    IB.set_ref(root, "release-1", s1, ref_type="tag")
    IB.set_ref(root, "staging", s2, ref_type="branch")
    assert IB.resolve_ref(root, "release-1") == s1
    assert IB.resolve_ref(root, "main") == s1 + 2
    with pytest.raises(ValueError, match="unknown ref"):
        IB.resolve_ref(root, "nope")
    with pytest.raises(ValueError):
        IB.set_ref(root, "bad", 999999)
    # expiry: keep_last=1 retains current AND both ref-pinned snapshots
    IB.expire_snapshots(root, keep_last=1)
    assert {r.v for r in IB.read_iceberg_ref(spark, root, "release-1").collect()} == {"a"}
    assert {r.v for r in IB.read_iceberg_ref(spark, root, "staging").collect()} == {"a", "b"}
    assert {r.v for r in IB.read_iceberg_ref(spark, root, "main").collect()} == {"a", "b", "c"}


def test_rewrite_position_deletes_to_dvs(tmp_path, spark):
    import glob

    from pyspark.sql import functions as F

    root = str(tmp_path / "p2dv")
    docs = spark.createDataFrame(
        [(1, "en", 700, "a"), (2, "fr", 800, "b"), (3, "de", 500, "c"),
         (4, "de", 900, "d")],
        "doc_id long, lang string, n_chars long, text string",
    )
    IB.write_iceberg_fixture(spark, docs, root)
    before = {r.doc_id for r in IB.read_iceberg_resolved(spark, root).collect()}
    IB.append_positional_delete(spark, root, F.col("doc_id") == 3)
    expect = before - {3}
    data_before = sorted(glob.glob(os.path.join(root, "data", "*.parquet")))
    snap, n_files, n_pos = IB.rewrite_position_deletes_to_dvs(spark, root)
    assert n_pos == 1 and n_files == 1
    # v3 read serves the identical answer; v2 resolvers refuse by name
    assert {r.doc_id for r in IB.read_iceberg_v3(spark, root).collect()} == expect
    with pytest.raises(ValueError, match="format-version 3"):
        IB.read_iceberg_resolved(spark, root)
    # only the posdel parquet remains unreferenced; data files untouched
    assert sorted(glob.glob(os.path.join(root, "data", "*.parquet"))) == data_before
    # equality deletes block the conversion by name
    root2 = str(tmp_path / "p2dv_eq")
    IB.write_iceberg_fixture(spark, docs, root2)
    IB.append_equality_delete(
        spark, root2, spark.createDataFrame([(1,)], "doc_id long"), "doc_id"
    )
    with pytest.raises(ValueError, match="equality delete"):
        IB.rewrite_position_deletes_to_dvs(spark, root2)


def test_v3_default_values_projection(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "fr" if i % 3 == 0 else "en", 500 + 100 * (i % 3), f"t{i}")
         for i in range(12)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "defaults")
    s1, s2 = IB.write_iceberg_v3_default_values_fixture(spark, docs, root)
    cur = IB.read_iceberg_v3(spark, root)
    # rows from the pre-add file resolve tier to the initial-default,
    # NOT null; the post-add file keeps its explicit values
    assert cur.filter(F.col("tier").isNull()).count() == 0
    legacy = cur.filter(F.col("tier") == "legacy")
    assert legacy.count() == 8
    assert {r.lang for r in legacy.select("lang").distinct().collect()} == {
        "en"
    }
    fr = cur.filter(F.col("lang") == "fr")
    assert {r.tier for r in fr.select("tier").distinct().collect()} <= {
        "standard",
        "short",
    }
    # snapshot 1 reads under its pinned schema-id 0: no tier column
    pre = IB.read_iceberg_v3(spark, root, s1)
    assert "tier" not in pre.columns
    assert pre.count() == 8


def test_metadata_tables(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, ["en", "fr", "de"][i % 3], 400 + 100 * (i % 4), f"t{i}")
         for i in range(12)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "meta")
    s1, s2 = IB.write_iceberg_fixture(spark, docs, root)
    snaps = IB.iceberg_metadata_table(spark, root, "snapshots")
    assert {r.snapshot_id for r in snaps.collect()} == {s1, s2}
    hist = IB.iceberg_metadata_table(spark, root, "history").collect()
    assert [h.is_current for h in hist] == [False, True]
    # refs: empty table (schema intact), then one tag after set_ref
    assert IB.iceberg_metadata_table(spark, root, "refs").count() == 0
    IB.set_ref(root, "audit-2024", s1, ref_type="tag")
    refs = IB.iceberg_metadata_table(spark, root, "refs").collect()
    assert [(r.name, r.type, r.snapshot_id) for r in refs] == [
        ("audit-2024", "tag", s1)
    ]
    # files at snapshot 1: one per lang with REAL record counts
    f1 = IB.iceberg_metadata_table(spark, root, "files", s1)
    assert f1.count() == 3
    assert {r.record_count for r in f1.collect()} == {4}
    # files at snapshot 2: fr file replaced by the filtered rewrite
    f2 = {r.file_path: r.record_count
          for r in IB.iceberg_metadata_table(spark, root, "files").collect()}
    assert f2["data/lang=fr/file-2.parquet"] == 2  # n_chars >= 600
    mans = IB.iceberg_metadata_table(spark, root, "manifests")
    assert mans.count() == 2
    parts = {r.partition: (r.n_files, r.record_count)
             for r in IB.iceberg_metadata_table(
                 spark, root, "partitions").collect()}
    assert parts['{"lang": "fr"}'] == (1, 2)
    assert parts['{"lang": "en"}'] == (1, 4)
    with pytest.raises(ValueError, match="unknown metadata table"):
        IB.iceberg_metadata_table(spark, root, "entries")


def test_uniform_dual_publish_refuses_dv_tables(spark, tmp_path):
    from pyspark.sql import functions as F

    from news_ingestion_data_pipeline_spark.operators import deltalog as DL

    docs = spark.createDataFrame(
        [(i, "en", 500 + i, f"t{i}") for i in range(8)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "uni")
    DL.write_delta_fixture(spark, docs, root)
    snap = IB.publish_iceberg_metadata_for_delta(root)
    d = DL.read_delta(spark, root)
    i = IB.read_iceberg(spark, root, snap)
    assert sorted(map(tuple, d.collect())) == sorted(map(tuple, i.collect()))
    # a DV-carrying snapshot is refused by name
    DL.delete_where_with_dv(spark, root, F.col("doc_id") == 0)
    with pytest.raises(ValueError, match="deletion-vector"):
        IB.publish_iceberg_metadata_for_delta(root)


def test_rewrite_data_files_replace_snapshot(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, ["en", "fr", "de"][i % 3], 400 + i, f"t{i}") for i in range(12)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "rewrite")
    s1, s2 = IB.write_iceberg_fixture(spark, docs, root)
    before = sorted(map(tuple, IB.read_iceberg(spark, root).collect()))
    snap, n_before, n_after = IB.rewrite_data_files(spark, root, "doc_id")
    assert n_before == 3 and n_after == 3  # one file PER lang partition
    files, _ = IB.snapshot_files(root)
    assert len(files) == 3
    after = sorted(map(tuple, IB.read_iceberg(spark, root).collect()))
    assert after == before
    # the compacted entries carry REAL partition values — a partition-
    # filtered read after compaction must still prune to one file and
    # return the partition's rows (an all-NULL partition record would
    # be silently pruned to zero)
    de_files, n_live = IB.snapshot_files(
        root, partition_filter={"lang": {"de"}}
    )
    assert len(de_files) == 1 and n_live == 3
    de = IB.read_iceberg(spark, root, partition_filter={"lang": {"de"}})
    assert sorted(r.doc_id for r in de.collect()) == [2, 5, 8, 11]
    # pre-compaction snapshot still time-travels with the old layout
    old_files, _ = IB.snapshot_files(root, s2)
    assert len(old_files) == 3
    # a merge-on-read table refuses the rewrite by name (a plain
    # rewrite would resurrect its deleted rows)
    root2 = str(tmp_path / "rewrite_mor")
    IB.write_iceberg_fixture(spark, docs, root2)
    IB.append_equality_delete(
        spark, root2, spark.createDataFrame([(1,)], "doc_id long"),
        "doc_id",
    )
    with pytest.raises(ValueError, match="delete manifests"):
        IB.rewrite_data_files(spark, root2)


def test_uniform_reverse_refuses_delete_files(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, "en", 500 + i, f"t{i}") for i in range(6)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "unirev")
    IB.write_iceberg_fixture(spark, docs, root)
    n = IB.publish_delta_log_for_iceberg(root)
    assert n == 2  # file-1 (en) + file-2 (fr rewrite, empty here)
    # publishing twice is refused (the log already exists)
    with pytest.raises(ValueError, match="_delta_log already exists"):
        IB.publish_delta_log_for_iceberg(root)
    # a table with live equality-delete files is refused by name
    root2 = str(tmp_path / "unirev2")
    IB.write_iceberg_fixture(spark, docs, root2)
    IB.append_equality_delete(
        spark, root2, spark.createDataFrame([(1,)], "doc_id long"), "doc_id"
    )
    with pytest.raises(ValueError, match="delete files"):
        IB.publish_delta_log_for_iceberg(root2)


def test_remove_orphan_files_keeps_history(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 400 + 100 * i, f"t{i}") for i in range(8)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "orphan")
    s1, s2 = IB.write_iceberg_fixture(spark, docs, root)
    open(os.path.join(root, "data", "stray.parquet"), "wb").write(b"x")
    removed = IB.remove_orphan_files(root)
    assert removed == ["data/stray.parquet"]
    # snapshot 1's fr file is DELETED at s2 but still history — kept
    files1, _ = IB.snapshot_files(root, s1)
    assert len(files1) == 2
    assert IB.read_iceberg(spark, root).count() > 0


def test_remove_orphan_files_keeps_registered_statistics(spark, tmp_path):
    """Files registered under the metadata's ``statistics`` /
    ``partition-statistics`` lists are reachable state, not orphans —
    removeOrphanFiles after a stats publish must keep them and the
    stats readers must still resolve their paths."""
    docs = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], 400 + i, f"t{i}") for i in range(6)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "orphan_stats")
    IB.write_iceberg_fixture(spark, docs, root)
    k = 4
    minima = {"doc_id": [10, 20, 30, 40]}
    puffin = IB.publish_puffin_statistics(root, minima, k)
    pstats = IB.publish_partition_statistics(root)
    removed = IB.remove_orphan_files(root)
    assert puffin not in removed and pstats not in removed
    assert os.path.exists(os.path.join(root, puffin))
    assert os.path.exists(os.path.join(root, pstats))
    stats = IB.read_table_statistics(root, k)
    assert stats and stats[0]["column"] == "doc_id"
    assert IB.read_partition_statistics(spark, root).count() > 0


def test_puffin_kmv_truncates_to_k_smallest(spark, tmp_path):
    """The KMV estimate is valid only on the k SMALLEST hashes — a
    caller passing more than k minima must get the same NDV as one
    passing exactly the k smallest (not a silently deflated estimate
    driven by the largest supplied hash)."""
    docs = spark.createDataFrame(
        [(i, "en", 400 + i, f"t{i}") for i in range(4)],
        "doc_id long, lang string, n_chars long, text string",
    )
    k = 4
    vals = [100, 200, 300, 400]
    extra = vals + [10**15, 2 * 10**15]  # larger hashes beyond k
    roots = []
    for tag, minima in (("exact", vals), ("extra", extra)):
        root = str(tmp_path / f"kmv_{tag}")
        IB.write_iceberg_fixture(spark, docs, root)
        IB.publish_puffin_statistics(root, {"doc_id": minima}, k)
        roots.append(root)
    got = [IB.read_table_statistics(r, k)[0] for r in roots]
    assert got[0]["ndv_from_blob"] == got[1]["ndv_from_blob"]
    assert got[0]["ndv_property"] == got[1]["ndv_property"]
    assert got[1]["n_minima"] == k


def test_metadata_publish_exclusive_create(tmp_path):
    """Metadata publishers never clobber a concurrent writer's commit:
    the version file is opened with exclusive create, and a taken
    version number retries at the next one."""
    root = _mk_iceberg(tmp_path, {1: [(1, "data/a.parquet")]})
    racing = os.path.join(root, "metadata", "v2.metadata.json")
    with open(racing, "w", encoding="utf-8") as fh:
        json.dump({"format-version": 2, "marker": "racer"}, fh)
    meta = IB.current_metadata(root)
    v = IB._write_metadata_exclusive(root, dict(meta))
    assert v == 3
    # the racer's v2 is untouched; ours landed at v3
    assert json.load(open(racing, encoding="utf-8"))["marker"] == "racer"
    assert os.path.exists(os.path.join(root, "metadata", "v3.metadata.json"))


def test_metadata_publish_conflict_raises(tmp_path, monkeypatch):
    """A racer landing BETWEEN the version listing and the exclusive
    create means this commit's base metadata is stale — republishing it
    at the next number would lose the racer's snapshots, so the publish
    must refuse (IcebergCommitConflict), never renumber."""
    root = _mk_iceberg(tmp_path, {1: [(1, "data/a.parquet")]})
    meta = IB.current_metadata(root)
    mdir = os.path.join(root, "metadata")
    real_listdir = os.listdir

    def stale_listdir(path):
        names = real_listdir(path)
        if os.path.abspath(path) == os.path.abspath(mdir):
            return [n for n in names if n != "v2.metadata.json"]
        return names

    # the racer's v2 exists but the loser's listing predates it
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump({"format-version": 2, "marker": "racer"}, fh)
    monkeypatch.setattr(os, "listdir", stale_listdir)
    with pytest.raises(IB.IcebergCommitConflict, match="stale"):
        IB._write_metadata_exclusive(root, dict(meta))
    # the racer's commit is untouched and no v3 was published
    monkeypatch.undo()
    assert json.load(open(os.path.join(mdir, "v2.metadata.json")))[
        "marker"
    ] == "racer"
    assert not os.path.exists(os.path.join(mdir, "v3.metadata.json"))


def test_rewrite_data_files_nonlang_partition(spark, tmp_path):
    """Compaction over a table partitioned on a NON-lang field must
    carry the recorded partition values into the compacted manifest
    (derived schema), so post-compaction partition pruning still
    resolves — a lang-only hard-coded manifest would record NULLs and
    snapshot_files would prune the compacted files to zero."""
    docs = spark.createDataFrame(
        [(i, "en", 350 + 100 * (i % 3), f"t{i}") for i in range(12)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "rewrite_trunc")
    IB.write_iceberg_hidden_partition_fixture(spark, docs, root)
    before = sorted(map(tuple, IB.read_iceberg(spark, root).collect()))
    snap, n_before, n_after = IB.rewrite_data_files(spark, root)
    assert n_before == 3 and n_after == 3  # one file per nc_trunc bucket
    after = sorted(map(tuple, IB.read_iceberg(spark, root).collect()))
    assert after == before
    # partition pruning on the compacted layout still works: n_chars
    # takes 350/450/550 -> truncate[100] buckets 300/400/500, so bucket
    # 400 holds exactly the doc_id % 3 == 1 rows
    files, n_live = IB.snapshot_files(
        root, partition_filter={"nc_trunc": {400}}
    )
    assert len(files) == 1 and n_live == 3
    got = IB.read_iceberg(
        spark, root, partition_filter={"nc_trunc": {400}}
    )
    assert sorted(r.doc_id for r in got.collect()) == [1, 4, 7, 10]


def test_snapshot_files_keeps_files_missing_partition_value(tmp_path):
    """Pruning must never drop a file it can't judge: an entry whose
    partition record carries NO value for the filtered field is KEPT
    (the Delta read_delta_partition_pruned rule, now shared) — only a
    recorded non-matching value prunes."""
    root = _mk_iceberg(tmp_path, {1: [(1, "data/a.parquet")]})
    # filter on a field the manifest never recorded -> file kept
    files, n_total = IB.snapshot_files(root, partition_filter={"day": {"x"}})
    assert len(files) == 1 and n_total == 1
    # a recorded NULL value still prunes against a non-null allow-set
    files2, _ = IB.snapshot_files(root, partition_filter={"lang": {"en"}})
    assert files2 == []


def test_rewrite_data_files_refuses_mixed_specs(spark, tmp_path):
    """Compaction over manifests whose entries carry DIFFERENT
    partition-field sets refuses by name: a union-field manifest would
    record NULL for the foreign spec's fields, and partition pruning
    treats a recorded null as judgable — silently pruning the
    compacted files on the next filtered read."""
    docs = spark.createDataFrame(
        [(i, "en", 400 + i, f"t{i}") for i in range(6)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "mixed")
    IB.write_iceberg_fixture(spark, docs, root)  # lang-partitioned
    # splice a second manifest recording a DIFFERENT partition field
    meta = IB.current_metadata(root)
    snap = meta["current-snapshot-id"]
    AV.write_container(
        os.path.join(root, "metadata", "m-foreign.avro"),
        IB._MANIFEST_SCHEMA_TRUNC,
        [
            {
                "status": 1,
                "snapshot_id": snap,
                "data_file": {
                    "file_path": "data/lang=en/part-0.parquet",
                    "file_format": "PARQUET",
                    "partition": {"nc_trunc": 400},
                    "record_count": 0,
                    "file_size_in_bytes": 1,
                },
            }
        ],
    )
    mlist = {s["snapshot-id"]: s for s in meta["snapshots"]}[snap][
        "manifest-list"
    ]
    _, manifests = AV.read_container(os.path.join(root, mlist))
    manifests.append(
        {
            "manifest_path": "metadata/m-foreign.avro",
            "manifest_length": 1,
            "partition_spec_id": 1,
            "added_snapshot_id": snap,
        }
    )
    AV.write_container(
        os.path.join(root, mlist), IB._MANIFEST_LIST_SCHEMA, manifests
    )
    with pytest.raises(ValueError, match="mixed partition specs"):
        IB.rewrite_data_files(spark, root)


def test_rewrite_data_files_refuses_mixed_value_types(spark, tmp_path):
    """Same partition-field SET but heterogeneous recorded value types
    (string lang in one manifest, int lang in another) refuses by name:
    inferring the manifest Avro type from the first value alone would
    build a schema that mismatches the other values, leaving the
    failure to avro_lite's write-time strictness instead of an explicit
    guard."""
    docs = spark.createDataFrame(
        [(i, "en", 400 + i, f"t{i}") for i in range(6)],
        "doc_id long, lang string, n_chars long, text string",
    )
    root = str(tmp_path / "mixedtype")
    IB.write_iceberg_fixture(spark, docs, root)  # lang-partitioned (string)
    meta = IB.current_metadata(root)
    snap = meta["current-snapshot-id"]
    # splice a manifest recording the SAME field name with a LONG value
    schema_long = json.loads(
        json.dumps(IB._MANIFEST_SCHEMA).replace(
            '{"name": "lang", "type": ["null", "string"]}',
            '{"name": "lang", "type": ["null", "long"]}',
        )
    )
    AV.write_container(
        os.path.join(root, "metadata", "m-longlang.avro"),
        schema_long,
        [
            {
                "status": 1,
                "snapshot_id": snap,
                "data_file": {
                    "file_path": "data/lang=en/part-0.parquet",
                    "file_format": "PARQUET",
                    "partition": {"lang": 400},
                    "record_count": 0,
                    "file_size_in_bytes": 1,
                },
            }
        ],
    )
    mlist = {s["snapshot-id"]: s for s in meta["snapshots"]}[snap][
        "manifest-list"
    ]
    _, manifests = AV.read_container(os.path.join(root, mlist))
    manifests.append(
        {
            "manifest_path": "metadata/m-longlang.avro",
            "manifest_length": 1,
            "partition_spec_id": 0,
            "added_snapshot_id": snap,
        }
    )
    AV.write_container(
        os.path.join(root, mlist), IB._MANIFEST_LIST_SCHEMA, manifests
    )
    with pytest.raises(ValueError, match="mixed Avro types"):
        IB.rewrite_data_files(spark, root)
