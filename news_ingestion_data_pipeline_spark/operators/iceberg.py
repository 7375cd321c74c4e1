"""Apache Iceberg table reader (open-format interop, clean-room).

Implements the READ side of the public Iceberg table spec
(https://iceberg.apache.org/spec/): a table directory holds
``metadata/vN.metadata.json`` (current snapshot id + snapshot list,
each snapshot naming its MANIFEST LIST), manifest lists and manifest
files are Avro containers (decoded by ``operators/avro_lite.py``, a
clean-room minimal Avro codec), and a manifest's entries carry a
``status`` (0 EXISTING / 1 ADDED / 2 DELETED) plus the ``data_file``
record. The files live at a snapshot are the non-DELETED entries across
all manifests reachable from that snapshot's manifest list.

Scale shape: like the Delta reader, metadata is kilobytes resolved
driver-side (exactly what production Iceberg readers do before
planning); the data path is one distributed parquet scan over the live
files, so pushdown/pruning/parallelism are untouched. Snapshot-id
time travel = resolving an older snapshot's manifest list from the
SAME metadata file.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession

from news_ingestion_data_pipeline_spark.operators import avro_lite as AV

_STATUS_DELETED = 2


class IcebergCommitConflict(RuntimeError):
    """A concurrent committer published a metadata version between this
    writer's read of ``current_metadata`` and its exclusive-create
    publish. The loser's ``new_meta`` was built from a STALE base —
    republishing it at the next number would silently drop the winner's
    snapshots (a lost update), so the commit refuses and the caller
    must re-read and re-apply (the Delta twin's ``_commit`` rebase
    discipline, ``tests/test_deltalog.py::
    test_commit_exclusive_create_and_rebase``)."""


def current_metadata(root: str) -> dict:
    """Parse the highest-versioned ``metadata/vN.metadata.json``."""
    mdir = os.path.join(root, "metadata")
    versions = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".metadata.json"):
            stem = name[1 : -len(".metadata.json")]
            if stem.isdigit():
                versions.append(int(stem))
    if not versions:
        raise FileNotFoundError(f"no vN.metadata.json under {mdir}")
    with open(
        os.path.join(mdir, f"v{max(versions)}.metadata.json"),
        encoding="utf-8",
    ) as fh:
        return json.load(fh)


def _write_metadata_exclusive(root: str, new_meta: dict) -> int:
    """Publish ``new_meta`` as the NEXT ``vN.metadata.json`` with
    EXCLUSIVE create (mode 'x'). A FileExistsError means a concurrent
    committer won the version number AFTER this writer read its base
    metadata — ``new_meta`` is stale, and renumbering it would lose the
    winner's snapshots — so the commit raises
    :class:`IcebergCommitConflict` instead of silently clobbering (the
    Delta twin's ``_commit`` exclusive-create + refuse-and-rebase
    discipline; every metadata publisher in this module routes through
    here). Returns the version written."""
    mdir = os.path.join(root, "metadata")
    version = 1 + max(
        (
            int(n[1 : -len(".metadata.json")])
            for n in os.listdir(mdir)
            if n.startswith("v")
            and n.endswith(".metadata.json")
            and n[1 : -len(".metadata.json")].isdigit()
        ),
        default=0,
    )
    try:
        with open(
            os.path.join(mdir, f"v{version}.metadata.json"),
            "x",
            encoding="utf-8",
        ) as fh:
            json.dump(new_meta, fh)
    except FileExistsError:
        raise IcebergCommitConflict(
            f"metadata v{version} was published concurrently under "
            f"{root} — this commit's base is stale; re-read "
            "current_metadata and re-apply the mutation"
        ) from None
    return version


def _check_format_version(meta: dict, max_supported: int = 2) -> None:
    """Gate foreign metadata by ``format-version`` NAME, mirroring the
    Delta reader's readerFeatures discipline: an Iceberg v3 table
    (deletion vectors in Puffin files, row lineage) silently resolved
    under v2 rules would skip its DV delete files and resurrect deleted
    rows. The v3-aware entry points pass ``max_supported=3``."""
    fv = meta.get("format-version", 1)
    if fv > max_supported:
        raise ValueError(
            f"unsupported Iceberg format-version {fv} "
            "(v3 adds Puffin deletion vectors and row lineage; "
            f"this resolver supports <= {max_supported} — use the "
            "v3-aware read_iceberg_v3 for DV tables)"
        )


def snapshot_files(
    root: str,
    snapshot_id: int | None = None,
    partition_filter: dict[str, set] | None = None,
    range_filter: dict[int, tuple] | None = None,
) -> tuple[list[str], int]:
    """Paths of the data files live at ``snapshot_id`` (default: the
    metadata's current-snapshot-id), via manifest-list -> manifest ->
    entry-status replay.

    ``partition_filter`` maps partition-field name -> allowed values;
    ``range_filter`` maps FIELD ID -> (lo, hi) and prunes against the
    entry's column metrics (``lower_bounds``/``upper_bounds``, the
    spec's int64 single-value serialization): a file whose recorded
    [lower, upper] misses the query range is skipped WITHOUT touching
    it — the second metadata-level scan-reduction mechanism (zone-map
    style, orthogonal to partition pruning) that turns a 100 TB scan
    into reading only matching files. Files lacking metrics for the
    field are kept (pruning must never drop data it can't judge).
    Returns ``(live_files, n_live_total)`` where the second element
    counts live files BEFORE pruning (the audit number proving files
    were skipped by metadata alone)."""
    meta = current_metadata(root)
    _check_format_version(meta)
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in {sorted(snaps)} for {root}"
        )
    mlist_path = _resolve(root, snaps[snapshot_id]["manifest-list"])
    _, manifests = AV.read_container(mlist_path)
    live: list[str] = []
    n_total = 0
    for m in manifests:
        if m.get("content", 0) == 1:
            # spec: content=1 marks a DELETE manifest — its entries are
            # equality/positional delete files, never live data. Without
            # this skip a v2 snapshot carrying delete manifests would
            # return delete-file rows as data (or fail on mixed schemas).
            continue
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            n_total += 1
            part = e["data_file"].get("partition") or {}
            # conservative rule, shared with the Delta twin
            # (read_delta_partition_pruned): a file whose partition
            # record carries NO value for a filtered field is KEPT —
            # pruning only ever acts on a recorded non-matching value,
            # never on data it can't judge.
            if partition_filter and any(
                k in part and part[k] not in allowed
                for k, allowed in partition_filter.items()
            ):
                continue
            if range_filter and _metrics_prune(e["data_file"], range_filter):
                continue
            live.append(_resolve(root, e["data_file"]["file_path"]))
    return sorted(live), n_total


def _bounds_map(raw) -> dict[int, bytes]:
    """Manifest bounds are an Avro array of {key: field-id, value:
    bytes} records (the spec's logical map<int, binary>)."""
    return {r["key"]: r["value"] for r in (raw or [])}


def _bound_long(b: bytes) -> int:
    """Spec single-value serialization for long: 8-byte little-endian."""
    return int.from_bytes(b, "little", signed=True)


def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public-domain algorithm) — the hash the Iceberg
    spec mandates for bucket transforms, over the value's single-value
    binary serialization."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data)
    m = 0xFFFFFFFF
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & m
        k = ((k << 15) | (k >> 17)) & m
        k = (k * c2) & m
        h ^= k
        h = ((h << 13) | (h >> 19)) & m
        h = (h * 5 + 0xE6546B64) & m
    tail = data[n - n % 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & m
        k = ((k << 15) | (k >> 17)) & m
        k = (k * c2) & m
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & m
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & m
    h ^= h >> 16
    return h


def transform_value(transform: str, v):
    """Apply an Iceberg partition transform to a source value (the
    spec's "hidden partitioning"): identity, bucket[N] (murmur3 of the
    single-value serialization, mod N), truncate[W] (floor multiples
    for ints, prefix for strings)."""
    if transform == "identity":
        return v
    if transform.startswith("bucket["):
        n = int(transform[len("bucket[") : -1])
        if isinstance(v, int):
            data = int(v).to_bytes(8, "little", signed=True)
        else:
            data = str(v).encode("utf-8")
        return (_murmur3_32(data) & 0x7FFFFFFF) % n
    if transform.startswith("truncate["):
        w = int(transform[len("truncate[") : -1])
        if isinstance(v, int):
            return v - (((v % w) + w) % w)
        return str(v)[:w]
    if transform in ("year", "month", "day"):
        # spec: ordinals from epoch (years/months since 1970, epoch days)
        import datetime as _dt

        d = v.date() if isinstance(v, _dt.datetime) else v
        if transform == "year":
            return d.year - 1970
        if transform == "month":
            return (d.year - 1970) * 12 + (d.month - 1)
        return (d - _dt.date(1970, 1, 1)).days
    raise ValueError(f"unsupported partition transform {transform!r}")


def partition_filter_for(
    root: str, source_values: dict[str, set]
) -> dict[str, set]:
    """Translate SOURCE-column candidate values into a partition_filter
    by pushing each value through the table's partition-spec
    transforms (metadata ``partition-specs``) — how a reader prunes on
    a raw-column predicate without knowing the layout (hidden
    partitioning). Source columns without a spec field are ignored."""
    meta = current_metadata(root)
    specs = meta.get("partition-specs") or []
    spec_id = meta.get("default-spec-id", 0)
    fields = []
    for s in specs:
        if s.get("spec-id") == spec_id:
            fields = s.get("fields") or []
    id_to_name: dict[int, str] = {}
    schema = _table_schema(meta, None)
    if schema:
        id_to_name = {f["id"]: f["name"] for f in schema["fields"]}
    out: dict[str, set] = {}
    for f in fields:
        # spec fields carry source-id; source-name accepted for
        # schema-less fixtures
        src = f.get("source-name") or id_to_name.get(f.get("source-id"))
        if src in source_values:
            out[f["name"]] = {
                transform_value(f["transform"], v)
                for v in source_values[src]
            }
    return out


def _metrics_prune(data_file: dict, range_filter: dict[int, tuple]) -> bool:
    """True when the file's column metrics PROVE no row can match:
    upper < lo or lower > hi for any filtered field. Missing metrics
    for a field -> cannot judge -> keep."""
    lowers = _bounds_map(data_file.get("lower_bounds"))
    uppers = _bounds_map(data_file.get("upper_bounds"))
    for fid, (lo, hi) in range_filter.items():
        if lo is not None and fid in uppers:
            if _bound_long(uppers[fid]) < lo:
                return True
        if hi is not None and fid in lowers:
            if _bound_long(lowers[fid]) > hi:
                return True
    return False


def read_iceberg(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
    partition_filter: dict[str, set] | None = None,
) -> DataFrame:
    """DataFrame over the Iceberg snapshot — one distributed parquet
    scan of exactly the live (and, if filtered, partition-pruned)
    files. When the table metadata carries an Iceberg schema (fields
    with ids), columns resolve BY FIELD ID per the spec's "Column
    Projection" rules, so renamed columns — Iceberg's headline schema
    evolution — read correctly across files written under different
    schema versions."""
    files, _ = snapshot_files(root, snapshot_id, partition_filter)
    schema = _table_schema(current_metadata(root), snapshot_id)
    if schema is None:
        return spark.read.parquet(*files)
    return _read_with_field_ids(spark, files, schema)


def _table_schema(meta: dict, snapshot_id: int | None) -> dict | None:
    """The Iceberg schema governing a read: the snapshot's pinned
    ``schema-id`` when time-traveling, else ``current-schema-id``,
    resolved from the metadata's ``schemas`` list (or the legacy
    single ``schema`` field). None when the table carries no schema
    info (this module's minimal fixtures) — callers fall back to a
    plain name-based parquet read."""
    schemas = meta.get("schemas")
    schema_id = meta.get("current-schema-id")
    if snapshot_id is not None:
        for s in meta.get("snapshots", []):
            if s["snapshot-id"] == snapshot_id and "schema-id" in s:
                schema_id = s["schema-id"]
    if schemas:
        for s in schemas:
            if s.get("schema-id") == schema_id:
                return s
        return schemas[-1]
    return meta.get("schema")


#: Iceberg primitive -> Spark SQL type (subset this engine reads)
_ICEBERG_TYPES = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "date": "date",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "string": "string",
    "uuid": "string",
    "binary": "binary",
}


def _read_with_field_ids(
    spark: SparkSession,
    files: list[str],
    schema: dict,
    root: str | None = None,
    tag_identity: bool = False,
) -> DataFrame:
    """Field-id column projection: group data files by their parquet
    (field_id -> physical name) signature (footer-only reads,
    metadata-scale like the manifests), read each group as one
    distributed scan, alias physical names to the table schema's names
    by id, and union. Files without field ids fall back to the spec's
    name mapping; columns absent from a file resolve to the field's
    ``initial-default`` when the schema declares one (the v3 default-
    values rule in "Column Projection"), else to typed NULLs
    (schema-evolution adds). ``tag_identity`` carries the (__file,
    __pos) positional identity through the projection so DV masking
    composes with field-id resolution (requires ``root``)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    groups: dict[tuple, list[str]] = {}
    for f in files:
        idmap = {}
        for fld in pq.read_schema(f):
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                idmap[int(fid)] = fld.name
        groups.setdefault(tuple(sorted(idmap.items())), []).append(f)
    out: DataFrame | None = None
    for key in sorted(groups):
        idmap = dict(key)
        if tag_identity:
            df = _with_position(spark, root, groups[key])
        else:
            df = spark.read.parquet(*groups[key])
        cols = []
        for fld in schema["fields"]:
            name = fld["name"]
            typ = fld.get("type", "string")
            spark_t = (
                _ICEBERG_TYPES.get(typ, typ)
                if isinstance(typ, str)
                else "string"
            )
            phys = idmap.get(fld["id"]) if idmap else None
            if phys is None and not idmap and name in df.columns:
                phys = name  # name-mapping fallback (no ids in file)
            if phys is not None and phys in df.columns:
                cols.append(F.col(phys).cast(spark_t).alias(name))
            else:
                cols.append(
                    F.lit(fld.get("initial-default")).cast(spark_t).alias(name)
                )
        if tag_identity:
            cols += [F.col("__file"), F.col("__pos")]
        part = df.select(*cols)
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("no data files to read")
    return out


def _resolve(root: str, path: str) -> str:
    # spec paths may be absolute URIs; fixture paths are table-relative
    if path.startswith("/") or "://" in path:
        return path
    return os.path.join(root, path)


# ---------------------------------------------------------------------------
# fixture writer (the test table the scan_iceberg_* queries parse)
# ---------------------------------------------------------------------------

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "partition",
                            "fields": [
                                {"name": "lang", "type": ["null", "string"]}
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def write_iceberg_fixture(
    spark: SparkSession, docs: DataFrame, root: str, codec: str = "null"
) -> tuple[int, int]:
    """Build a two-snapshot, lang-partitioned Iceberg table from the
    documents frame:

      * snapshot 1: appends one data file PER LANGUAGE (hidden-
        partition layout; each manifest entry carries its partition
        record {lang}) through manifest m1;
      * snapshot 2: the French quality rewrite — manifest m2 marks the
        non-fr files EXISTING and the fr file DELETED, manifest m3 adds
        the filtered fr replacement (n_chars >= 600).

    Returns (snapshot_id_1, snapshot_id_2). Data files carry
    (doc_id, lang, n_chars, content_h = md5(text))."""
    import shutil

    from pyspark.sql import functions as F

    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    )
    # driver-ok: metadata-scale — one row per lang partition value
    # (bounded enum domain, never per data row)
    lang_counts = {
        r["lang"]: r["n"]
        for r in slim.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    langs = sorted(lang_counts)
    fr_keep = slim.filter(
        (F.col("lang") == "fr") & (F.col("n_chars") >= 600)
    )
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        run_concurrent_writes,
    )

    n_fr_keep, *_ = run_concurrent_writes(
        lambda: fr_keep.count(),
        lambda: _write_single_parquet(
            fr_keep, root, "data/lang=fr/file-2.parquet"
        ),
        *[
            (
                lambda lang=lang: _write_single_parquet(
                    slim.filter(F.col("lang") == lang),
                    root,
                    f"data/lang={lang}/file-1.parquet",
                )
            )
            for lang in langs
        ],
    )

    def _entry(status: int, snap: int, name: str, lang: str, n: int) -> dict:
        p = os.path.join(root, name)
        return {
            "status": status,
            "snapshot_id": snap,
            "data_file": {
                "file_path": name,
                "file_format": "PARQUET",
                "partition": {"lang": lang},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
            },
        }

    snap1, snap2 = 1001, 1002

    def _manifest(name: str, entries: list[dict]) -> dict:
        path = os.path.join(root, "metadata", name)
        AV.write_container(path, _MANIFEST_SCHEMA, entries, codec=codec)
        return {
            "manifest_path": f"metadata/{name}",
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0,
            "added_snapshot_id": None,
        }

    m1 = _manifest(
        "m1.avro",
        [
            _entry(
                1, snap1, f"data/lang={lang}/file-1.parquet", lang,
                lang_counts[lang],
            )
            for lang in langs
        ],
    )
    m2 = _manifest(
        "m2.avro",
        [
            _entry(
                0 if lang != "fr" else 2,  # EXISTING, fr DELETED
                snap1 if lang != "fr" else snap2,
                f"data/lang={lang}/file-1.parquet",
                lang,
                lang_counts[lang],
            )
            for lang in langs
        ],
    )
    m3 = _manifest(
        "m3.avro",
        [_entry(1, snap2, "data/lang=fr/file-2.parquet", "fr", n_fr_keep)],
    )

    AV.write_container(
        os.path.join(root, "metadata", "snap-1.avro"),
        _MANIFEST_LIST_SCHEMA,
        [m1],
        codec=codec,
    )
    AV.write_container(
        os.path.join(root, "metadata", "snap-2.avro"),
        _MANIFEST_LIST_SCHEMA,
        [m2, m3],
        codec=codec,
    )

    meta = {
        "format-version": 2,
        "table-uuid": "spark-graft-iceberg-fixture",
        "location": root,
        "current-snapshot-id": snap2,
        "snapshots": [
            {
                "snapshot-id": snap1,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": snap2,
                "manifest-list": "metadata/snap-2.avro",
                "summary": {"operation": "overwrite"},
            },
        ],
    }
    with open(
        os.path.join(root, "metadata", "v2.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return snap1, snap2


def write_iceberg_rename_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> tuple[int, int]:
    """Two-snapshot table exercising FIELD-ID schema evolution (the
    spec's headline feature):

      * snapshot 1 (schema 0): file-a holds even doc_ids with physical
        columns (doc_id, lang, n_chars), parquet field ids 1/2/3;
      * snapshot 2 (schema 1): column 3 RENAMED n_chars -> char_count;
        file-b adds odd doc_ids written under the new name (same field
        id 3), file-a stays EXISTING untouched.

    A correct reader must resolve file-a's physical ``n_chars`` to the
    current name ``char_count`` by id — a name-based read would drop or
    misplace the column. Files are written with pyarrow so the parquet
    footers carry real field ids. ``docs`` is SF-proportional, so the
    fixture bounds it to the FIRST 500 doc_ids (deterministic: doc_id
    is unique) before the driver-side materialization — the oracle SQL
    of every query over this fixture applies the same bound.
    Returns (snapshot_id_1, snapshot_id_2)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    # bounded driver-side materialization: ≤500 rows × 3 narrow columns
    # regardless of SF (hygiene-adjudicated fixture construction)
    pdf = (
        docs.select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(500)
        .toPandas()
    )

    def _field(name: str, typ, fid: int):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    sa = pa.schema(
        [
            _field("doc_id", pa.int64(), 1),
            _field("lang", pa.string(), 2),
            _field("n_chars", pa.int64(), 3),
        ]
    )
    sb = pa.schema(
        [
            _field("doc_id", pa.int64(), 1),
            _field("lang", pa.string(), 2),
            _field("char_count", pa.int64(), 3),
        ]
    )
    even = pdf[pdf.doc_id % 2 == 0]
    odd = pdf[pdf.doc_id % 2 == 1].rename(columns={"n_chars": "char_count"})
    pq.write_table(
        pa.Table.from_pandas(even, schema=sa, preserve_index=False),
        os.path.join(root, "data", "file-a.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(odd, schema=sb, preserve_index=False),
        os.path.join(root, "data", "file-b.parquet"),
    )

    def _entry(status: int, snap: int, name: str) -> dict:
        return {
            "status": status,
            "snapshot_id": snap,
            "data_file": {
                "file_path": name,
                "file_format": "PARQUET",
                "partition": {"lang": None},
                "record_count": 0,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(root, name)
                ),
            },
        }

    snap1, snap2 = 2001, 2002
    for mname, entries in (
        ("rm1.avro", [_entry(1, snap1, "data/file-a.parquet")]),
        (
            "rm2.avro",
            [
                _entry(0, snap1, "data/file-a.parquet"),
                _entry(1, snap2, "data/file-b.parquet"),
            ],
        ),
    ):
        AV.write_container(
            os.path.join(root, "metadata", mname), _MANIFEST_SCHEMA, entries
        )
    for lname, mname in (
        ("rsnap-1.avro", "rm1.avro"),
        ("rsnap-2.avro", "rm2.avro"),
    ):
        AV.write_container(
            os.path.join(root, "metadata", lname),
            _MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": f"metadata/{mname}",
                    "manifest_length": os.path.getsize(
                        os.path.join(root, "metadata", mname)
                    ),
                    "partition_spec_id": 0,
                    "added_snapshot_id": None,
                }
            ],
        )

    def _schema(schema_id: int, third_name: str) -> dict:
        return {
            "schema-id": schema_id,
            "type": "struct",
            "fields": [
                {"id": 1, "name": "doc_id", "type": "long",
                 "required": False},
                {"id": 2, "name": "lang", "type": "string",
                 "required": False},
                {"id": 3, "name": third_name, "type": "long",
                 "required": False},
            ],
        }

    meta = {
        "format-version": 2,
        "table-uuid": "spark-graft-iceberg-rename-fixture",
        "location": root,
        "current-snapshot-id": snap2,
        "current-schema-id": 1,
        "schemas": [_schema(0, "n_chars"), _schema(1, "char_count")],
        "snapshots": [
            {
                "snapshot-id": snap1,
                "schema-id": 0,
                "manifest-list": "metadata/rsnap-1.avro",
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": snap2,
                "schema-id": 1,
                "manifest-list": "metadata/rsnap-2.avro",
                "summary": {"operation": "append"},
            },
        ],
    }
    with open(
        os.path.join(root, "metadata", "v2.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return snap1, snap2


#: manifest-entry schema variant carrying per-column metrics (the
#: spec's lower_bounds/upper_bounds logical map<int, binary>, encoded
#: as an Avro array of key/value records)
_BOUNDS_SCHEMA = {
    "type": "array",
    "items": {
        "type": "record",
        "name": "k_v",
        "fields": [
            {"name": "key", "type": "int"},
            {"name": "value", "type": "bytes"},
        ],
    },
}
_MANIFEST_SCHEMA_METRICS = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "partition",
                            "fields": [
                                {"name": "lang", "type": ["null", "string"]}
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "lower_bounds", "type": _BOUNDS_SCHEMA},
                    {"name": "upper_bounds", "type": _BOUNDS_SCHEMA},
                ],
            },
        },
    ],
}

#: metrics-fixture bucket edges on n_chars (field id 3)
_METRICS_EDGES = [150, 300, 450]


def write_iceberg_metrics_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> list[tuple[int, int]]:
    """One-snapshot table whose manifest entries carry REAL per-column
    metrics: documents land in up-to-4 range-bucketed files on n_chars
    (edges 150/300/450), each entry recording int64-LE lower/upper
    bounds for doc_id (field 1) and n_chars (field 3) computed from the
    actual file contents. Returns the [(lower, upper)] n_chars bounds
    per written file."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    )
    edges = [None] + _METRICS_EDGES + [None]
    entries = []
    bounds_out = []
    for i in range(len(edges) - 1):
        lo, hi = edges[i], edges[i + 1]
        part = slim
        if lo is not None:
            part = part.filter(F.col("n_chars") >= lo)
        if hi is not None:
            part = part.filter(F.col("n_chars") < hi)
        stats = part.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("dlo"),
            F.max("doc_id").alias("dhi"),
            F.min("n_chars").alias("clo"),
            F.max("n_chars").alias("chi"),
        ).collect()[0]
        if stats["n"] == 0:
            continue
        name = f"data/bucket-{i}.parquet"
        from news_ingestion_data_pipeline_spark.operators.deltalog import (
            _write_single_parquet,
        )

        _write_single_parquet(part, root, name)

        def _b(v: int) -> bytes:
            return int(v).to_bytes(8, "little", signed=True)

        entries.append(
            {
                "status": 1,
                "snapshot_id": 3001,
                "data_file": {
                    "file_path": name,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": stats["n"],
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, name)
                    ),
                    "lower_bounds": [
                        {"key": 1, "value": _b(stats["dlo"])},
                        {"key": 3, "value": _b(stats["clo"])},
                    ],
                    "upper_bounds": [
                        {"key": 1, "value": _b(stats["dhi"])},
                        {"key": 3, "value": _b(stats["chi"])},
                    ],
                },
            }
        )
        bounds_out.append((stats["clo"], stats["chi"]))
    AV.write_container(
        os.path.join(root, "metadata", "mm1.avro"),
        _MANIFEST_SCHEMA_METRICS,
        entries,
    )
    AV.write_container(
        os.path.join(root, "metadata", "msnap-1.avro"),
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "metadata/mm1.avro",
                "manifest_length": os.path.getsize(
                    os.path.join(root, "metadata", "mm1.avro")
                ),
                "partition_spec_id": 0,
                "added_snapshot_id": 3001,
            }
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "spark-graft-iceberg-metrics-fixture",
        "location": root,
        "current-snapshot-id": 3001,
        "snapshots": [
            {
                "snapshot-id": 3001,
                "manifest-list": "metadata/msnap-1.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return bounds_out


_MANIFEST_SCHEMA_TRUNC = json.loads(
    json.dumps(_MANIFEST_SCHEMA).replace(
        '{"name": "lang", "type": ["null", "string"]}',
        '{"name": "nc_trunc", "type": ["null", "long"]}',
    )
)


def write_iceberg_hidden_partition_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> int:
    """One-snapshot table HIDDEN-partitioned by truncate[100] on
    n_chars: the layout key never appears as a data column; the
    partition spec in the metadata records (source n_chars, transform
    truncate[100], partition field nc_trunc) and each manifest entry
    carries its nc_trunc partition value — the reader prunes on a RAW
    n_chars predicate by pushing candidate values through the
    transform. Returns the number of files written."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    ).withColumn("pv", F.col("n_chars") - F.col("n_chars") % 100)
    # driver-ok: one row per truncate[100] bucket of n_chars — bounded
    # by the value domain (document length), never by row count
    pvs = sorted(r[0] for r in slim.select("pv").distinct().collect())
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    entries = []
    for pv in pvs:
        name = f"data/nc={pv}/part.parquet"
        _write_single_parquet(
            slim.filter(F.col("pv") == pv).drop("pv"), root, name
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": 4001,
                "data_file": {
                    "file_path": name,
                    "file_format": "PARQUET",
                    "partition": {"nc_trunc": int(pv)},
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, name)
                    ),
                },
            }
        )
    AV.write_container(
        os.path.join(root, "metadata", "hm1.avro"),
        _MANIFEST_SCHEMA_TRUNC,
        entries,
    )
    AV.write_container(
        os.path.join(root, "metadata", "hsnap-1.avro"),
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "metadata/hm1.avro",
                "manifest_length": os.path.getsize(
                    os.path.join(root, "metadata", "hm1.avro")
                ),
                "partition_spec_id": 0,
                "added_snapshot_id": 4001,
            }
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "spark-graft-iceberg-hidden-partition",
        "location": root,
        "current-snapshot-id": 4001,
        "default-spec-id": 0,
        "partition-specs": [
            {
                "spec-id": 0,
                "fields": [
                    {
                        "name": "nc_trunc",
                        "transform": "truncate[100]",
                        "source-name": "n_chars",
                        "field-id": 1000,
                    }
                ],
            }
        ],
        "snapshots": [
            {
                "snapshot-id": 4001,
                "manifest-list": "metadata/hsnap-1.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return len(pvs)


# ---------------------------------------------------------------------------
# write-side interop: the engine's MERGE committing Iceberg snapshots
# ---------------------------------------------------------------------------


#: Spark simpleString -> Iceberg primitive (write-side twin of
#: _ICEBERG_TYPES; anything unlisted passes through unchanged)
_SPARK_TO_ICEBERG = {
    "bigint": "long",
    "int": "int",
    "smallint": "int",
    "tinyint": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}


def _export_schema(merged: DataFrame, meta: dict | None) -> dict:
    """Iceberg schema for the export commit: field ids are reused by
    NAME from the table's current schema (id stability across commits
    is what makes renames/evolution safe); new columns get fresh ids."""
    prev_fields: dict[str, int] = {}
    max_id = 0
    prev_schema = None
    if meta is not None:
        prev_schema = _table_schema(meta, None)
        if prev_schema:
            for f in prev_schema["fields"]:
                prev_fields[f["name"]] = f["id"]
                max_id = max(max_id, f["id"])
    fields = []
    for sf_field in merged.schema.fields:
        fid = prev_fields.get(sf_field.name)
        if fid is None:
            max_id += 1
            fid = max_id
        typ = sf_field.dataType.simpleString()
        fields.append(
            {
                "id": fid,
                "name": sf_field.name,
                "type": _SPARK_TO_ICEBERG.get(typ, typ),
                "required": False,
            }
        )
    schema_id = 0
    if prev_schema is not None:
        schema_id = prev_schema.get("schema-id", 0)
        if fields != prev_schema["fields"]:
            schema_id += 1  # evolution commit gets a fresh schema id
    return {"schema-id": schema_id, "type": "struct", "fields": fields}


def export_merge_to_iceberg(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
) -> int:
    """MERGE ``updates`` into the Iceberg table at ``root`` (creating
    it on first call) and commit the result as the next snapshot:
    write the merged state as a fresh data file, emit one manifest
    ADDING it plus one manifest marking the superseded files DELETED,
    reference both from a new Avro manifest list, and publish a new
    ``vN.metadata.json`` whose snapshot list RETAINS history (so
    snapshot-id time travel keeps working). Returns the snapshot id.

    Update-all MERGE semantics identical to the Delta exporter and the
    native upsert: matched keys take the incoming row, new keys insert,
    untouched rows survive."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    try:
        meta = current_metadata(root)
    except FileNotFoundError:
        meta = None
    if meta is not None:
        # prev_files = the data files this commit marks DELETED; the
        # merge TARGET must come through the delete-applying resolver,
        # else a MERGE chained after an equality/positional delete
        # would resurrect the deleted rows into the compacted file.
        prev_files, _ = snapshot_files(root)
        target = read_iceberg_resolved(spark, root)
        keys = updates.select(key).distinct()
        # allowMissingColumns: a schema-widening MERGE (updates carry
        # new columns) back-fills survivors with NULLs — the add-column
        # evolution path; the commit then publishes the widened schema.
        merged = target.join(keys, key, "left_anti").unionByName(
            updates, allowMissingColumns=True
        )
        snap_id = meta["current-snapshot-id"] + 1
        snapshots = list(meta["snapshots"])
    else:
        prev_files = []
        merged = updates
        snap_id, snapshots = 1001, []
    schema = _export_schema(merged, meta)
    # stamp field ids into the parquet footers so readers resolve by id;
    # the enabling conf is session-global, so save/restore it around the
    # write — unrelated writes in the same session keep their footers
    prior_conf = spark.conf.get(
        "spark.sql.parquet.fieldId.write.enabled", None
    )
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try:
        stamped = merged
        for f in schema["fields"]:
            stamped = stamped.withMetadata(
                f["name"], {"parquet.field.id": f["id"]}
            )
        name = f"data/part-{snap_id}.parquet"
        _write_single_parquet(stamped, root, name)
    finally:
        if prior_conf is None:
            spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
        else:
            spark.conf.set(
                "spark.sql.parquet.fieldId.write.enabled", prior_conf
            )

    def _entry(status: int, path: str) -> dict:
        full = os.path.join(root, path)
        return {
            "status": status,
            "snapshot_id": snap_id,
            "data_file": {
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {"lang": None},
                "record_count": 0,
                "file_size_in_bytes": (
                    os.path.getsize(full) if os.path.exists(full) else 0
                ),
            },
        }

    manifests = []
    m_add = f"m-{snap_id}-add.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_add),
        _MANIFEST_SCHEMA,
        [_entry(1, name)],
    )
    manifests.append(m_add)
    if prev_files:
        m_del = f"m-{snap_id}-del.avro"
        AV.write_container(
            os.path.join(root, "metadata", m_del),
            _MANIFEST_SCHEMA,
            [_entry(2, os.path.relpath(f, root)) for f in prev_files],
        )
        manifests.append(m_del)
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"metadata/{m}",
                "manifest_length": os.path.getsize(
                    os.path.join(root, "metadata", m)
                ),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
            }
            for m in manifests
        ],
    )
    snapshots.append(
        {
            "snapshot-id": snap_id,
            "schema-id": schema["schema-id"],
            "manifest-list": f"metadata/{mlist}",
            "summary": {"operation": "overwrite" if prev_files else "append"},
        }
    )
    prev_schemas = list((meta or {}).get("schemas") or [])
    if not any(
        s.get("schema-id") == schema["schema-id"] for s in prev_schemas
    ):
        prev_schemas.append(schema)
    new_meta = {
        "format-version": 2,
        "table-uuid": "spark-graft-iceberg-export",
        "location": root,
        "current-snapshot-id": snap_id,
        "current-schema-id": schema["schema-id"],
        "schemas": prev_schemas,
        "snapshots": snapshots,
    }
    _write_metadata_exclusive(root, new_meta)
    return snap_id


def rollback_to_snapshot(root: str, snapshot_id: int) -> int:
    """Roll the table back to ``snapshot_id`` — in Iceberg this is a
    pure METADATA operation: publish a new vN.metadata.json whose
    current-snapshot-id points at the older snapshot (history retained,
    nothing moved or rewritten; the rolled-back-over snapshots stay
    time-travelable until expiry). Returns the new metadata version."""
    meta = current_metadata(root)
    if snapshot_id not in {s["snapshot-id"] for s in meta["snapshots"]}:
        raise ValueError(f"snapshot {snapshot_id} not in history")
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snapshot_id
    return _write_metadata_exclusive(root, new_meta)


def expire_snapshots(root: str, keep_last: int = 1) -> list[str]:
    """The spec's expireSnapshots maintenance action: drop all but the
    last ``keep_last`` snapshots from the table metadata (publishing a
    new vN.metadata.json — history trimming is itself a metadata
    commit) and physically delete data files and manifest/manifest-list
    Avro files reachable ONLY from expired snapshots. Returns the
    deleted table-relative paths. Time travel into expired snapshots
    raises afterwards; retained snapshots are untouched.

    The snapshot referenced by ``current-snapshot-id`` is ALWAYS part of
    the retained set, mirroring real Iceberg (expireSnapshots never
    expires the current snapshot): after :func:`rollback_to_snapshot`
    the current snapshot may sit outside the tail, and dropping it
    would physically delete live data files — unrecoverable loss plus
    KeyError on the next read."""
    meta = current_metadata(root)
    snapshots = meta["snapshots"]
    retained = list(snapshots[-keep_last:])
    # pinned set: the current snapshot (never expirable) plus every
    # snapshot referenced by a tag/branch ref — the spec's ref-aware
    # retention (a tagged audit snapshot survives expiry by name)
    pinned = {meta.get("current-snapshot-id")}
    for ref in (meta.get("refs") or {}).values():
        pinned.add(ref.get("snapshot-id"))
    pinned.discard(None)
    retained_ids = {s["snapshot-id"] for s in retained}
    missing = sorted(pinned - retained_ids)
    if missing:
        by_id = {s["snapshot-id"]: s for s in snapshots}
        unknown = [i for i in missing if i not in by_id]
        if unknown:
            raise ValueError(
                f"pinned snapshots {unknown} not in snapshot history"
            )
        # keep history ordering: pinned predecessors precede the tail
        retained = [by_id[i] for i in missing] + retained
    keep: set[str] = set()
    for s in retained:
        mlist = s["manifest-list"]
        keep.add(os.path.normpath(mlist))
        _, manifests = AV.read_container(_resolve(root, mlist))
        for m in manifests:
            keep.add(os.path.normpath(m["manifest_path"]))
        # pin files LIVE in this snapshot (data + delete files); files
        # marked DELETED in every retained snapshot are reclaimable —
        # readers only ever open live files
        data, dels = snapshot_files_v2(root, s["snapshot-id"])
        for f in data + dels:
            keep.add(os.path.normpath(os.path.relpath(f, root)))
    deleted: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        for fn in filenames:
            if not (fn.endswith(".parquet") or fn.endswith(".avro")):
                continue
            rel = os.path.normpath(
                os.path.relpath(os.path.join(dirpath, fn), root)
            )
            if rel not in keep:
                os.remove(os.path.join(dirpath, fn))
                deleted.append(rel)
    new_meta = dict(meta)
    new_meta["snapshots"] = retained
    _write_metadata_exclusive(root, new_meta)
    return sorted(deleted)


def _local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """createDataFrame over ONE slice: the default path parallelizes a
    driver-local list over defaultParallelism, and for manifest-scale
    metadata rows that costs 32 near-empty tasks per call (r11 profile:
    five ~7.7 CPU-s stages in storage_iceberg_metadata_tables, all task
    overhead). Metadata relations are file-count-sized by construction,
    so one slice is the right layout at any scale.
    Classic-session only — see tables.local_df for the Spark Connect
    caveat and fallback."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def iceberg_metadata_table(
    spark: SparkSession,
    root: str,
    kind: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Iceberg INSPECTION TABLES — the spec's queryable metadata
    relations (``table$snapshots``, ``$files``, ``$manifests``,
    ``$history``, ``$refs``) as DataFrames, so operational queries
    ("which files back this partition?", "when did snapshot X land?")
    run through the same engine as data queries.

    Scale: every relation here is MANIFEST-scale, not row-scale — the
    files table has one row per live data file, never per data row, so
    materializing from the driver mirrors what production engines do
    when they plan a scan (read the manifest list + manifests)."""
    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    if kind == "snapshots":
        rows = [
            (
                s["snapshot-id"],
                (s.get("summary") or {}).get("operation"),
                s["manifest-list"],
            )
            for s in meta.get("snapshots", [])
        ]
        return _local_df(spark, 
            rows, "snapshot_id long, operation string, manifest_list string"
        )
    if kind == "history":
        cur = meta.get("current-snapshot-id")
        rows = [
            (i, s["snapshot-id"], s["snapshot-id"] == cur)
            for i, s in enumerate(meta.get("snapshots", []))
        ]
        return _local_df(spark, 
            rows, "ordinal int, snapshot_id long, is_current boolean"
        )
    if kind == "refs":
        rows = [
            (name, r.get("type"), r.get("snapshot-id"))
            for name, r in sorted((meta.get("refs") or {}).items())
        ]
        return _local_df(spark, 
            rows, "name string, type string, snapshot_id long"
        )
    if kind not in ("files", "manifests", "partitions"):
        raise ValueError(
            f"unknown metadata table {kind!r} "
            "(supported: snapshots, history, refs, files, manifests, "
            "partitions)"
        )
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in {sorted(snaps)} for {root}"
        )
    _, manifests = AV.read_container(
        _resolve(root, snaps[snapshot_id]["manifest-list"])
    )
    if kind == "manifests":
        rows = [
            (
                m["manifest_path"],
                m.get("manifest_length", 0),
                m.get("partition_spec_id", 0),
                m.get("content", 0),
            )
            for m in manifests
        ]
        return _local_df(spark, 
            rows, "path string, length long, partition_spec_id int, "
            "content int"
        )
    rows = []
    for m in manifests:
        if m.get("content", 0) == 1:
            continue  # delete manifests are not data files
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            d = e["data_file"]
            part = d.get("partition") or {}
            rows.append(
                (
                    d["file_path"],
                    json.dumps(
                        {k: part[k] for k in sorted(part)}, default=str
                    ),
                    int(d.get("record_count") or 0),
                    int(d.get("file_size_in_bytes") or 0),
                    m["manifest_path"],
                )
            )
    if kind == "partitions":
        agg: dict[str, list[int]] = {}
        for _, part, n, size, _m in rows:
            cur = agg.setdefault(part, [0, 0, 0])
            cur[0] += 1
            cur[1] += n
            cur[2] += size
        return _local_df(spark, 
            [(p, c[0], c[1], c[2]) for p, c in sorted(agg.items())],
            "partition string, n_files long, record_count long, "
            "file_size_in_bytes long",
        )
    return _local_df(spark, 
        sorted(rows),
        "file_path string, partition string, record_count long, "
        "file_size_in_bytes long, manifest string",
    )


def read_iceberg_incremental(
    spark: SparkSession,
    root: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Incremental append scan: rows ADDED by snapshots in
    ``(from_snapshot, to_snapshot]`` — the spec's incremental read
    (manifest entries with status ADDED whose snapshot_id falls in the
    range), tagged with ``_snapshot_id``. This is how a downstream
    consumer tails an Iceberg table without diffing snapshots; rewrite
    snapshots surface their replacement files (the adds), never the
    dropped ones."""
    from pyspark.sql import functions as F

    meta = current_metadata(root)
    if to_snapshot is None:
        to_snapshot = meta["current-snapshot-id"]
    snap_ids = [s["snapshot-id"] for s in meta["snapshots"]]
    wanted = [
        s for s in snap_ids if from_snapshot < s <= to_snapshot
    ]
    if not wanted:
        raise ValueError(
            f"no snapshots in ({from_snapshot}, {to_snapshot}] at {root}"
        )
    out: DataFrame | None = None
    for sid in wanted:
        snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
        _, manifests = AV.read_container(
            _resolve(root, snaps[sid]["manifest-list"])
        )
        added: list[str] = []
        for m in manifests:
            if m.get("content", 0) == 1:
                continue
            _, entries = AV.read_container(
                _resolve(root, m["manifest_path"])
            )
            for e in entries:
                if e["status"] == 1 and e.get("snapshot_id") == sid:
                    added.append(
                        _resolve(root, e["data_file"]["file_path"])
                    )
        if not added:
            continue
        part = spark.read.parquet(*sorted(added)).withColumn(
            "_snapshot_id", F.lit(sid).cast("bigint")
        )
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    if out is None:
        raise ValueError(
            f"no appended files in ({from_snapshot}, {to_snapshot}]"
        )
    return out


# ---------------------------------------------------------------------------
# format v2 merge-on-read: equality-delete files
# ---------------------------------------------------------------------------

#: manifest-list entry schema carrying the spec's ``content`` field
#: (0 = data manifests, 1 = delete manifests)
_MANIFEST_LIST_SCHEMA_V2 = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def snapshot_files_v2(
    root: str, snapshot_id: int | None = None
) -> tuple[list[str], list[str]]:
    """(data_files, equality_delete_files) live at the snapshot — the
    format-v2 resolution where delete manifests (content=1) ride the
    same manifest list as data manifests (content=0)."""
    data, deletes = snapshot_entries_v2(root, snapshot_id)
    return sorted(p for p, _ in data), sorted(p for p, _ in deletes)


def snapshot_entries_v2(
    root: str, snapshot_id: int | None = None
) -> tuple[list[tuple[str, int | None]], list[tuple[str, int | None]]]:
    """Live (path, sequence_number) pairs at the snapshot, split into
    data vs delete files. Sequence numbers follow the spec's
    inheritance rule: an entry's explicit ``sequence_number`` when
    recorded, else the id of the snapshot that ADDED it (this module
    commits exactly one snapshot per sequence number with monotone ids,
    so the committing snapshot's id IS the assigned data sequence
    number), else the manifest-list's ``added_snapshot_id``. ``None``
    when nothing is recorded — callers must then fall back to unscoped
    delete application (the conservative legacy behavior for foreign
    pre-v2 metadata)."""
    meta = current_metadata(root)
    _check_format_version(meta)
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in {sorted(snaps)} for {root}"
        )
    _, manifests = AV.read_container(
        _resolve(root, snaps[snapshot_id]["manifest-list"])
    )
    data: list[tuple[str, int | None]] = []
    deletes: list[tuple[str, int | None]] = []
    for m in manifests:
        bucket = deletes if m.get("content", 0) == 1 else data
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            seq = e.get("sequence_number")
            if seq is None:
                seq = e.get("snapshot_id")
            if seq is None:
                seq = m.get("added_snapshot_id")
            bucket.append(
                (_resolve(root, e["data_file"]["file_path"]), seq)
            )
    data.sort()
    deletes.sort()
    return data, deletes


def read_iceberg_merge_on_read(
    spark: SparkSession,
    root: str,
    equality_field: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Snapshot read applying equality-delete files — Iceberg v2
    merge-on-read: data files are NOT rewritten on delete; the reader
    anti-joins the delete files' key column at scan time (at 100 TB the
    delete side is tiny and broadcast, exactly the MERGE-on-read cost
    model that makes frequent deletes affordable)."""
    data, deletes = snapshot_files_v2(root, snapshot_id)
    df = spark.read.parquet(*data)
    if not deletes:
        return df
    dels = spark.read.parquet(*deletes).select(equality_field).distinct()
    return df.join(dels, equality_field, "left_anti")


def _classify_deletes(
    deletes: list[str],
) -> tuple[list[str], dict[tuple, list[str]]]:
    """Split delete files into positional (schema exactly the spec's
    ``(file_path, pos)``) vs equality groups keyed by their own column
    tuple — footer-only reads, metadata-scale."""
    import pyarrow.parquet as pq

    pos_files: list[str] = []
    eq_groups: dict[tuple, list[str]] = {}
    for f in deletes:
        names = tuple(sorted(pq.read_schema(f).names))
        if names == ("file_path", "pos"):
            pos_files.append(f)
        else:
            eq_groups.setdefault(names, []).append(f)
    return pos_files, eq_groups


def read_iceberg_resolved(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Live rows of the snapshot with ALL v2 delete files applied —
    positional deletes (delete files whose columns are exactly the
    spec's ``(file_path, pos)``) through the parquet metadata-identity
    anti-join, equality deletes through an anti-join on the delete
    file's own key columns (the file schema IS the equality spec, so no
    caller-supplied field name is needed). Internal reads that chain
    commits (the MERGE exporter's previous-state load, a second delete)
    MUST use this resolver — resolving through raw data files would
    resurrect deleted rows.

    Delete application is SEQUENCE-NUMBER SCOPED per the spec: an
    equality delete file applies only to data files with STRICTLY lower
    sequence numbers, a positional delete to data files with lower-or-
    equal numbers — so a key appended AFTER an equality delete is never
    wrongly dropped in a snapshot where both files are live. Entries
    without any recorded sequence information fall back to unscoped
    application (conservative legacy behavior for foreign metadata)."""
    df = _resolved_with_position(spark, root, snapshot_id)
    return df.drop("__file", "__pos", "__seq")


def _resolved_with_position(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Core of :func:`read_iceberg_resolved` retaining the ``__file`` /
    ``__pos`` identity columns (and ``__seq`` when scoping is active) —
    shared with :func:`append_positional_delete`, whose new delete
    records are positions over LIVE rows only."""
    from pyspark.sql import functions as F

    data_entries, delete_entries = snapshot_entries_v2(root, snapshot_id)
    data = [p for p, _ in data_entries]
    delete_seq = {p: s for p, s in delete_entries}
    pos_files, eq_groups = _classify_deletes([p for p, _ in delete_entries])
    scoped = all(s is not None for _, s in data_entries) and all(
        s is not None for _, s in delete_entries
    )
    df = _with_position(spark, root, data)
    if scoped and delete_entries:
        seq_rows = [
            (os.path.relpath(p, root), int(s)) for p, s in data_entries
        ]
        seq_df = F.broadcast(
            _local_df(spark, seq_rows, "__sf string, __seq long")
        )
        df = df.join(seq_df, df["__file"] == seq_df["__sf"], "left").drop(
            "__sf"
        )
    else:
        df = df.withColumn("__seq", F.lit(None).cast("long"))

    def _tagged(files: list[str], cols) -> DataFrame:
        parts = []
        for f in files:
            d = spark.read.parquet(f).select(*cols)
            s = delete_seq.get(f)
            parts.append(
                d.withColumn(
                    "__dseq",
                    F.lit(int(s) if scoped and s is not None else None).cast(
                        "long"
                    ),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    if pos_files:
        dels = _tagged(pos_files, ["file_path", "pos"])
        cond = (df["__file"] == dels["file_path"]) & (
            df["__pos"] == dels["pos"]
        )
        if scoped:
            # spec: position deletes apply to data files with
            # data_seq <= delete_seq
            cond = cond & (df["__seq"] <= dels["__dseq"])
        df = df.join(dels, cond, "left_anti")
    for names in sorted(eq_groups):
        # a row is dropped iff SOME delete file carries its key with a
        # higher sequence number — i.e. data_seq < max(del_seq) per key
        keys = (
            _tagged(eq_groups[names], list(names))
            .groupBy(*names)
            .agg(F.max("__dseq").alias("__dseq"))
        )
        cond = None
        for c in names:
            eq = df[c].eqNullSafe(keys[c])
            cond = eq if cond is None else cond & eq
        if scoped:
            # spec: equality deletes apply only to data files with
            # STRICTLY lower sequence numbers
            cond = cond & (df["__seq"] < keys["__dseq"])
        df = df.join(keys, cond, "left_anti")
    return df


def append_data_file(
    spark: SparkSession, root: str, rows: DataFrame
) -> int:
    """Commit a fast-append snapshot: one new data file + one content=0
    manifest, previous manifests re-referenced untouched (the spec's
    append operation — no rewrite, no delete-manifest drop). The new
    entry's snapshot id IS its data sequence number, so a row appended
    after an equality delete of the same key survives sequence-scoped
    resolution (read_iceberg_resolved): the delete only applies to
    strictly OLDER data files."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    meta = current_metadata(root)
    _check_format_version(meta)
    prev = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, prev_manifests = AV.read_container(
        _resolve(root, snaps[prev]["manifest-list"])
    )
    snap_id = prev + 1
    name = f"data/append-{snap_id}.parquet"
    _write_single_parquet(rows, root, name)
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(root, name)).num_rows
    m_add = f"m-{snap_id}-append.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_add),
        _MANIFEST_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": name,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, name)
                    ),
                },
            }
        ],
    )
    mlist_entries = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "added_snapshot_id": m.get("added_snapshot_id"),
        }
        for m in prev_manifests
    ] + [
        {
            "manifest_path": f"metadata/{m_add}",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", m_add)
            ),
            "partition_spec_id": 0,
            "content": 0,
            "added_snapshot_id": snap_id,
        }
    ]
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA_V2,
        mlist_entries,
    )
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {
                "operation": "append",
                "added-data-files": "1",
                "added-records": str(n_rows),
            },
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return snap_id


def append_batch_to_iceberg(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    app_id: str,
    batch_id: int,
) -> bool:
    """Streaming-sink append: commit one micro-batch as one fast-append
    snapshot whose SUMMARY carries (streaming-app-id,
    streaming-batch-id) — the Iceberg idiom for exactly-once streaming
    writes (production engines record the checkpointed batch id in the
    snapshot summary and skip replays). A batch id at or below the
    app's last recorded id is skipped BEFORE writing anything and the
    call returns False. Creates the table on the first batch. The
    Iceberg twin of deltalog.append_batch_to_delta's txn guard."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    meta_dir = os.path.join(root, "metadata")
    have_meta = os.path.isdir(meta_dir) and any(
        n.startswith("v") and n.endswith(".metadata.json")
        for n in os.listdir(meta_dir)
    )
    if have_meta:
        meta = current_metadata(root)
        _check_format_version(meta)
        last = max(
            (
                int(s["summary"]["streaming-batch-id"])
                for s in meta.get("snapshots", [])
                if (s.get("summary") or {}).get("streaming-app-id") == app_id
            ),
            default=None,
        )
        if last is not None and batch_id <= last:
            return False
        prev = meta["current-snapshot-id"]
        snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
        _, prev_manifests = AV.read_container(
            _resolve(root, snaps[prev]["manifest-list"])
        )
        snap_id = prev + 1
    else:
        os.makedirs(meta_dir, exist_ok=True)
        meta = {
            "format-version": 2,
            "table-uuid": "spark-graft-iceberg-stream-sink",
            "location": root,
            "snapshots": [],
        }
        prev_manifests = []
        snap_id = 6001
    name = f"data/stream-{snap_id}.parquet"
    _write_single_parquet(batch_df, root, name)
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(root, name)).num_rows
    m_add = f"m-stream-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_add),
        _MANIFEST_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": name,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, name)
                    ),
                },
            }
        ],
    )
    mlist_entries = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "added_snapshot_id": m.get("added_snapshot_id"),
        }
        for m in prev_manifests
    ] + [
        {
            "manifest_path": f"metadata/{m_add}",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", m_add)
            ),
            "partition_spec_id": 0,
            "content": 0,
            "added_snapshot_id": snap_id,
        }
    ]
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA_V2,
        mlist_entries,
    )
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta.get("snapshots", [])) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {
                "operation": "append",
                "streaming-app-id": app_id,
                "streaming-batch-id": str(batch_id),
                "added-data-files": "1",
                "added-records": str(n_rows),
            },
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return True


def append_equality_delete(
    spark: SparkSession,
    root: str,
    delete_keys: DataFrame,
    equality_field: str,
) -> int:
    """Commit a new snapshot whose ONLY change is an equality-delete
    file (merge-on-read DELETE: zero data files touched). The new
    manifest list re-references the previous snapshot's data manifests
    (content=0) and adds one delete manifest (content=1)."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    meta = current_metadata(root)
    prev = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, prev_manifests = AV.read_container(
        _resolve(root, snaps[prev]["manifest-list"])
    )
    snap_id = prev + 1
    name = f"data/eqdel-{snap_id}.parquet"
    _write_single_parquet(
        delete_keys.select(equality_field).distinct(), root, name
    )
    m_del = f"m-{snap_id}-eqdel.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_del),
        _MANIFEST_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": name,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": 0,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, name)
                    ),
                },
            }
        ],
    )
    mlist_entries = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "added_snapshot_id": m.get("added_snapshot_id"),
        }
        for m in prev_manifests
    ] + [
        {
            "manifest_path": f"metadata/{m_del}",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", m_del)
            ),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snap_id,
        }
    ]
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA_V2,
        mlist_entries,
    )
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {"operation": "delete"},
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return snap_id


# ---------------------------------------------------------------------------
# format v2 merge-on-read: positional delete files
# ---------------------------------------------------------------------------


def _with_position(spark: SparkSession, root: str, data_files: list[str]):
    """Data read annotated with the spec's positional identity: the
    table-relative data-file path and the physical row ordinal — both
    straight from the parquet reader's metadata columns
    (``_metadata.file_path`` / ``_metadata.row_index``), so positions
    are real file ordinals, not synthesized ranks, and the read stays
    one distributed scan."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(*data_files)
    # Strip the root by plain prefix arithmetic, never by interpolating
    # the path into a regex — a root containing regex metacharacters
    # (., +, [, ( are routine in tmp dirs) would silently mis-strip and
    # record non-table-relative file_path values in delete files.
    p = F.regexp_replace(F.col("_metadata.file_path"), "^file:", "")
    prefix = root.rstrip("/") + "/"
    rel = F.when(
        p.startswith(F.lit(prefix)), F.substring(p, len(prefix) + 1, 1 << 20)
    ).otherwise(p)
    return df.select(
        "*",
        rel.alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )


def append_positional_delete(
    spark: SparkSession, root: str, condition
) -> tuple[int, int]:
    """Commit a merge-on-read positional DELETE: rows of the CURRENT
    snapshot matching ``condition`` become (file_path, pos) records in
    one delete file + a content=1 manifest; zero data files rewritten.
    Returns (snapshot_id, n_deleted_positions)."""
    from pyspark.sql import functions as F

    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    meta = current_metadata(root)
    prev = meta["current-snapshot-id"]
    # Positions are computed over LIVE rows only: resolve the previous
    # snapshot's delete files first (sequence-number scoped, via the
    # shared resolver), so a chained second delete never re-records
    # (and re-counts) rows an earlier equality/positional delete
    # already removed.
    live = _resolved_with_position(spark, root, prev)
    positions = (
        live.filter(condition)
        .select(
            F.col("__file").alias("file_path"),
            F.col("__pos").alias("pos"),
        )
    )
    n_del = positions.count()
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, prev_manifests = AV.read_container(
        _resolve(root, snaps[prev]["manifest-list"])
    )
    snap_id = prev + 1
    name = f"data/posdel-{snap_id}.parquet"
    _write_single_parquet(positions, root, name)
    m_del = f"m-{snap_id}-posdel.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_del),
        _MANIFEST_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "file_path": name,
                    "file_format": "PARQUET",
                    "partition": {"lang": None},
                    "record_count": n_del,
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, name)
                    ),
                },
            }
        ],
    )
    mlist_entries = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "added_snapshot_id": m.get("added_snapshot_id"),
        }
        for m in prev_manifests
    ] + [
        {
            "manifest_path": f"metadata/{m_del}",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", m_del)
            ),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snap_id,
        }
    ]
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA_V2,
        mlist_entries,
    )
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {"operation": "delete"},
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return snap_id, n_del


def read_iceberg_positional(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Snapshot read applying positional-delete files: one distributed
    scan with the parquet reader's (file, row_index) identity columns,
    anti-joined against the delete files — no data rewritten, no
    per-file driver loop."""
    data, deletes = snapshot_files_v2(root, snapshot_id)
    df = _with_position(spark, root, data)
    if deletes:
        dels = spark.read.parquet(*deletes).select(
            "file_path", "pos"
        )
        df = df.join(
            dels,
            (df["__file"] == dels["file_path"])
            & (df["__pos"] == dels["pos"]),
            "left_anti",
        )
    return df.drop("__file", "__pos")


# ---------------------------------------------------------------------------
# format v3: deletion vectors in Puffin files
# (clean-room from the public Iceberg v3 spec "Deletion vectors" + the
# Puffin file-format spec; the bitmap body is the same 64-bit
# RoaringBitmapArray serialization Delta uses, so the codec is shared
# with operators/deltalog.py)
# ---------------------------------------------------------------------------

_PUFFIN_MAGIC = b"PFA1"


def _puffin_write(
    path: str, blobs: list[tuple[str, bytes, dict]]
) -> list[dict]:
    """Write a Puffin file: 4-byte magic, blobs back-to-back, then the
    footer (magic + JSON payload + 4-byte LE payload size + 4-byte
    flags + magic). Returns the footer's blob descriptors — each
    carries the blob's absolute ``offset``/``length``, which manifest
    entries reference directly as content_offset/content_size_in_bytes
    (readers never need the footer on the hot path)."""
    descs: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(_PUFFIN_MAGIC)
        off = len(_PUFFIN_MAGIC)
        for typ, data, props in blobs:
            fh.write(data)
            descs.append(
                {
                    "type": typ,
                    "fields": [],
                    "offset": off,
                    "length": len(data),
                    "properties": props or {},
                }
            )
            off += len(data)
        payload = json.dumps({"blobs": descs, "properties": {}}).encode(
            "utf-8"
        )
        fh.write(_PUFFIN_MAGIC)
        fh.write(payload)
        fh.write(len(payload).to_bytes(4, "little"))
        fh.write((0).to_bytes(4, "little"))  # flags: uncompressed footer
        fh.write(_PUFFIN_MAGIC)
    return descs


def _puffin_footer(path: str) -> dict:
    """Parse + validate a Puffin footer -> its JSON payload."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[:4] != _PUFFIN_MAGIC or raw[-4:] != _PUFFIN_MAGIC:
        raise ValueError(f"not a Puffin file: {path}")
    size = int.from_bytes(raw[-12:-8], "little")
    payload = raw[-12 - size : -12]
    head = raw[-12 - size - 4 : -12 - size]
    if head != _PUFFIN_MAGIC:
        raise ValueError(f"corrupt Puffin footer in {path}")
    return json.loads(payload.decode("utf-8"))


#: KMV hash denominator: 15 md5 hex chars = uniform integer < 16^15
_KMV_DEN = float(16**15)


def publish_puffin_statistics(
    root: str, minima: dict[str, list[int]], k: int
) -> str:
    """Publish a table STATISTICS FILE (the spec's ``statistics``
    metadata list): one Puffin blob per column holding its KMV
    bottom-``k`` integer hashes (8-byte BE each), with the spec's
    ``ndv`` blob property carrying the estimate planners read without
    touching blob bytes. Registration appends to ``statistics`` in a
    new metadata version; republishing the same snapshot's stats is a
    no-op. Pure metadata — kilobytes regardless of table size."""
    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    snap = meta["current-snapshot-id"]
    name = f"metadata/stats-{snap}.puffin"
    blobs = []
    for col, vals in sorted(minima.items()):
        # KMV contract: the estimator is valid only on the k SMALLEST
        # hashes — truncate a longer input instead of silently deflating
        # the NDV ((k-1)/kth-min grows as extra larger hashes push
        # vals[-1] up).
        vals = sorted(int(v) for v in vals)[:k]
        data = b"".join(v.to_bytes(8, "big") for v in vals)
        n = len(vals)
        est = float(n) if n < k else (k - 1) / (vals[-1] / _KMV_DEN)
        blobs.append(
            (
                "kmv-sketch-v1",
                data,
                {"column": col, "ndv": str(int(round(est)))},
            )
        )
    descs = _puffin_write(_resolve(root, name), blobs)
    if any(
        s.get("statistics-path") == name
        for s in meta.get("statistics", [])
    ):
        return name
    new_meta = dict(meta)
    new_meta["statistics"] = list(meta.get("statistics", [])) + [
        {
            "snapshot-id": snap,
            "statistics-path": name,
            "file-size-in-bytes": os.path.getsize(_resolve(root, name)),
            "file-footer-size-in-bytes": 0,
            "blob-metadata": descs,
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return name


def publish_partition_statistics(root: str) -> str:
    """Publish the spec's PARTITION STATISTICS FILE for the current
    snapshot: one parquet row per partition with data-file and record
    counts (aggregated from the manifests), registered under
    ``partition-statistics`` in a new metadata version. Planners read
    this instead of walking manifests for per-partition sizing.
    Republishing the same snapshot's stats is a no-op. Metadata-scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    snap = meta["current-snapshot-id"]
    name = f"metadata/partition-stats-{snap}.parquet"
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, manifests = AV.read_container(
        _resolve(root, snaps[snap]["manifest-list"])
    )
    agg: dict[str, list[int]] = {}
    for m in manifests:
        if m.get("content", 0) == 1:
            continue
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            d = e["data_file"]
            part = d.get("partition") or {}
            key = json.dumps({k: part[k] for k in sorted(part)}, default=str)
            cur = agg.setdefault(key, [0, 0, 0])
            cur[0] += 1
            cur[1] += int(d.get("record_count") or 0)
            cur[2] += int(d.get("file_size_in_bytes") or 0)
    rows = sorted(agg.items())
    table = pa.table(
        {
            "partition": [k for k, _ in rows],
            "data_file_count": [v[0] for _, v in rows],
            "record_count": [v[1] for _, v in rows],
            "total_data_file_size_in_bytes": [v[2] for _, v in rows],
        }
    )
    pq.write_table(table, _resolve(root, name))
    if any(
        s.get("statistics-path") == name
        for s in meta.get("partition-statistics", [])
    ):
        return name
    new_meta = dict(meta)
    new_meta["partition-statistics"] = list(
        meta.get("partition-statistics", [])
    ) + [
        {
            "snapshot-id": snap,
            "statistics-path": name,
            "file-size-in-bytes": os.path.getsize(_resolve(root, name)),
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return name


def read_partition_statistics(spark: SparkSession, root: str) -> DataFrame:
    """The registered partition-statistics file(s) as a DataFrame,
    tagged with their snapshot id."""
    from functools import reduce

    from pyspark.sql import functions as F

    meta = current_metadata(root)
    entries = meta.get("partition-statistics", [])
    if not entries:
        raise ValueError(f"no partition statistics registered at {root}")
    parts = [
        spark.read.parquet(_resolve(root, s["statistics-path"])).select(
            "*", F.lit(s["snapshot-id"]).cast("long").alias("snapshot_id")
        )
        for s in entries
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def read_table_statistics(root: str, k: int) -> list[dict]:
    """Read back the registered statistics files: per column, the ndv
    PROPERTY (what a planner consumes) and the estimate RE-DERIVED
    from the blob's bottom-k hashes — proving the bytes round-trip,
    not just the metadata."""
    meta = current_metadata(root)
    out: list[dict] = []
    for s in meta.get("statistics", []):
        path = _resolve(root, s["statistics-path"])
        foot = _puffin_footer(path)
        with open(path, "rb") as fh:
            raw = fh.read()
        for b in foot["blobs"]:
            data = raw[b["offset"] : b["offset"] + b["length"]]
            vals = sorted(
                int.from_bytes(data[i : i + 8], "big")
                for i in range(0, len(data), 8)
            )[:k]  # same k-smallest truncation as the publisher
            n = len(vals)
            est = (
                float(n) if n < k else (k - 1) / (vals[-1] / _KMV_DEN)
            )
            out.append(
                {
                    "column": b["properties"]["column"],
                    "ndv_property": int(b["properties"]["ndv"]),
                    "ndv_from_blob": est,
                    "n_minima": n,
                }
            )
    return out


def _dv_blob_encode(indexes: list[int]) -> bytes:
    """Iceberg v3 ``deletion-vector-v1`` blob: 4-byte BE length of
    (magic + vector), the magic-prefixed 64-bit RoaringBitmapArray
    (bit-identical to Delta's serialization — codec shared), and a
    4-byte BE CRC-32 of (magic + vector)."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _roaring_array_serialize,
    )

    vec = _roaring_array_serialize(indexes)  # magic-prefixed
    return (
        len(vec).to_bytes(4, "big")
        + vec
        + zlib.crc32(vec).to_bytes(4, "big")
    )


def _dv_blob_decode(raw: bytes, offset: int, size: int) -> list[int]:
    """Decode a ``deletion-vector-v1`` blob at (offset, size) -> sorted
    deleted row positions; validates length framing and CRC."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _roaring_array_deserialize,
    )

    blob = raw[offset : offset + size]
    ln = int.from_bytes(blob[:4], "big")
    if 4 + ln + 4 != len(blob):
        raise ValueError(
            f"deletion-vector blob framing mismatch: header says {ln}, "
            f"blob is {len(blob)} bytes"
        )
    vec = blob[4 : 4 + ln]
    crc = int.from_bytes(blob[4 + ln : 8 + ln], "big")
    if zlib.crc32(vec) != crc:
        raise ValueError("deletion-vector blob checksum mismatch")
    return _roaring_array_deserialize(vec)


_MANIFEST_SCHEMA_V3 = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "partition",
                            "fields": [
                                {"name": "lang", "type": ["null", "string"]}
                            ],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "referenced_data_file",
                        "type": ["null", "string"],
                    },
                    {"name": "content_offset", "type": ["null", "long"]},
                    {
                        "name": "content_size_in_bytes",
                        "type": ["null", "long"],
                    },
                    {"name": "first_row_id", "type": ["null", "long"]},
                ],
            },
        },
    ],
}


def write_iceberg_v3_dv_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> tuple[int, int]:
    """Format-v3 table whose second snapshot deletes the ``fr`` rows via
    a DELETION VECTOR: one Puffin file holding the positional bitmap of
    the deleted rows, referenced by a content=1 delete manifest whose
    entry carries (referenced_data_file, content_offset,
    content_size_in_bytes) — zero data files rewritten, kilobytes
    committed, the v3 merge-on-read DELETE shape. Returns
    (snapshot_1, snapshot_2)."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    slim = docs.select("doc_id", "lang", "n_chars").orderBy("doc_id")
    data_name = "data/file-0.parquet"
    _write_single_parquet(slim, root, data_name)
    # positions (row ordinals in doc_id order) of the rows the DV kills;
    # bounded by the deleted-row count — the same metadata-scale cost as
    # Delta's DV encode
    # driver-ok: DV encode — deleted positions are protocol metadata
    # (driver-written bitmap), bounded by the deleted-row count
    pos_rows = (
        slim.select(
            F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
            "lang",
        )
        .filter(F.col("lang") == "fr")
        .select((F.col("rn") - 1).alias("pos"))
        .collect()
    )
    positions = sorted(r.pos for r in pos_rows)
    puffin_name = "data/dv-1.puffin"
    blob = _dv_blob_encode(positions)
    descs = _puffin_write(
        os.path.join(root, puffin_name),
        [
            (
                "deletion-vector-v1",
                blob,
                {"referenced-data-file": data_name, "cardinality": str(len(positions))},
            )
        ],
    )

    def _entry(content: int, path: str, n: int, extra: dict | None = None) -> dict:
        full = os.path.join(root, path)
        df_rec = {
            "content": content,
            "file_path": path,
            "file_format": "PUFFIN" if content == 1 else "PARQUET",
            "partition": {"lang": None},
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(full),
            "referenced_data_file": None,
            "content_offset": None,
            "content_size_in_bytes": None,
            "first_row_id": None,
        }
        df_rec.update(extra or {})
        return {"status": 1, "snapshot_id": None, "data_file": df_rec}

    s1, s2 = 3001, 3002
    m_data = "m-3001-data.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_data),
        _MANIFEST_SCHEMA_V3,
        [dict(_entry(0, data_name, 0), snapshot_id=s1)],
    )
    m_dv = "m-3002-dv.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_dv),
        _MANIFEST_SCHEMA_V3,
        [
            dict(
                _entry(
                    1,
                    puffin_name,
                    len(positions),
                    {
                        "referenced_data_file": data_name,
                        "content_offset": descs[0]["offset"],
                        "content_size_in_bytes": descs[0]["length"],
                    },
                ),
                snapshot_id=s2,
            )
        ],
    )

    def _mlist(name: str, entries: list[tuple[str, int, int]]) -> None:
        AV.write_container(
            os.path.join(root, "metadata", name),
            _MANIFEST_LIST_SCHEMA_V2,
            [
                {
                    "manifest_path": f"metadata/{m}",
                    "manifest_length": os.path.getsize(
                        os.path.join(root, "metadata", m)
                    ),
                    "partition_spec_id": 0,
                    "content": c,
                    "added_snapshot_id": snap,
                }
                for m, c, snap in entries
            ],
        )

    _mlist("snap-3001.avro", [(m_data, 0, s1)])
    _mlist("snap-3002.avro", [(m_data, 0, s1), (m_dv, 1, s2)])
    meta = {
        "format-version": 3,
        "table-uuid": "spark-graft-iceberg-v3-dv",
        "location": root,
        "current-snapshot-id": s2,
        "snapshots": [
            {
                "snapshot-id": s1,
                "manifest-list": "metadata/snap-3001.avro",
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": s2,
                "manifest-list": "metadata/snap-3002.avro",
                "summary": {"operation": "delete"},
            },
        ],
    }
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return s1, s2


def read_iceberg_v3(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Snapshot read of a format-v3 table applying Puffin deletion
    vectors: delete manifests' entries point (referenced_data_file,
    content_offset, content_size_in_bytes) into Puffin files; the
    bitmap decode is driver-side metadata-scale (bounded by DV
    cardinality, exactly like the Delta DV path), the apply is one
    distributed anti-join on the scan's (file, row_index) identity. v1
    and v2 tables read fine too (they simply have no DV entries)."""
    from pyspark.sql import functions as F

    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in {sorted(snaps)} for {root}"
        )
    _, manifests = AV.read_container(
        _resolve(root, snaps[snapshot_id]["manifest-list"])
    )
    data_files: list[str] = []
    dv_positions: dict[str, list[int]] = {}
    for m in manifests:
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            d = e["data_file"]
            if m.get("content", 0) == 1:
                ref = d.get("referenced_data_file")
                if ref is None or d.get("content_offset") is None:
                    raise ValueError(
                        "v3 delete manifest entry without deletion-vector "
                        f"addressing (file {d.get('file_path')!r}); "
                        "positional/equality delete FILES belong in v2 "
                        "resolution"
                    )
                with open(_resolve(root, d["file_path"]), "rb") as fh:
                    raw = fh.read()
                dv_positions.setdefault(ref, []).extend(
                    _dv_blob_decode(
                        raw,
                        int(d["content_offset"]),
                        int(d["content_size_in_bytes"]),
                    )
                )
            else:
                data_files.append(_resolve(root, d["file_path"]))
    schema = _table_schema(meta, snapshot_id)
    if schema is None:
        df = _with_position(spark, root, sorted(data_files))
    else:
        # field-id projection with v3 initial-default resolution; the
        # positional identity rides through for the DV anti-join below
        df = _read_with_field_ids(
            spark, sorted(data_files), schema, root=root, tag_identity=True
        )
    if dv_positions:
        rows = [
            (ref, pos)
            for ref, poss in sorted(dv_positions.items())
            for pos in poss
        ]
        dels = F.broadcast(
            _local_df(spark, rows, "file_path string, pos long")
        )
        df = df.join(
            dels,
            (df["__file"] == dels["file_path"])
            & (df["__pos"] == dels["pos"]),
            "left_anti",
        )
    return df.drop("__file", "__pos")


def append_dv_delete(
    spark: SparkSession, root: str, condition
) -> tuple[int, int]:
    """Commit a v3 merge-on-read DELETE as a DELETION VECTOR: rows of
    the current snapshot matching ``condition`` become per-data-file
    position bitmaps in ONE new Puffin file, referenced by a content=1
    delete manifest — zero data files rewritten, kilobytes committed
    (the v3 replacement for v2's positional-delete parquet files).
    Existing DVs merge: a data file that already carries deleted
    positions gets ONE superseding bitmap holding the union, per the
    spec's one-DV-per-data-file rule. Returns
    (snapshot_id, n_newly_deleted)."""
    from pyspark.sql import functions as F

    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    prev = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, prev_manifests = AV.read_container(
        _resolve(root, snaps[prev]["manifest-list"])
    )
    # current live state: data files + existing DV positions
    data_files: list[str] = []
    existing: dict[str, list[int]] = {}
    keep_manifests: list[dict] = []
    for m in prev_manifests:
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        if m.get("content", 0) == 1:
            # DV entries are folded into the superseding bitmaps below;
            # re-referencing their manifest would double-apply nothing
            # (positions are idempotent) but violates one-DV-per-file
            for e in entries:
                if e["status"] == _STATUS_DELETED:
                    continue
                d = e["data_file"]
                with open(_resolve(root, d["file_path"]), "rb") as fh:
                    raw = fh.read()
                existing.setdefault(d["referenced_data_file"], []).extend(
                    _dv_blob_decode(
                        raw,
                        int(d["content_offset"]),
                        int(d["content_size_in_bytes"]),
                    )
                )
            continue
        keep_manifests.append(m)
        for e in entries:
            if e["status"] != _STATUS_DELETED:
                data_files.append(_resolve(root, e["data_file"]["file_path"]))
    # live rows (existing DVs applied) matching the predicate
    live = _with_position(spark, root, sorted(data_files))
    if existing:
        rows = [
            (ref, p)
            for ref, poss in sorted(existing.items())
            for p in poss
        ]
        dels = F.broadcast(
            _local_df(spark, rows, "file_path string, pos long")
        )
        live = live.join(
            dels,
            (live["__file"] == dels["file_path"])
            & (live["__pos"] == dels["pos"]),
            "left_anti",
        )
    # driver-ok: DV encode — positions of newly deleted rows are
    # protocol metadata (driver-written bitmap)
    new_pos = (
        live.filter(condition)
        .select(
            F.col("__file").alias("file_path"), F.col("__pos").alias("pos")
        )
        .collect()
    )
    n_del = len(new_pos)
    merged: dict[str, list[int]] = {
        ref: sorted(poss) for ref, poss in existing.items()
    }
    for r in new_pos:
        merged.setdefault(r.file_path, []).append(r.pos)
    merged = {ref: sorted(set(poss)) for ref, poss in merged.items()}
    snap_id = prev + 1
    puffin_name = f"data/dv-{snap_id}.puffin"
    blobs = [
        (
            "deletion-vector-v1",
            _dv_blob_encode(poss),
            {"referenced-data-file": ref, "cardinality": str(len(poss))},
        )
        for ref, poss in sorted(merged.items())
    ]
    descs = _puffin_write(os.path.join(root, puffin_name), blobs)
    m_dv = f"m-{snap_id}-dv.avro"
    dv_entries = []
    for (ref, poss), desc in zip(sorted(merged.items()), descs):
        dv_entries.append(
            {
                "status": 1,
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 1,
                    "file_path": puffin_name,
                    "file_format": "PUFFIN",
                    "partition": {"lang": None},
                    "record_count": len(poss),
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(root, puffin_name)
                    ),
                    "referenced_data_file": ref,
                    "content_offset": desc["offset"],
                    "content_size_in_bytes": desc["length"],
                    "first_row_id": None,
                },
            }
        )
    AV.write_container(
        os.path.join(root, "metadata", m_dv), _MANIFEST_SCHEMA_V3, dv_entries
    )
    mlist_entries = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "added_snapshot_id": m.get("added_snapshot_id"),
        }
        for m in keep_manifests
    ] + [
        {
            "manifest_path": f"metadata/{m_dv}",
            "manifest_length": os.path.getsize(
                os.path.join(root, "metadata", m_dv)
            ),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snap_id,
        }
    ]
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA_V2,
        mlist_entries,
    )
    new_meta = dict(meta)
    new_meta["format-version"] = 3
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {"operation": "delete"},
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return snap_id, n_del


def write_iceberg_v3_lineage_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> tuple[int, int]:
    """Format-v3 table exercising ROW LINEAGE: snapshot 1 adds the
    even-doc_id rows (first_row_id = 0), snapshot 2 fast-appends the
    odd rows with first_row_id = next-row-id — per the v3 spec a row's
    durable ``_row_id`` is its data file's first_row_id plus its
    position, assigned once at commit and carried by the table
    metadata's next-row-id counter. Returns (snapshot_1, snapshot_2)."""
    import shutil

    from pyspark.sql import functions as F

    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    slim = docs.select("doc_id", "lang", "n_chars")
    even = slim.filter(F.col("doc_id") % 2 == 0).orderBy("doc_id")
    odd = slim.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id")
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        run_concurrent_writes,
    )

    _, _, n_even, n_odd = run_concurrent_writes(
        lambda: _write_single_parquet(even, root, "data/file-even.parquet"),
        lambda: _write_single_parquet(odd, root, "data/file-odd.parquet"),
        lambda: even.count(),
        lambda: odd.count(),
    )

    def _data_entry(snap: int, path: str, n: int, first: int) -> dict:
        return {
            "status": 1,
            "snapshot_id": snap,
            "data_file": {
                "content": 0,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {"lang": None},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(root, path)
                ),
                "referenced_data_file": None,
                "content_offset": None,
                "content_size_in_bytes": None,
                "first_row_id": first,
            },
        }

    s1, s2 = 3101, 3102
    AV.write_container(
        os.path.join(root, "metadata", "m-3101-even.avro"),
        _MANIFEST_SCHEMA_V3,
        [_data_entry(s1, "data/file-even.parquet", n_even, 0)],
    )
    AV.write_container(
        os.path.join(root, "metadata", "m-3102-odd.avro"),
        _MANIFEST_SCHEMA_V3,
        [_data_entry(s2, "data/file-odd.parquet", n_odd, n_even)],
    )

    def _mlist(name: str, entries: list[tuple[str, int]]) -> None:
        AV.write_container(
            os.path.join(root, "metadata", name),
            _MANIFEST_LIST_SCHEMA_V2,
            [
                {
                    "manifest_path": f"metadata/{m}",
                    "manifest_length": os.path.getsize(
                        os.path.join(root, "metadata", m)
                    ),
                    "partition_spec_id": 0,
                    "content": 0,
                    "added_snapshot_id": snap,
                }
                for m, snap in entries
            ],
        )

    _mlist("snap-3101.avro", [("m-3101-even.avro", s1)])
    _mlist(
        "snap-3102.avro",
        [("m-3101-even.avro", s1), ("m-3102-odd.avro", s2)],
    )
    meta = {
        "format-version": 3,
        "table-uuid": "spark-graft-iceberg-v3-lineage",
        "location": root,
        "current-snapshot-id": s2,
        "next-row-id": n_even + n_odd,
        "snapshots": [
            {
                "snapshot-id": s1,
                "manifest-list": "metadata/snap-3101.avro",
                "summary": {"operation": "append"},
                "first-row-id": 0,
            },
            {
                "snapshot-id": s2,
                "manifest-list": "metadata/snap-3102.avro",
                "summary": {"operation": "append"},
                "first-row-id": n_even,
            },
        ],
    }
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return s1, s2


def read_iceberg_v3_lineage(
    spark: SparkSession, root: str, snapshot_id: int | None = None
) -> DataFrame:
    """Like :func:`read_iceberg_v3` but exposing the v3 ROW-LINEAGE
    metadata column ``_row_id`` = the data file's ``first_row_id`` plus
    the row's position — the durable per-row identity that survives
    compaction and rewrites (a rewritten file carries the SAME
    first_row_id), enabling CDC/audit joins without a user key. The
    file -> first_row_id map is manifest metadata (broadcast); the id
    materializes map-side from the scan's row_index."""
    from pyspark.sql import functions as F

    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    if snapshot_id is None:
        snapshot_id = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in {sorted(snaps)} for {root}"
        )
    _, manifests = AV.read_container(
        _resolve(root, snaps[snapshot_id]["manifest-list"])
    )
    firsts: list[tuple[str, int]] = []
    for m in manifests:
        if m.get("content", 0) == 1:
            continue
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            d = e["data_file"]
            if d.get("first_row_id") is None:
                raise ValueError(
                    f"data file {d['file_path']!r} has no first_row_id — "
                    "row lineage requires v3 row-id assignment"
                )
            firsts.append(
                (
                    os.path.relpath(_resolve(root, d["file_path"]), root),
                    int(d["first_row_id"]),
                )
            )
    df = _with_position(
        spark, root, sorted(_resolve(root, p) for p, _ in firsts)
    )
    fmap = F.broadcast(
        _local_df(spark, firsts, "__lf string, __first long")
    )
    return (
        df.join(fmap, df["__file"] == fmap["__lf"])
        .withColumn("_row_id", F.col("__first") + F.col("__pos"))
        .drop("__file", "__pos", "__lf", "__first")
    )


def write_iceberg_v3_default_values_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> tuple[int, int]:
    """Format-v3 table exercising DEFAULT VALUES (spec: "Default
    values" + the initial-default rule in "Column Projection"):

      * snapshot 1 (schema 0): file-a holds the non-French docs with
        fields (doc_id:1, lang:2, n_chars:3) — written BEFORE the
        ``tier`` column existed;
      * schema 1 adds field 4 ``tier: string`` with
        ``initial-default: "legacy"`` and ``write-default:
        "standard"``; snapshot 2 appends file-b (the French docs) with
        explicit tier values.

    A correct reader must resolve file-a's missing field 4 to the
    string ``legacy`` — NOT null: that is precisely what
    initial-default changes about column projection. Files carry real
    parquet field ids (pyarrow writer). ``docs`` is SF-proportional,
    so the fixture bounds it to the FIRST 500 doc_ids (deterministic:
    doc_id is unique) before the driver-side materialization — the
    oracle SQL over this fixture applies the same bound.
    Returns (snap_1, snap_2)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    # bounded driver-side materialization: ≤500 rows × 3 narrow columns
    # regardless of SF (hygiene-adjudicated fixture construction)
    pdf = (
        docs.select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .limit(500)
        .toPandas()
    )

    def _field(name: str, typ, fid: int):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    sa = pa.schema(
        [
            _field("doc_id", pa.int64(), 1),
            _field("lang", pa.string(), 2),
            _field("n_chars", pa.int64(), 3),
        ]
    )
    sb = pa.schema(
        [
            _field("doc_id", pa.int64(), 1),
            _field("lang", pa.string(), 2),
            _field("n_chars", pa.int64(), 3),
            _field("tier", pa.string(), 4),
        ]
    )
    old = pdf[pdf.lang != "fr"]
    new = pdf[pdf.lang == "fr"].copy()
    new["tier"] = new.n_chars.map(
        lambda c: "standard" if c >= 600 else "short"
    )
    pq.write_table(
        pa.Table.from_pandas(old, schema=sa, preserve_index=False),
        os.path.join(root, "data", "file-a.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(new, schema=sb, preserve_index=False),
        os.path.join(root, "data", "file-b.parquet"),
    )

    def _entry(status: int, snap: int, name: str) -> dict:
        return {
            "status": status,
            "snapshot_id": snap,
            "data_file": {
                "file_path": name,
                "file_format": "PARQUET",
                "partition": {"lang": None},
                "record_count": 0,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(root, name)
                ),
            },
        }

    snap1, snap2 = 3201, 3202
    for mname, entries in (
        ("dm1.avro", [_entry(1, snap1, "data/file-a.parquet")]),
        (
            "dm2.avro",
            [
                _entry(0, snap1, "data/file-a.parquet"),
                _entry(1, snap2, "data/file-b.parquet"),
            ],
        ),
    ):
        AV.write_container(
            os.path.join(root, "metadata", mname), _MANIFEST_SCHEMA, entries
        )
    for lname, mname in (
        ("dsnap-1.avro", "dm1.avro"),
        ("dsnap-2.avro", "dm2.avro"),
    ):
        AV.write_container(
            os.path.join(root, "metadata", lname),
            _MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": f"metadata/{mname}",
                    "manifest_length": os.path.getsize(
                        os.path.join(root, "metadata", mname)
                    ),
                    "partition_spec_id": 0,
                    "added_snapshot_id": None,
                }
            ],
        )

    base_fields = [
        {"id": 1, "name": "doc_id", "type": "long", "required": False},
        {"id": 2, "name": "lang", "type": "string", "required": False},
        {"id": 3, "name": "n_chars", "type": "long", "required": False},
    ]
    meta = {
        "format-version": 3,
        "table-uuid": "spark-graft-iceberg-v3-defaults",
        "location": root,
        "current-snapshot-id": snap2,
        "current-schema-id": 1,
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": base_fields},
            {
                "schema-id": 1,
                "type": "struct",
                "fields": base_fields
                + [
                    {
                        "id": 4,
                        "name": "tier",
                        "type": "string",
                        "required": False,
                        "initial-default": "legacy",
                        "write-default": "standard",
                    }
                ],
            },
        ],
        "snapshots": [
            {
                "snapshot-id": snap1,
                "schema-id": 0,
                "manifest-list": "metadata/dsnap-1.avro",
                "summary": {"operation": "append"},
            },
            {
                "snapshot-id": snap2,
                "schema-id": 1,
                "manifest-list": "metadata/dsnap-2.avro",
                "summary": {"operation": "append"},
            },
        ],
    }
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return snap1, snap2


def _v3_snapshot_state(
    root: str, snapshot_id: int
) -> tuple[set[str], dict[str, set[int]]]:
    """(live data-file rel paths, DV positions per referenced file) at
    ``snapshot_id`` — the inputs a changelog diff needs. Metadata-scale:
    manifests + Puffin blobs only."""
    meta = current_metadata(root)
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    if snapshot_id not in snaps:
        raise ValueError(
            f"snapshot {snapshot_id} not in {sorted(snaps)} for {root}"
        )
    _, manifests = AV.read_container(
        _resolve(root, snaps[snapshot_id]["manifest-list"])
    )
    data: set[str] = set()
    dv: dict[str, set[int]] = {}
    for m in manifests:
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            d = e["data_file"]
            if m.get("content", 0) == 1:
                with open(_resolve(root, d["file_path"]), "rb") as fh:
                    raw = fh.read()
                dv.setdefault(d["referenced_data_file"], set()).update(
                    _dv_blob_decode(
                        raw,
                        int(d["content_offset"]),
                        int(d["content_size_in_bytes"]),
                    )
                )
            else:
                data.add(d["file_path"])
    return data, dv


def read_iceberg_changelog(
    spark: SparkSession,
    root: str,
    from_snapshot: int | None,
    to_snapshot: int,
) -> DataFrame:
    """CHANGELOG scan between two snapshots (the Iceberg twin of Delta
    CDF): rows ADDED by data files new in ``to`` surface as inserts
    (minus any rows already DV-masked at ``to``); rows newly masked by
    deletion vectors surface as deletes (per-file bitmap DIFF, then a
    (file, position) semi-join fetch). ``from_snapshot=None`` means
    the empty table — every live row is an insert. Data files that
    DISAPPEAR between the snapshots (rewrites) raise by name: a
    compaction is not a row-level change and silently diffing it would
    fabricate churn. Output carries ``_change_type``."""
    from functools import reduce

    from pyspark.sql import functions as F

    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    to_data, to_dv = _v3_snapshot_state(root, to_snapshot)
    if from_snapshot is None:
        from_data, from_dv = set(), {}
    else:
        from_data, from_dv = _v3_snapshot_state(root, from_snapshot)
    gone = sorted(from_data - to_data)
    if gone:
        raise ValueError(
            f"data files removed between snapshots {gone}: rewrites "
            "have no row-level changelog derivation here"
        )

    def _masked(df, positions: dict[str, set[int]], keep: bool):
        rows = [
            (p, i) for p, poss in sorted(positions.items()) for i in poss
        ]
        if not rows:
            return df if not keep else df.limit(0)
        dels = _local_df(spark, rows, "file_path string, pos long")
        how = "left_semi" if keep else "left_anti"
        return df.join(
            dels,
            (df["__file"] == dels["file_path"])
            & (df["__pos"] == dels["pos"]),
            how,
        )

    parts = []
    new_files = sorted(to_data - from_data)
    if new_files:
        scan = _with_position(
            spark, root, [_resolve(root, p) for p in new_files]
        )
        ins = _masked(
            scan, {p: to_dv.get(p, set()) for p in new_files}, keep=False
        )
        parts.append(
            ins.drop("__file", "__pos").withColumn(
                "_change_type", F.lit("insert")
            )
        )
    diff: dict[str, set[int]] = {}
    for p, poss in to_dv.items():
        if p not in from_data:
            continue  # DVs on files new in `to` already folded above
        extra = poss - from_dv.get(p, set())
        if extra:
            diff[p] = extra
    if diff:
        scan = _with_position(
            spark, root, [_resolve(root, p) for p in sorted(diff)]
        )
        dels = _masked(scan, diff, keep=True)
        parts.append(
            dels.drop("__file", "__pos").withColumn(
                "_change_type", F.lit("delete")
            )
        )
    if not parts:
        raise ValueError(
            f"no row-level changes between snapshots {from_snapshot} "
            f"and {to_snapshot}"
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def remove_orphan_files(root: str) -> list[str]:
    """Iceberg ``removeOrphanFiles``: physically delete files under the
    table's ``data/`` and ``metadata/`` directories that NO snapshot in
    the current metadata reaches (crashed writes, abandoned
    compactions). Reachability = every snapshot's manifest list, its
    manifests, every entry's data/delete file (regardless of entry
    status — DELETED entries still reference history), plus the
    metadata.json versions themselves, and every file registered under
    the metadata's ``statistics`` / ``partition-statistics`` lists
    (Puffin NDV blobs, partition-stats parquet — registered state, not
    orphans). Returns the deleted table-relative paths. Never touches
    live or historical state — expire_snapshots is the command that
    shrinks history."""
    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    keep: set[str] = set()
    for entry in meta.get("statistics", []) + meta.get(
        "partition-statistics", []
    ):
        p = entry.get("statistics-path")
        if p:
            keep.add(os.path.normpath(p))
    for s in meta.get("snapshots", []):
        mlist = s["manifest-list"]
        keep.add(os.path.normpath(mlist))
        _, manifests = AV.read_container(_resolve(root, mlist))
        for m in manifests:
            keep.add(os.path.normpath(m["manifest_path"]))
            _, entries = AV.read_container(
                _resolve(root, m["manifest_path"])
            )
            for e in entries:
                keep.add(os.path.normpath(e["data_file"]["file_path"]))
    deleted: list[str] = []
    for sub in ("data", "metadata"):
        base = os.path.join(root, sub)
        if not os.path.isdir(base):
            continue
        for dirpath, _dirs, filenames in os.walk(base):
            for fn in filenames:
                if fn.endswith(".metadata.json") or fn.startswith("."):
                    continue
                rel = os.path.normpath(
                    os.path.relpath(os.path.join(dirpath, fn), root)
                )
                if rel not in keep:
                    os.remove(os.path.join(dirpath, fn))
                    deleted.append(rel)
    return sorted(deleted)


def rewrite_data_files(
    spark: SparkSession, root: str, sort_by: str | None = None
) -> tuple[int, int, int]:
    """Iceberg ``rewriteDataFiles`` (bin-pack compaction): rewrite the
    current snapshot's live data files as ONE file PER PARTITION
    (optionally sorted on ``sort_by`` for clustering) and commit a
    REPLACE snapshot — a manifest marking every old file DELETED plus
    the ADDED entries, previous history retained for time travel.
    Compaction groups by each entry's RECORDED partition record and the
    new entries carry those same real partition values, so partition
    pruning stays valid after compaction (an all-NULL partition record
    would otherwise be silently pruned by every partition filter).
    Pure metadata beyond the per-partition data rewrite passes; the
    spec's maintenance command for the small-files problem. Returns
    (snapshot_id, n_files_before, n_files_after)."""
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        _write_single_parquet,
    )

    meta = current_metadata(root)
    _check_format_version(meta)
    snap_cur = meta["current-snapshot-id"]
    _, cur_manifests = AV.read_container(
        _resolve(
            root,
            {s["snapshot-id"]: s for s in meta["snapshots"]}[snap_cur][
                "manifest-list"
            ],
        )
    )
    mor = [m["manifest_path"] for m in cur_manifests if m.get("content", 0) == 1]
    if mor:
        raise ValueError(
            f"rewriteDataFiles over live delete manifests {mor} would "
            "resurrect deleted rows — resolve through "
            "read_iceberg_resolved and rewrite deletes first"
        )
    # group live entries by their RECORDED partition record — the new
    # compacted files must carry real partition values, not NULLs
    groups: dict[tuple, dict] = {}
    old: list[tuple[str, dict]] = []
    for m in cur_manifests:
        _, m_entries = AV.read_container(_resolve(root, m["manifest_path"]))
        for e in m_entries:
            if e["status"] == _STATUS_DELETED:
                continue
            part = dict(e["data_file"].get("partition") or {})
            key = tuple(sorted(part.items()))
            g = groups.setdefault(key, {"partition": part, "files": []})
            g["files"].append(e["data_file"]["file_path"])
            old.append((e["data_file"]["file_path"], part))
    n_before = len(old)
    prev = meta["current-snapshot-id"]
    snap_id = prev + 1
    # Derive the manifest partition schema from the RECORDED partition
    # fields: hard-coding {lang} here would silently drop another
    # spec's partition values (e.g. the nc_trunc hidden-partition
    # layout), after which snapshot_files' partition pruning skips the
    # compacted files entirely — the data-loss mode this rewrite exists
    # to avoid. Avro types come from the recorded values themselves.
    part_fields = sorted({k for _, p in old for k in p})
    # Refuse MIXED partition specs: writing a union-field manifest would
    # record NULL for fields absent from a file's own spec, and
    # snapshot_files treats a RECORDED null as judgable — a later
    # partition filter on the other spec's field would prune those
    # compacted files (per-manifest spec-ids are how real Iceberg keeps
    # this sound; this writer supports one spec per table).
    key_sets = {tuple(sorted(p)) for _, p in old}
    if len(key_sets) > 1:
        raise ValueError(
            f"rewriteDataFiles over mixed partition specs {sorted(key_sets)} "
            "— compact one spec at a time (union-field manifests would "
            "record judgable NULLs and break partition pruning)"
        )
    part_type: dict[str, str] = {}

    def _avro_type(v: object) -> str:
        if isinstance(v, bool):
            return "string"
        if isinstance(v, int):
            return "long"
        if isinstance(v, float):
            return "double"
        return "string"

    for k in part_fields:
        vals = [p[k] for _, p in old if p.get(k) is not None]
        # Refuse heterogeneous recorded value types for one field (e.g.
        # int in one manifest, string in another): inferring from
        # vals[0] alone would build a manifest schema that mismatches
        # the other values, leaving the failure mode to avro_lite's
        # write-time strictness instead of an explicit refusal here —
        # same discipline as the mixed-spec guard above.
        types = {_avro_type(v) for v in vals}
        if len(types) > 1:
            raise ValueError(
                f"rewriteDataFiles: partition field {k!r} has recorded "
                f"values of mixed Avro types {sorted(types)} — compact "
                "manifests with a consistent partition value type"
            )
        part_type[k] = types.pop() if types else "string"
    man_schema = json.loads(json.dumps(_MANIFEST_SCHEMA))
    man_schema["fields"][2]["type"]["fields"][2]["type"]["fields"] = [
        {"name": k, "type": ["null", part_type[k]]} for k in part_fields
    ]

    def _entry(status: int, snap: int, path: str, n: int, part: dict) -> dict:
        return {
            "status": status,
            "snapshot_id": snap,
            "data_file": {
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {k: part.get(k) for k in part_fields},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    os.path.join(root, path)
                ),
            },
        }

    entries = [_entry(2, snap_id, p, 0, part) for p, part in old]
    # One single-file write job per partition group: sequentially each
    # pays full job-submission + one-task write latency (profiled as the
    # bulk of the compaction wall time at 5 groups); overlapped through
    # the fixture builders' driver thread pool the wall cost is ~one job.
    # Entry order stays deterministic — thunks are built and results
    # consumed in sorted(groups) order.
    from news_ingestion_data_pipeline_spark.operators.deltalog import (
        run_concurrent_writes,
    )

    def _compact_one(key: tuple, g: dict) -> str:
        pf = {k: {v} for k, v in g["partition"].items()}
        df = read_iceberg(spark, root, partition_filter=pf or None)
        if sort_by is not None:
            df = df.sort(sort_by)
        suffix = (
            "-".join(
                "null" if v is None else "".join(
                    ch if ch.isalnum() else "_" for ch in str(v)
                )
                for _k, v in key
            )
            or "all"
        )
        name = f"data/compact-{snap_id}-{suffix}.parquet"
        _write_single_parquet(df, root, name)
        return name

    ordered = sorted(groups.items())
    names = run_concurrent_writes(
        *[lambda key=key, g=g: _compact_one(key, g) for key, g in ordered]
    )
    # record_count from the written footer — no second scan per group
    import pyarrow.parquet as pq

    for (_key, g), name in zip(ordered, names):
        n_rows = pq.read_metadata(os.path.join(root, name)).num_rows
        entries.append(_entry(1, snap_id, name, n_rows, g["partition"]))
    m_name = f"m-compact-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", m_name), man_schema, entries
    )
    mlist = f"snap-compact-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": f"metadata/{m_name}",
                "manifest_length": os.path.getsize(
                    os.path.join(root, "metadata", m_name)
                ),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    new_meta = dict(meta)
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {"operation": "replace"},
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return snap_id, n_before, len(groups)


def publish_iceberg_metadata_for_delta(root: str) -> int:
    """UNIFORM-STYLE DUAL PUBLISH: generate Iceberg metadata (manifest
    -> manifest list -> vN.metadata.json) over the LIVE data files of
    the Delta table at ``root``, without copying or rewriting a byte
    of data — the two formats' metadata layers describe the same
    parquet. After this, the directory reads correctly through BOTH
    protocol readers (read_delta and read_iceberg). Pure metadata:
    cost is one log replay plus kilobytes of Avro/JSON, independent of
    data size — exactly how production dual-format tables stay cheap.
    Returns the Iceberg snapshot id."""
    from news_ingestion_data_pipeline_spark.operators import deltalog as DL

    adds, protocol, metadata = DL._replay(root)
    DL._check_protocol(protocol, metadata)
    dv_paths = sorted(p for p, a in adds.items() if a.get("deletionVector"))
    if dv_paths:
        raise ValueError(
            "cannot publish Iceberg metadata over deletion-vector adds "
            f"{dv_paths}: the DV row masks have no v2 file-level "
            "equivalent here — compact first"
        )
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    snap_id = 7001
    entries = [
        {
            "status": 1,
            "snapshot_id": snap_id,
            "data_file": {
                "file_path": p,
                "file_format": "PARQUET",
                "partition": {"lang": None},
                "record_count": 0,
                "file_size_in_bytes": adds[p].get("size")
                or os.path.getsize(os.path.join(root, p)),
            },
        }
        for p in sorted(adds)
    ]
    mpath = os.path.join(root, "metadata", "uniform-m1.avro")
    AV.write_container(mpath, _MANIFEST_SCHEMA, entries)
    lpath = os.path.join(root, "metadata", "uniform-snap-1.avro")
    AV.write_container(
        lpath,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "metadata/uniform-m1.avro",
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    meta = {
        "format-version": 2,
        "table-uuid": "spark-graft-uniform-dual",
        "location": root,
        "current-snapshot-id": snap_id,
        "snapshots": [
            {
                "snapshot-id": snap_id,
                "manifest-list": "metadata/uniform-snap-1.avro",
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(
        os.path.join(root, "metadata", "v1.metadata.json"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(meta, fh)
    return snap_id


def publish_delta_log_for_iceberg(root: str) -> int:
    """The REVERSE UniForm direction: generate a Delta ``_delta_log``
    over the live data files of the Iceberg table at ``root`` — one
    v0 commit with protocol/metaData/add actions referencing the same
    parquet, no data copied. Snapshots carrying delete files (v2
    merge-on-read) or deletion vectors are refused by name: their row
    masks have no Delta file-level equivalent here. Pure metadata.
    Returns the number of add actions published."""
    import json as _json

    from news_ingestion_data_pipeline_spark.operators import deltalog as DL

    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    snap_id = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, manifests = AV.read_container(
        _resolve(root, snaps[snap_id]["manifest-list"])
    )
    files: list[tuple[str, int]] = []
    for m in manifests:
        _, entries = AV.read_container(_resolve(root, m["manifest_path"]))
        live = [e for e in entries if e["status"] != _STATUS_DELETED]
        if m.get("content", 0) == 1 and live:
            raise ValueError(
                "cannot publish a Delta log over live delete files "
                f"(manifest {m['manifest_path']}): row-level masks "
                "have no file-level Delta equivalent — compact first"
            )
        if m.get("content", 0) == 1:
            continue
        for e in live:
            d = e["data_file"]
            files.append(
                (
                    d["file_path"],
                    d.get("file_size_in_bytes")
                    or os.path.getsize(_resolve(root, d["file_path"])),
                )
            )
    if os.path.exists(os.path.join(root, "_delta_log")):
        raise ValueError(f"_delta_log already exists at {root}")
    # a real schemaString from the first live file's footer (Delta
    # readers trust the metaData schema, so an empty one would project
    # zero columns)
    import pyarrow.parquet as pq

    _ARROW_TO_DELTA = {
        "int64": "long", "int32": "integer", "int16": "short",
        "int8": "byte", "double": "double", "float": "float",
        "string": "string", "large_string": "string", "bool": "boolean",
        "date32[day]": "date", "binary": "binary",
    }
    fields = []
    if files:
        first = _resolve(root, sorted(p for p, _ in files)[0])
        for fld in pq.read_schema(first):
            t_str = str(fld.type)
            if t_str.startswith("timestamp"):
                delta_t = "timestamp"
            else:
                delta_t = _ARROW_TO_DELTA.get(t_str, "string")
            fields.append(
                {
                    "name": fld.name,
                    "type": delta_t,
                    "nullable": True,
                    "metadata": {},
                }
            )
    actions: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "spark-graft-uniform-reverse",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _json.dumps(
                    {"type": "struct", "fields": fields}
                ),
                "partitionColumns": [],
                "configuration": {},
            }
        },
    ]
    for p, size in sorted(files):
        actions.append(
            {
                "add": {
                    "path": p,
                    "partitionValues": {},
                    "size": size,
                    "modificationTime": 1700000000000,
                    "dataChange": True,
                }
            }
        )
    DL._commit(root, 0, actions)
    return len(files)


def set_ref(
    root: str, name: str, snapshot_id: int, ref_type: str = "tag"
) -> int:
    """Create/update a named REF (spec table metadata ``refs``): a
    ``tag`` pins a snapshot immutably (audits, releases), a ``branch``
    is a movable head (write-audit-publish staging). Pure metadata —
    publishes a new vN.metadata.json. Returns the metadata version."""
    if ref_type not in ("tag", "branch"):
        raise ValueError(f"ref type must be 'tag' or 'branch', got {ref_type!r}")
    meta = current_metadata(root)
    _check_format_version(meta, max_supported=3)
    if snapshot_id not in {s["snapshot-id"] for s in meta["snapshots"]}:
        raise ValueError(f"snapshot {snapshot_id} not in history")
    new_meta = dict(meta)
    refs = dict(new_meta.get("refs") or {})
    refs[name] = {"snapshot-id": snapshot_id, "type": ref_type}
    new_meta["refs"] = refs
    return _write_metadata_exclusive(root, new_meta)


def resolve_ref(root: str, name: str) -> int:
    """Ref name -> snapshot id (``main`` falls back to
    current-snapshot-id when no explicit ref exists, per the spec's
    default branch)."""
    meta = current_metadata(root)
    refs = meta.get("refs") or {}
    if name in refs:
        return refs[name]["snapshot-id"]
    if name == "main":
        return meta["current-snapshot-id"]
    raise ValueError(
        f"unknown ref {name!r} (have: {sorted(refs)} + 'main')"
    )


def read_iceberg_ref(
    spark: SparkSession, root: str, ref: str
) -> DataFrame:
    """Snapshot read at a named tag/branch — ``read_iceberg`` with the
    ref resolved through the metadata's refs map (time travel by NAME,
    the audit/WAP read path)."""
    return read_iceberg(spark, root, resolve_ref(root, ref))


def rewrite_position_deletes_to_dvs(
    spark: SparkSession, root: str
) -> tuple[int, int, int]:
    """Maintenance action migrating v2 POSITIONAL DELETE FILES to v3
    DELETION VECTORS (the spec's upgrade path: v3 readers must not see
    position-delete parquet files): every live (file_path, pos) record
    is folded into one roaring bitmap per data file, written as
    deletion-vector-v1 blobs in ONE Puffin file, committed as a new
    snapshot whose manifest list re-references the data manifests
    untouched and replaces all delete manifests with the DV manifest;
    the table's format-version bumps to 3. Data files: zero rewritten.
    Returns (snapshot_id, n_files_with_dvs, n_positions)."""
    meta = current_metadata(root)
    _check_format_version(meta)  # source table must be v1/v2
    prev = meta["current-snapshot-id"]
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    _, prev_manifests = AV.read_container(
        _resolve(root, snaps[prev]["manifest-list"])
    )
    delete_files: list[str] = []
    keep_manifests: list[dict] = []
    for m in prev_manifests:
        if m.get("content", 0) == 1:
            _, entries = AV.read_container(
                _resolve(root, m["manifest_path"])
            )
            for e in entries:
                if e["status"] != _STATUS_DELETED:
                    delete_files.append(
                        _resolve(root, e["data_file"]["file_path"])
                    )
        else:
            keep_manifests.append(m)
    pos_files, eq_groups = _classify_deletes(delete_files)
    if eq_groups:
        raise ValueError(
            "equality delete files present "
            f"({sorted(k for g in eq_groups.values() for k in g)}); "
            "rewrite_position_deletes_to_dvs converts POSITIONAL "
            "deletes only — compact equality deletes first"
        )
    positions: dict[str, set[int]] = {}
    n_pos = 0
    if pos_files:
        # driver-ok: positional-delete file contents are protocol
        # metadata, bounded by the table's delete count — the same
        # driver-side resolution production readers do before planning
        for r in (
            spark.read.parquet(*pos_files)
            .select("file_path", "pos")
            .collect()
        ):
            positions.setdefault(r.file_path, set()).add(r.pos)
            n_pos += 1
    snap_id = prev + 1
    mlist_entries = [
        {
            "manifest_path": m["manifest_path"],
            "manifest_length": m["manifest_length"],
            "partition_spec_id": m["partition_spec_id"],
            "content": m.get("content", 0),
            "added_snapshot_id": m.get("added_snapshot_id"),
        }
        for m in keep_manifests
    ]
    if positions:
        puffin_name = f"data/dv-{snap_id}.puffin"
        merged = {ref: sorted(poss) for ref, poss in positions.items()}
        blobs = [
            (
                "deletion-vector-v1",
                _dv_blob_encode(poss),
                {
                    "referenced-data-file": ref,
                    "cardinality": str(len(poss)),
                },
            )
            for ref, poss in sorted(merged.items())
        ]
        descs = _puffin_write(os.path.join(root, puffin_name), blobs)
        m_dv = f"m-{snap_id}-dv.avro"
        AV.write_container(
            os.path.join(root, "metadata", m_dv),
            _MANIFEST_SCHEMA_V3,
            [
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    "data_file": {
                        "content": 1,
                        "file_path": puffin_name,
                        "file_format": "PUFFIN",
                        "partition": {"lang": None},
                        "record_count": len(poss),
                        "file_size_in_bytes": os.path.getsize(
                            os.path.join(root, puffin_name)
                        ),
                        "referenced_data_file": ref,
                        "content_offset": desc["offset"],
                        "content_size_in_bytes": desc["length"],
                        "first_row_id": None,
                    },
                }
                for (ref, poss), desc in zip(sorted(merged.items()), descs)
            ],
        )
        mlist_entries.append(
            {
                "manifest_path": f"metadata/{m_dv}",
                "manifest_length": os.path.getsize(
                    os.path.join(root, "metadata", m_dv)
                ),
                "partition_spec_id": 0,
                "content": 1,
                "added_snapshot_id": snap_id,
            }
        )
    mlist = f"snap-{snap_id}.avro"
    AV.write_container(
        os.path.join(root, "metadata", mlist),
        _MANIFEST_LIST_SCHEMA_V2,
        mlist_entries,
    )
    new_meta = dict(meta)
    new_meta["format-version"] = 3
    new_meta["current-snapshot-id"] = snap_id
    new_meta["snapshots"] = list(meta["snapshots"]) + [
        {
            "snapshot-id": snap_id,
            "manifest-list": f"metadata/{mlist}",
            "summary": {"operation": "replace"},
        }
    ]
    _write_metadata_exclusive(root, new_meta)
    return snap_id, len(positions), n_pos
