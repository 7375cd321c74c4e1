"""Delta Lake transaction-log reader (open-format interop).

Implements the READ side of the public Delta protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): a table is
a directory of immutable parquet data files plus ``_delta_log/`` holding
ordered JSON commits (``%020d.json``), each a sequence of newline-
delimited actions (``protocol`` / ``metaData`` / ``add`` / ``remove``).
The snapshot at version V = replay of all commits <= V; a data file is
live iff its LAST action in that range is an ``add``.

Scale shape: the log is metadata — kilobytes per commit, parsed
driver-side exactly like production Delta readers resolve snapshots
(the engine's own manifest-pointer tables in operators/upsert.py make
the same metadata/payload split). The DATA stays distributed: the live
file list feeds one ``spark.read.parquet(*files)``, so predicate
pushdown / column pruning / partition parallelism all apply unchanged.
Checkpoint support (the protocol's log compaction) is implemented at
the bottom of this module: a ``%020d.checkpoint.parquet`` materializes
the live-add state so readers start there and replay only the JSON
commits after it — the difference between one compacted file + a tail
and an unbounded log replay.

No Delta code is used or required — this is a clean-room parser of the
published JSON action schema.
"""

from __future__ import annotations

import json
import os
import time
import uuid as _uuidlib
import zlib

from pyspark.sql import DataFrame, SparkSession


def _local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """createDataFrame over ONE slice: the default path parallelizes a
    driver-local list over defaultParallelism, costing 32 near-empty
    task launches per call for DV/row-id maps that are file-count-sized
    by construction (same fix as iceberg._local_df, r11 profile).
    Classic-session only — see tables.local_df for the Spark Connect
    caveat and fallback."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def list_commit_versions(root: str) -> list[int]:
    """Sorted commit versions present in ``_delta_log/`` (ignores
    checkpoints, CRCs and temp files)."""
    log_dir = os.path.join(root, "_delta_log")
    out = []
    for name in os.listdir(log_dir):
        stem, ext = os.path.splitext(name)
        if ext == ".json" and len(stem) == 20 and stem.isdigit():
            out.append(int(stem))
    return sorted(out)


def _replay(
    root: str, version: int | None = None
) -> tuple[dict[str, dict], dict | None, dict | None]:
    """Replay the log up to ``version`` -> (live adds keyed by path,
    last protocol action, last metaData action). Within a commit, later
    actions win (per the protocol, a commit is an ordered atomic
    batch)."""
    versions = list_commit_versions(root)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {root}/_delta_log")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    adds: dict[str, dict] = {}
    protocol: dict | None = None
    metadata: dict | None = None
    for v in versions:
        if v > version:
            break
        commit = os.path.join(root, "_delta_log", f"{v:020d}.json")
        with open(commit, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
                elif "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    metadata = action["metaData"]
    return adds, protocol, metadata


def _check_protocol(protocol: dict | None, metadata: dict | None) -> None:
    """Gate on the protocol action's reader requirements instead of
    silently mis-reading: reader version 2 (column mapping) and the
    version-3 features this module actually implements (deletionVectors,
    columnMapping) pass; anything else raises with the feature named."""
    # liquid clustering (clusteredTable writer feature /
    # clusteringProvider table property) raises BY NAME regardless of
    # reader version: this module's maintenance paths (compact, ZORDER
    # optimize) are not clustering-aware, and proceeding would silently
    # ignore — or destroy on rewrite — the table's clustering contract.
    # Checked BEFORE the protocol-None early exit: the configuration
    # half needs only metadata, and a log whose metaData carries
    # clusteringProvider without any protocol action must still refuse.
    cfg = ((metadata or {}).get("configuration") or {})
    wfeats = set((protocol or {}).get("writerFeatures") or [])
    if "clusteringProvider" in cfg or "clusteredTable" in wfeats:
        raise ValueError(
            "unsupported Delta feature clusteredTable/clusteringProvider "
            "(liquid clustering) — this engine's clustering path is "
            "ZORDER OPTIMIZE (optimize_zorder); refusing rather than "
            "reading without clustering awareness"
        )
    if protocol is None:
        return
    mrv = protocol.get("minReaderVersion", 1)
    if mrv <= 1:
        return
    if mrv == 2:
        mode = ((metadata or {}).get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode not in (None, "none", "name", "id"):
            raise ValueError(
                f"unsupported Delta columnMapping mode {mode!r}"
            )
        return
    if mrv == 3:
        feats = set(protocol.get("readerFeatures") or [])
        unsupported = sorted(
            feats
            - {
                "deletionVectors",
                "columnMapping",
                "v2Checkpoint",
                "typeWidening",
            }
        )
        if unsupported:
            raise ValueError(
                f"unsupported Delta reader features {unsupported} "
                "(supported: deletionVectors, columnMapping, "
                "v2Checkpoint, typeWidening)"
            )
        return
    raise ValueError(f"unsupported Delta minReaderVersion {mrv}")


def _column_mapping(metadata: dict | None) -> list[dict] | None:
    """Logical-schema fields with their columnMapping identities when
    the table has mapping on (mode ``name`` or ``id``): each entry is
    {name, physicalName, id, type} straight from the schemaString's
    per-field metadata. None when mapping is off."""
    mode = ((metadata or {}).get("configuration") or {}).get(
        "delta.columnMapping.mode", "none"
    )
    if mode in (None, "none"):
        return None
    fields = json.loads(metadata["schemaString"])["fields"]
    out = []
    for f in fields:
        md = f.get("metadata") or {}
        out.append(
            {
                "name": f["name"],
                "physicalName": md.get(
                    "delta.columnMapping.physicalName", f["name"]
                ),
                "id": md.get("delta.columnMapping.id"),
                "type": f.get("type", "string"),
            }
        )
    return out


def _apply_column_mapping(spark, df, files: list[str], mapping: list[dict]):
    """Physical -> logical projection per the columnMapping spec:
    resolve by parquet footer field ids when the files carry them
    (mode ``id``; footer reads are metadata-scale), else by the
    schemaString's physicalName (mode ``name``). Columns absent from
    the files surface as typed NULLs (schema-evolution adds)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    idmap: dict[int, str] = {}
    if files:
        for fld in pq.read_schema(files[0]):
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                idmap[int(fid)] = fld.name
    cols = []
    for m in mapping:
        typ = m["type"] if isinstance(m["type"], str) else "string"
        phys = None
        if m["id"] is not None and idmap:
            phys = idmap.get(int(m["id"]))
        if phys is None:
            phys = m["physicalName"]
        if phys in df.columns:
            cols.append(F.col(phys).alias(m["name"]))
        else:
            cols.append(F.lit(None).cast(typ).alias(m["name"]))
    return df.select(*cols)


def _widen_casts(metadata: dict | None) -> dict[str, str] | None:
    """Logical target types of fields whose schemaString metadata
    records ``delta.typeChanges`` (the typeWidening reader feature,
    Delta protocol "Type Widening"): {fieldName: wideType}. None when
    the schema records no widened fields — the common case, costing
    one dict scan and zero file I/O."""
    if not metadata or "schemaString" not in metadata:
        return None
    fields = json.loads(metadata["schemaString"])["fields"]
    out = {
        f["name"]: f["type"]
        for f in fields
        if isinstance(f.get("type"), str)
        and (f.get("metadata") or {}).get("delta.typeChanges")
    }
    return out or None


def _grouped_scan(
    spark: SparkSession,
    root: str,
    files: list[str],
    metadata: dict | None,
    tag_identity: bool,
) -> DataFrame:
    """Vectorized parquet scan(s) over a snapshot's live files.

    Normally ONE distributed scan. When the schemaString carries
    ``delta.typeChanges`` (typeWidening: files written before the
    widen commit keep their narrow physical type), files are grouped
    by the physical types of the widened columns — parquet footer
    reads, metadata-scale like the log replay — and each group gets
    its own scan with a per-group upcast projection, because a single
    mixed scan cannot promote int32 pages to the widened logical type
    (the vectorized reader refuses the conversion). ``tag_identity``
    adds the (__file, __pos) columns per group BEFORE the union so
    merge-on-read DV masking composes with widening."""
    from pyspark.sql import functions as F

    widen = _widen_casts(metadata)
    if widen and _column_mapping(metadata) is not None:
        # widened groups are keyed on logical names, but mapped files
        # carry physical names — a mixed scan would fail obscurely
        raise ValueError(
            "typeWidening combined with columnMapping is not supported "
            "by this reader"
        )
    part_cols = (metadata or {}).get("partitionColumns") or []

    expected = None
    if (
        not widen
        and _column_mapping(metadata) is None
        and metadata
        and metadata.get("schemaString")
    ):
        # schemaString IS Spark's StructType JSON: reading with the
        # table schema makes schema evolution deterministic — a file
        # written before a column was added yields typed NULLs instead
        # of a sample-order-dependent schema (or a missing column)
        from pyspark.sql.types import StructType

        try:
            # partitioned: keep partition fields in the schema — Spark
            # resolves them from the hive path when a user schema names
            # them; unpartitioned: the schema matches the files
            expected = StructType.fromJson(
                json.loads(metadata["schemaString"])
            )
        except (KeyError, TypeError, ValueError):
            expected = None

    def one(group: list[str]) -> DataFrame:
        reader = spark.read
        if expected is not None:
            reader = reader.schema(expected)
        if part_cols:
            # hive layout stores partition columns in the path, not the
            # files: basePath discovery reconstitutes them; a layout
            # that can't is a named error, never a silent column drop
            g = reader.option("basePath", root).parquet(*group)
            missing = [c for c in part_cols if c not in g.columns]
            if missing:
                raise ValueError(
                    f"partition columns {missing} not recoverable from "
                    "the file layout"
                )
        else:
            g = reader.parquet(*group)
        if tag_identity:
            pcol = F.regexp_replace(
                F.col("_metadata.file_path"), "^file:", ""
            )
            prefix = root.rstrip("/") + "/"
            rel = F.when(
                pcol.startswith(F.lit(prefix)),
                F.substring(pcol, len(prefix) + 1, 1 << 20),
            ).otherwise(pcol)
            g = g.select(
                "*",
                rel.alias("__file"),
                F.col("_metadata.row_index").alias("__pos"),
            )
        if widen:
            g = g.select(
                [
                    F.col(c).cast(widen[c]).alias(c) if c in widen else F.col(c)
                    for c in g.columns
                ]
            )
        return g

    if not widen:
        return one(files)
    import pyarrow.parquet as pq

    groups: dict[tuple, list[str]] = {}
    for f in files:
        sch = pq.read_schema(f)
        sig = tuple(
            str(sch.field(c).type) if c in sch.names else ""
            for c in sorted(widen)
        )
        groups.setdefault(sig, []).append(f)
    parts = [one(g) for _, g in sorted(groups.items())]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def delta_snapshot_files(root: str, version: int | None = None) -> list[str]:
    """Absolute paths of the data files live at ``version`` (default:
    latest). Raises on protocol requirements this reader does not
    implement, and on deletion-vector-carrying snapshots — a bare file
    list cannot express "this file minus these rows", so callers that
    may face DV tables must go through :func:`read_delta`."""
    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    with_dv = sorted(p for p, a in adds.items() if a.get("deletionVector"))
    if with_dv:
        raise ValueError(
            f"snapshot carries deletion vectors on {with_dv}; a file "
            "list would silently include deleted rows — read through "
            "read_delta()"
        )
    return [os.path.join(root, p) for p in sorted(adds)]


def read_delta(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """DataFrame over the Delta table's snapshot at ``version`` (latest
    when None) — one distributed parquet scan over exactly the live
    files, so pushdown/pruning behave as on any parquet read. When add
    actions carry deletion vectors, the decoded (file, row_index)
    positions are anti-joined against the scan's parquet metadata
    identity — the merge-on-read semantics the protocol specifies; the
    bitmap decode itself is metadata-scale (bounded by DV cardinality),
    exactly like the log replay."""
    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    return _resolve_df(spark, root, adds, metadata)


def _resolve_df(
    spark: SparkSession, root: str, adds: dict[str, dict], metadata
) -> DataFrame:
    """Live adds -> DataFrame: one distributed scan, DV anti-join when
    add actions carry deletion vectors, physical->logical projection
    when column mapping is on. Shared by the full-replay and
    checkpointed read paths."""
    files = [os.path.join(root, p) for p in sorted(adds)]
    mapping = _column_mapping(metadata)
    dv_adds = {p: a for p, a in adds.items() if a.get("deletionVector")}
    df = _grouped_scan(spark, root, files, metadata, bool(dv_adds))
    if not dv_adds:
        if mapping:
            df = _apply_column_mapping(spark, df, files, mapping)
        return df
    rows = []
    for p in sorted(dv_adds):
        for idx in _dv_indexes(root, dv_adds[p]["deletionVector"]):
            rows.append((p, idx))
    dels = _local_df(spark, rows, "file_path string, pos long")
    df = df.join(
        dels,
        (df["__file"] == dels["file_path"]) & (df["__pos"] == dels["pos"]),
        "left_anti",
    ).drop("__file", "__pos")
    if mapping:
        df = _apply_column_mapping(spark, df, files, mapping)
    return df


def _write_single_parquet(df: DataFrame, root: str, name: str) -> None:
    """Materialize ``df`` as ONE parquet file ``root/name`` (Delta data
    files are plain files, not directories): coalesce(1) into a temp
    dir, then move the part file into place."""
    import shutil

    tmp = os.path.join(root, f"._tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(
        n for n in os.listdir(tmp)
        if n.endswith(".parquet") and not n.startswith(".")
    )
    dest = os.path.join(root, name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp, ignore_errors=True)


def run_concurrent_writes(*thunks) -> list:
    """Run independent Spark write actions from a small driver thread
    pool so each job's straggler tail back-fills with the next job's
    tasks (the guide §2.6 overlap pattern). Fixture builders lay out
    several independent single-file parquet writes — sequentially each
    pays a full job submission + single-task write latency; overlapped,
    the wall cost is ~one job. Results are returned in thunk order and
    exceptions propagate."""
    from concurrent.futures import ThreadPoolExecutor

    if len(thunks) == 1:
        return [thunks[0]()]
    with ThreadPoolExecutor(max_workers=min(4, len(thunks))) as pool:
        futures = [pool.submit(th) for th in thunks]
        return [f.result() for f in futures]


def _commit(root: str, version: int, actions: list[dict]) -> None:
    """Atomically create commit ``version`` — exclusive create ('x'),
    per the protocol's optimistic concurrency: the writer who creates
    N.json owns version N; a loser gets FileExistsError and must
    rebase (see :func:`commit_append_with_rebase`), never overwrite."""
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "x", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def commit_append_with_rebase(
    root: str, actions: list[dict], max_attempts: int = 10
) -> int:
    """Optimistic-concurrency APPEND commit: try the next version; on
    losing the exclusive create to a concurrent writer, re-read the
    log and retry at the new tip. Sound ONLY for blind appends (adds
    of fresh files + txn/commitInfo) — they conflict with nothing, the
    protocol's no-op conflict-resolution case. Actions carrying
    remove/metaData/protocol raise: those need real conflict checks.
    Returns the committed version."""
    for a in actions:
        bad = {"remove", "metaData", "protocol"} & set(a)
        if bad:
            raise ValueError(
                f"commit_append_with_rebase only handles blind appends; "
                f"action with {sorted(bad)} needs conflict resolution"
            )
    for _ in range(max_attempts):
        versions = list_commit_versions(root)
        version = (versions[-1] + 1) if versions else 0
        try:
            _commit(root, version, actions)
            return version
        except FileExistsError:
            continue  # lost the race — rebase onto the new tip
    raise RuntimeError(
        f"could not commit after {max_attempts} attempts at {root}"
    )


def write_delta_fixture(spark: SparkSession, docs: DataFrame, root: str) -> str:
    """Build a two-commit Delta table from the documents frame (the
    fixture the scan_delta_* queries parse):

      * v0: adds file-0 (lang <> 'fr') and file-1 (lang = 'fr');
      * v1: a quality rewrite of the French slice — removes file-1,
        adds file-2 holding only fr docs with n_chars >= 600.

    Data files carry (doc_id, lang, n_chars, content_h = md5(text)) so
    snapshot checksums certify content, not just counts."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    )
    run_concurrent_writes(
        lambda: _write_single_parquet(
            slim.filter(F.col("lang") != "fr"), root, "file-0.parquet"
        ),
        lambda: _write_single_parquet(
            slim.filter(F.col("lang") == "fr"), root, "file-1.parquet"
        ),
        lambda: _write_single_parquet(
            slim.filter((F.col("lang") == "fr") & (F.col("n_chars") >= 600)),
            root,
            "file-2.parquet",
        ),
    )

    def _add(name: str) -> dict:
        st = os.stat(os.path.join(root, name))
        return {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
            }
        }

    meta = {
        "metaData": {
            "id": "spark-graft-delta-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
                        {"name": "n_chars", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "content_h", "type": "string", "nullable": True, "metadata": {}},
                    ],
                }
            ),
            "partitionColumns": [],
            "configuration": {},
        }
    }
    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            meta,
            _add("file-0.parquet"),
            _add("file-1.parquet"),
        ],
    )
    _commit(
        root,
        1,
        [
            {
                "remove": {
                    "path": "file-1.parquet",
                    "deletionTimestamp": 1700000000000,
                    "dataChange": True,
                }
            },
            _add("file-2.parquet"),
        ],
    )
    return root


def write_delta_column_mapping_fixture(
    spark: SparkSession, docs: DataFrame, root: str, mode: str = "name"
) -> str:
    """Delta table with columnMapping on: physical parquet columns are
    opaque ``col-N`` names; logical names live ONLY in the
    schemaString's per-field metadata (physicalName + id). Commit v1
    RENAMES logical ``n_chars`` -> ``char_count`` with a metaData-only
    commit — zero data rewritten, the exact free-rename operation
    column mapping exists to provide. Protocol: reader 2 / writer 5."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    slim = docs.select(
        F.col("doc_id").alias("col-1"),
        F.col("lang").alias("col-2"),
        F.col("n_chars").alias("col-3"),
    )
    _write_single_parquet(slim, root, "file-0.parquet")

    def _meta(third_logical: str) -> dict:
        fields = []
        for i, (logical, typ) in enumerate(
            [("doc_id", "long"), ("lang", "string"),
             (third_logical, "long")],
            1,
        ):
            fields.append(
                {
                    "name": logical,
                    "type": typ,
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": i,
                        "delta.columnMapping.physicalName": f"col-{i}",
                    },
                }
            )
        return {
            "metaData": {
                "id": "spark-graft-delta-colmap",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": fields}
                ),
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": mode,
                    "delta.columnMapping.maxColumnId": "3",
                },
            }
        }

    st = os.stat(os.path.join(root, "file-0.parquet"))
    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            _meta("n_chars"),
            {
                "add": {
                    "path": "file-0.parquet",
                    "partitionValues": {},
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                }
            },
        ],
    )
    _commit(root, 1, [_meta("char_count")])
    return root


def write_delta_type_widening_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> str:
    """Delta table exercising the typeWidening reader feature:

      * v0: legacy protocol (reader 1), schema has ``score`` as
        INTEGER; file-0 holds the non-French docs with int32 scores
        (``n_chars % 90000``).
      * v1: the widen commit — metaData's ``score`` becomes LONG with
        the spec's ``delta.typeChanges`` field metadata recording
        {integer -> long, tableVersion 1}; protocol upgrades to
        reader 3 / writer 7 with the typeWidening feature; file-1
        adds the French docs with scores ABOVE int32 range
        (``n_chars + 3_000_000_000``) — readable only if the widened
        logical type actually reaches the old files' scan."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    run_concurrent_writes(
        lambda: _write_single_parquet(
            docs.filter(F.col("lang") != "fr").select(
                "doc_id",
                "lang",
                (F.col("n_chars") % 90000).cast("int").alias("score"),
            ),
            root,
            "file-0.parquet",
        ),
        lambda: _write_single_parquet(
            docs.filter(F.col("lang") == "fr").select(
                "doc_id",
                "lang",
                (F.col("n_chars") + F.lit(3_000_000_000)).cast("long").alias(
                    "score"
                ),
            ),
            root,
            "file-1.parquet",
        ),
    )

    def _add(name: str) -> dict:
        st = os.stat(os.path.join(root, name))
        return {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
            }
        }

    def _meta(score_type: str, type_changes: list | None) -> dict:
        md = {"delta.typeChanges": type_changes} if type_changes else {}
        return {
            "metaData": {
                "id": "spark-graft-delta-widening-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
                            {"name": "score", "type": score_type, "nullable": True, "metadata": md},
                        ],
                    }
                ),
                "partitionColumns": [],
                "configuration": {},
            }
        }

    _commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _meta("integer", None),
            _add("file-0.parquet"),
        ],
    )
    _commit(
        root,
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening"],
                    "writerFeatures": ["typeWidening"],
                }
            },
            _meta(
                "long",
                [{"fromType": "integer", "toType": "long", "tableVersion": 1}],
            ),
            _add("file-1.parquet"),
        ],
    )
    return root


def commit_with_ict(
    root: str, version: int, actions: list[dict], now_millis: int
) -> int:
    """Commit with an IN-COMMIT TIMESTAMP (writer feature
    inCommitTimestamp): the commit's logical time lives in the
    commitInfo action — the FIRST action of the commit per the spec —
    instead of the file's modification time, making timestamp
    semantics stable across file copies/restores. Monotonicity is the
    writer's job: a wall clock at or behind the previous commit's ICT
    is clamped to previous + 1. Returns the recorded ICT."""
    ict = now_millis
    versions = list_commit_versions(root) if os.path.isdir(
        os.path.join(root, "_delta_log")
    ) else []
    if versions:
        prev = _commit_ict(root, versions[-1])
        if prev is not None and ict <= prev:
            ict = prev + 1
    _commit(
        root,
        version,
        [{"commitInfo": {"inCommitTimestamp": ict}}] + actions,
    )
    return ict


def _commit_ict(root: str, version: int) -> int | None:
    """The commit's inCommitTimestamp, or None when it carries no
    commitInfo ICT (feature not enabled at that version)."""
    path = os.path.join(root, "_delta_log", f"{version:020d}.json")
    with open(path, encoding="utf-8") as fh:
        first = fh.readline().strip()
    if not first:
        return None
    action = json.loads(first)
    info = action.get("commitInfo")
    if info is None:
        return None
    ts = info.get("inCommitTimestamp")
    return int(ts) if ts is not None else None


def version_as_of_timestamp(root: str, ts_millis: int) -> int:
    """LATEST version whose in-commit timestamp is <= ``ts_millis`` —
    the spec's timestamp-based time travel under inCommitTimestamp.
    Commits without an ICT fall back to the log file's modification
    time (the pre-feature rule). Raises when the timestamp precedes
    the first commit, and on a non-monotonic ICT sequence (a corrupt
    log — the feature's core guarantee is monotonicity)."""
    versions = list_commit_versions(root)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {root}/_delta_log")
    best: int | None = None
    prev_ts: int | None = None
    for v in versions:
        ict = _commit_ict(root, v)
        if ict is None:
            path = os.path.join(root, "_delta_log", f"{v:020d}.json")
            ict = int(os.stat(path).st_mtime * 1000)
        if prev_ts is not None and ict < prev_ts:
            raise ValueError(
                f"non-monotonic inCommitTimestamp at version {v}: "
                f"{ict} < {prev_ts}"
            )
        prev_ts = ict
        if ict <= ts_millis:
            best = v
    if best is None:
        raise ValueError(
            f"timestamp {ts_millis} precedes the first commit "
            f"(version {versions[0]})"
        )
    return best


def read_delta_as_of_timestamp(
    spark: SparkSession, root: str, ts_millis: int
) -> DataFrame:
    """Snapshot read at the version resolved by
    :func:`version_as_of_timestamp` — `VERSION AS OF` semantics keyed
    by the commit's logical time."""
    return read_delta(spark, root, version_as_of_timestamp(root, ts_millis))


def write_delta_ict_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> tuple[int, int, int]:
    """Three-commit Delta table with the inCommitTimestamp writer
    feature enabled from version 0 (deterministic logical clock, 10 s
    apart):

      * v0 @ T0: file-0 = all docs;
      * v1 @ T1: quality filter — remove file-0, add file-1
        (n_chars >= 600);
      * v2 @ T2: drop French — remove file-1, add file-2
        (n_chars >= 600 AND lang <> 'fr').

    Returns (T0, T1, T2)."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    )
    run_concurrent_writes(
        lambda: _write_single_parquet(slim, root, "file-0.parquet"),
        lambda: _write_single_parquet(
            slim.filter(F.col("n_chars") >= 600), root, "file-1.parquet"
        ),
        lambda: _write_single_parquet(
            slim.filter((F.col("n_chars") >= 600) & (F.col("lang") != "fr")),
            root,
            "file-2.parquet",
        ),
    )

    def _add(name: str) -> dict:
        st = os.stat(os.path.join(root, name))
        return {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
            }
        }

    def _rm(name: str) -> dict:
        return {
            "remove": {
                "path": name,
                "deletionTimestamp": 1700000000000,
                "dataChange": True,
            }
        }

    t0, t1, t2 = 1700000000000, 1700000010000, 1700000020000
    meta = {
        "metaData": {
            "id": "spark-graft-delta-ict-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
                        {"name": "n_chars", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "content_h", "type": "string", "nullable": True, "metadata": {}},
                    ],
                }
            ),
            "partitionColumns": [],
            "configuration": {
                "delta.enableInCommitTimestamps": "true",
                "delta.inCommitTimestampEnablementVersion": "0",
                "delta.inCommitTimestampEnablementTimestamp": str(t0),
            },
        }
    }
    commit_with_ict(
        root,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": ["inCommitTimestamp"],
                }
            },
            meta,
            _add("file-0.parquet"),
        ],
        t0,
    )
    commit_with_ict(
        root, 1, [_rm("file-0.parquet"), _add("file-1.parquet")], t1
    )
    commit_with_ict(
        root, 2, [_rm("file-1.parquet"), _add("file-2.parquet")], t2
    )
    return t0, t1, t2


def clone_delta_shallow(src_root: str, dst_root: str) -> int:
    """SHALLOW CLONE: a new Delta table whose v0 commit re-adds the
    source snapshot's live files BY ABSOLUTE PATH — zero data copied,
    pure metadata. The clone's log then evolves independently:
    deletes/appends in the clone never touch the source (the command
    teams use for dev/test snapshots of production tables). DV-carrying
    sources are refused by name (the DV descriptors' relative
    addressing does not survive re-rooting here). Returns the number
    of cloned add actions."""
    adds, protocol, metadata = _replay(src_root)
    _check_protocol(protocol, metadata)
    dv = sorted(p for p, a in adds.items() if a.get("deletionVector"))
    if dv:
        raise ValueError(
            f"shallow clone over deletion-vector adds {dv} is not "
            "supported here — compact the source first"
        )
    if os.path.exists(os.path.join(dst_root, "_delta_log")):
        raise ValueError(f"_delta_log already exists at {dst_root}")
    os.makedirs(dst_root, exist_ok=True)
    actions: list[dict] = [
        {
            "protocol": protocol
            or {"minReaderVersion": 1, "minWriterVersion": 2}
        },
    ]
    if metadata is not None:
        actions.append({"metaData": metadata})
    for p in sorted(adds):
        a = dict(adds[p])
        a["path"] = os.path.abspath(os.path.join(src_root, p))
        actions.append({"add": a})
    _commit(dst_root, 0, actions)
    return len(adds)


def write_delta_row_tracking_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> str:
    """Delta table with the rowTracking writer feature: every add
    action carries ``baseRowId`` (assigned from a monotone counter at
    commit) and ``defaultRowCommitVersion``; a row's FRESH row id is
    its file's baseRowId plus its position — the Delta twin of Iceberg
    v3 row lineage. v0 adds the even doc_ids (baseRowId 0), v1 appends
    the odds (baseRowId = even count)."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    slim = docs.select("doc_id", "lang", "n_chars")
    even = slim.filter(F.col("doc_id") % 2 == 0).orderBy("doc_id")
    odd = slim.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id")
    _write_single_parquet(even, root, "file-even.parquet")
    _write_single_parquet(odd, root, "file-odd.parquet")
    n_even = even.count()
    n_odd = odd.count()

    def _add(name: str, base: int, version: int) -> dict:
        st = os.stat(os.path.join(root, name))
        return {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
                "baseRowId": base,
                "defaultRowCommitVersion": version,
            }
        }

    meta = {
        "metaData": {
            "id": "spark-graft-delta-rowtracking-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                        {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
                        {"name": "n_chars", "type": "long", "nullable": True, "metadata": {}},
                    ],
                }
            ),
            "partitionColumns": [],
            "configuration": {
                "delta.enableRowTracking": "true",
                "delta.rowTracking.rowIdHighWaterMark": str(
                    n_even + n_odd - 1
                ),
            },
        }
    }
    _commit(
        root,
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 1,
                    "minWriterVersion": 7,
                    "writerFeatures": ["rowTracking", "domainMetadata"],
                }
            },
            meta,
            _add("file-even.parquet", 0, 0),
        ],
    )
    _commit(root, 1, [_add("file-odd.parquet", n_even, 1)])
    return root


def replay_domain_metadata(
    root: str, version: int | None = None
) -> dict[str, str]:
    """Latest per-domain configuration from ``domainMetadata`` actions
    (writer feature domainMetadata): within the replay, later actions
    win and ``removed: true`` tombstones drop the domain. Returns
    {domain: configuration-json-string}."""
    versions = list_commit_versions(root)
    if version is None:
        version = versions[-1]
    domains: dict[str, str] = {}
    for v in versions:
        if v > version:
            break
        path = os.path.join(root, "_delta_log", f"{v:020d}.json")
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                dm = action.get("domainMetadata")
                if dm is None:
                    continue
                if dm.get("removed"):
                    domains.pop(dm["domain"], None)
                else:
                    domains[dm["domain"]] = dm.get("configuration", "{}")
    return domains


def append_batch_with_row_tracking(
    spark: SparkSession, root: str, batch: DataFrame
) -> tuple[int, int]:
    """Append one data file to a row-tracked table, assigning its
    ``baseRowId`` from the table's row-id HIGH-WATER MARK — stored in
    the ``delta.rowTracking`` domainMetadata domain, the protocol's
    mechanism for cross-commit counters. The commit carries the add
    (baseRowId = hwm + 1) and the domain update (new hwm), so
    concurrent readers always see ids consistent with the commit they
    resolve. Returns (version, assigned_baseRowId)."""
    adds, protocol, metadata = _replay(root)
    _check_protocol(protocol, metadata)
    feats = set((protocol or {}).get("writerFeatures") or [])
    if not {"rowTracking", "domainMetadata"} <= feats:
        raise ValueError(
            "append_batch_with_row_tracking requires the rowTracking "
            "and domainMetadata writer features, table has "
            f"{sorted(feats)}"
        )
    domains = replay_domain_metadata(root)
    dm = json.loads(domains.get("delta.rowTracking", "{}"))
    hwm = int(dm.get("rowIdHighWaterMark", -1))
    if hwm < 0:
        # fall back to the max assigned id across current adds
        hwm = -1
        for a in adds.values():
            base = a.get("baseRowId")
            if base is not None:
                import pyarrow.parquet as pq

                n = pq.read_metadata(
                    os.path.join(root, a["path"])
                ).num_rows
                hwm = max(hwm, int(base) + n - 1)
    version = list_commit_versions(root)[-1] + 1
    name = f"rowtrack-{version:05d}.parquet"
    _write_single_parquet(batch, root, name)
    import pyarrow.parquet as pq

    n_rows = pq.read_metadata(os.path.join(root, name)).num_rows
    base = hwm + 1
    st = os.stat(os.path.join(root, name))
    _commit(
        root,
        version,
        [
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                    "baseRowId": base,
                    "defaultRowCommitVersion": version,
                }
            },
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": base + n_rows - 1}
                    ),
                    "removed": False,
                }
            },
        ],
    )
    return version, base


def read_delta_with_row_ids(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read materializing the rowTracking ``_row_id``
    metadata column: baseRowId (add-action metadata) plus the row's
    position in its file. Map-side against a broadcast
    file -> baseRowId map (log-scale) — no shuffle, the durable
    identity CDC/audit joins need without a user key. Raises by name
    when an add lacks baseRowId (rowTracking not enabled for that
    file)."""
    from pyspark.sql import functions as F

    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    missing = sorted(p for p, a in adds.items() if a.get("baseRowId") is None)
    if missing:
        raise ValueError(
            f"rowTracking: add actions without baseRowId on {missing}"
        )
    dv_adds = sorted(p for p, a in adds.items() if a.get("deletionVector"))
    if dv_adds:
        raise ValueError(
            f"rowTracking read over deletion-vector adds {dv_adds} not "
            "supported here — compact first"
        )
    files = [os.path.join(root, p) for p in sorted(adds)]
    tagged = _grouped_scan(spark, root, files, metadata, True)
    fmap = F.broadcast(
        _local_df(
            spark,
            [(p, int(a["baseRowId"])) for p, a in sorted(adds.items())],
            "__lf string, __base long",
        )
    )
    return (
        tagged.join(fmap, tagged["__file"] == fmap["__lf"])
        .withColumn("_row_id", F.col("__base") + F.col("__pos"))
        .drop("__file", "__pos", "__lf", "__base")
    )


# ---------------------------------------------------------------------------
# deletion vectors (clean-room decode/encode per PROTOCOL.md "Deletion
# Vectors" + the public RoaringFormatSpec)
# ---------------------------------------------------------------------------

#: PROTOCOL.md: serialized DVs start with this little-endian magic.
_DV_MAGIC = 1681511377
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_IDX = {c: i for i, c in enumerate(_Z85)}
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347


def _z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_IDX[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def _z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _roaring32_deserialize(data: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit roaring bitmap in the portable format -> (values,
    next offset). Array, bitmap and run containers per the spec."""
    cookie = int.from_bytes(data[pos : pos + 4], "little")
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        runbits = data[pos : pos + nbytes]
        pos += nbytes

        def has_run(i: int) -> int:
            return runbits[i // 8] >> (i % 8) & 1

        has_offsets = n >= 4
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        pos += 4
        n = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4

        def has_run(i: int) -> int:
            return 0

        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for _ in range(n):
        key = int.from_bytes(data[pos : pos + 2], "little")
        card = int.from_bytes(data[pos + 2 : pos + 4], "little") + 1
        pos += 4
        keys_cards.append((key, card))
    if has_offsets:
        pos += 4 * n  # containers follow in order; offsets redundant
    vals: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if has_run(i):
            nruns = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
            for _ in range(nruns):
                start = int.from_bytes(data[pos : pos + 2], "little")
                length = int.from_bytes(data[pos + 2 : pos + 4], "little")
                pos += 4
                vals.extend(range(base + start, base + start + length + 1))
        elif card <= 4096:
            for _ in range(card):
                vals.append(
                    base + int.from_bytes(data[pos : pos + 2], "little")
                )
                pos += 2
        else:
            words = data[pos : pos + 8192]
            pos += 8192
            for bi, b in enumerate(words):
                while b:
                    bit = (b & -b).bit_length() - 1
                    vals.append(base + bi * 8 + bit)
                    b &= b - 1
    return vals, pos


def _roaring32_serialize(values: list[int]) -> bytes:
    """Portable no-run-cookie serialization (array/bitmap containers)."""
    containers: dict[int, list[int]] = {}
    for v in sorted(values):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    n = len(containers)
    head = bytearray()
    head += _SERIAL_COOKIE_NO_RUN.to_bytes(4, "little")
    head += n.to_bytes(4, "little")
    bodies = []
    for key in sorted(containers):
        vals = containers[key]
        head += key.to_bytes(2, "little")
        head += (len(vals) - 1).to_bytes(2, "little")
        if len(vals) <= 4096:
            bodies.append(b"".join(v.to_bytes(2, "little") for v in vals))
        else:
            arr = bytearray(8192)
            for v in vals:
                arr[v // 8] |= 1 << (v % 8)
            bodies.append(bytes(arr))
    off = len(head) + 4 * n
    for b in bodies:
        head += off.to_bytes(4, "little")
        off += len(b)
    return bytes(head) + b"".join(bodies)


def _roaring_array_deserialize(data: bytes) -> list[int]:
    """Magic-prefixed 64-bit RoaringBitmapArray -> sorted row indexes."""
    if int.from_bytes(data[0:4], "little") != _DV_MAGIC:
        raise ValueError("bad deletion-vector magic")
    n_bitmaps = int.from_bytes(data[4:12], "little")
    pos = 12
    out: list[int] = []
    for hi in range(n_bitmaps):
        vals, pos = _roaring32_deserialize(data, pos)
        out.extend((hi << 32) + v for v in vals)
    return out


def _roaring_array_serialize(indexes: list[int]) -> bytes:
    groups: dict[int, list[int]] = {}
    for v in sorted(indexes):
        groups.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n_bitmaps = (max(groups) + 1) if groups else 0
    out = bytearray()
    out += _DV_MAGIC.to_bytes(4, "little")
    out += n_bitmaps.to_bytes(8, "little")
    for hi in range(n_bitmaps):
        out += _roaring32_serialize(groups.get(hi, []))
    return bytes(out)


def _dv_indexes(root: str, dv: dict) -> list[int]:
    """Decode a deletionVector descriptor -> deleted row indexes.
    storageType 'i' = z85 inline, 'u' = UUID-named file under the table
    (optional random prefix), 'p' = absolute path; file form carries a
    1-byte format version, then per DV a big-endian size, the
    magic-prefixed bitmap, and a big-endian CRC-32."""
    st = dv["storageType"]
    if st == "i":
        return _roaring_array_deserialize(_z85_decode(dv["pathOrInlineDv"]))
    if st == "p":
        path = dv["pathOrInlineDv"]
    elif st == "u":
        enc = dv["pathOrInlineDv"]
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuidlib.UUID(bytes=_z85_decode(tail))
        path = os.path.join(root, prefix, f"deletion_vector_{u}.bin")
    else:
        raise ValueError(f"unsupported DV storageType {st!r}")
    with open(path, "rb") as fh:
        raw = fh.read()
    if raw[0] != 1:
        raise ValueError(f"unsupported DV file format version {raw[0]}")
    off = dv["offset"]
    size = int.from_bytes(raw[off : off + 4], "big")
    data = raw[off + 4 : off + 4 + size]
    crc = int.from_bytes(raw[off + 4 + size : off + 8 + size], "big")
    if zlib.crc32(data) != crc:
        raise ValueError("deletion-vector checksum mismatch")
    return _roaring_array_deserialize(data)


def delete_where_with_dv(
    spark: SparkSession, root: str, condition
) -> tuple[int, int]:
    """Merge-on-read DELETE via deletion vectors: rows of the current
    snapshot matching ``condition`` become per-file row-index bitmaps in
    ONE new DV file; each affected data file is re-added with its
    (merged) DV descriptor and the superseded add removed — zero data
    files rewritten, the exact commit shape the protocol specifies for
    DV writes. Upgrades the table protocol to reader 3 / writer 7 with
    the deletionVectors feature. Returns (version, n_newly_deleted)."""
    return _dv_delete(spark, root, lambda df: df.filter(condition))


def delete_keys_with_dv(
    spark: SparkSession, root: str, keys: DataFrame, key: str
) -> tuple[int, int]:
    """Merge-on-read DELETE of every row whose ``key`` appears in
    ``keys`` (semi-join selector) — the shape a curation pipeline uses
    to materialize a computed drop list (dedup losers, policy
    violations) as deletion vectors without rewriting a byte of data.
    Returns (version, n_newly_deleted)."""
    k = keys.select(key).distinct()
    return _dv_delete(spark, root, lambda df: df.join(k, key, "left_semi"))


def _dv_delete(spark: SparkSession, root: str, select_live) -> tuple[int, int]:
    adds, protocol, metadata = _replay(root)
    _check_protocol(protocol, metadata)
    _check_append_only(metadata, "a deletion-vector DELETE")
    existing: dict[str, list[int]] = {
        p: _dv_indexes(root, a["deletionVector"])
        for p, a in adds.items()
        if a.get("deletionVector")
    }
    # live rows with identity = current scan minus existing DVs
    # (read_delta dropped its identity cols; re-derive on the same
    # grouped scan so widened tables filter on the logical types)
    files = [os.path.join(root, p) for p in sorted(adds)]
    tagged = _grouped_scan(spark, root, files, metadata, True)
    if existing:
        old = _local_df(
            spark,
            [(p, i) for p, idxs in existing.items() for i in idxs],
            "file_path string, pos long",
        )
        tagged = tagged.join(
            old,
            (tagged["__file"] == old["file_path"])
            & (tagged["__pos"] == old["pos"]),
            "left_anti",
        )
    hit = (
        select_live(tagged)
        .select("__file", "__pos")
        # driver-ok: DV construction — deleted positions are protocol
        # metadata (the bitmap is driver-written), metadata-scale like
        # the log itself
        .collect()
    )
    new_by_file: dict[str, list[int]] = {}
    for r in hit:
        new_by_file.setdefault(r["__file"], []).append(r["__pos"])
    n_new = len(hit)
    version = list_commit_versions(root)[-1] + 1
    u = _uuidlib.uuid4()
    dv_name = f"deletion_vector_{u}.bin"
    blob = bytearray(b"\x01")  # format version
    descriptors: dict[str, dict] = {}
    for p in sorted(new_by_file):
        merged = sorted(set(existing.get(p, [])) | set(new_by_file[p]))
        data = _roaring_array_serialize(merged)
        off = len(blob)
        blob += len(data).to_bytes(4, "big")
        blob += data
        blob += zlib.crc32(data).to_bytes(4, "big")
        descriptors[p] = {
            "storageType": "u",
            "pathOrInlineDv": _z85_encode(u.bytes),
            "offset": off,
            "sizeInBytes": len(data),
            "cardinality": len(merged),
        }
    with open(os.path.join(root, dv_name), "wb") as fh:
        fh.write(blob)
    # upgrade preserves features the table already declares (a DV
    # delete on e.g. a typeWidening table must not clobber the list —
    # protocol actions REPLACE, they don't merge)
    prior_r = set((protocol or {}).get("readerFeatures") or [])
    prior_w = set((protocol or {}).get("writerFeatures") or [])
    actions: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": max(
                    3, (protocol or {}).get("minReaderVersion", 1)
                ),
                "minWriterVersion": max(
                    7, (protocol or {}).get("minWriterVersion", 1)
                ),
                "readerFeatures": sorted(prior_r | {"deletionVectors"}),
                "writerFeatures": sorted(prior_w | {"deletionVectors"}),
            }
        }
    ]
    ts = 1700000000000
    for p in sorted(descriptors):
        old_add = adds[p]
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": ts,
                    "dataChange": True,
                    **(
                        {"deletionVector": old_add["deletionVector"]}
                        if old_add.get("deletionVector")
                        else {}
                    ),
                }
            }
        )
        new_add = dict(old_add)
        new_add["deletionVector"] = descriptors[p]
        new_add["dataChange"] = True
        actions.append({"add": new_add})
    _commit(root, version, actions)
    return version, n_new


def _stats_observed(df: DataFrame):
    """(df_with_metrics, resolve) — the protocol's per-file ``stats``
    JSON (numRecords + minValues/maxValues over atomic columns) attached
    as an Observation so the WRITE job itself computes it: the same
    count/min/max aggregate functions run over the same rows (values
    identical to a separate .agg().collect()), but the batch frame is
    scanned ONCE instead of twice per commit (r11 profile: the separate
    stats pass re-ran the batch's whole source filter per append —
    stream_delta_source_tail paid it four times). Call ``resolve()``
    only after the write action ran."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    atomic = [
        f.name
        for f in df.schema.fields
        if f.dataType.simpleString()
        in ("bigint", "int", "smallint", "tinyint", "double", "float",
            "string", "boolean", "date")
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in atomic:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    obs = Observation()

    def _j(v):
        if v is None:
            return None
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    def resolve() -> str:
        # Bounded wait instead of Observation.get's indefinite block: if a
        # future code path calls resolve() before any action ran on the
        # observed frame, fail loudly rather than hang the commit. The JVM
        # side's getRowOrEmpty waits ~100 ms per probe.
        deadline = time.monotonic() + 30.0
        while obs._jo.getRowOrEmpty().isEmpty():
            if time.monotonic() > deadline:
                raise RuntimeError(
                    "_stats_observed.resolve() called but no action has "
                    "run on the observed frame within 30 s — write the "
                    "batch before resolving its stats"
                )
        row = obs.get
        return json.dumps(
            {
                "numRecords": row["__n"],
                "minValues": {c: _j(row[f"__min_{c}"]) for c in atomic},
                "maxValues": {c: _j(row[f"__max_{c}"]) for c in atomic},
            }
        )

    return df.observe(obs, *aggs), resolve


def delta_snapshot_files_pruned(
    root: str,
    range_filter: dict[str, tuple],
    version: int | None = None,
) -> tuple[list[str], int]:
    """Data skipping on add-action ``stats``: files whose recorded
    [minValues, maxValues] miss the query range for any filtered
    column are skipped WITHOUT being opened — Delta's twin of the
    Iceberg column-metrics prune. Files lacking stats for a column are
    kept (skipping must never drop data it can't judge). Returns
    (files, n_live_total) with the pre-prune count as the audit."""
    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    with_dv = sorted(p for p, a in adds.items() if a.get("deletionVector"))
    if with_dv:
        raise ValueError(
            f"snapshot carries deletion vectors on {with_dv}; read "
            "through read_delta()"
        )
    out = []
    for p in sorted(adds):
        a = adds[p]
        stats = a.get("stats")
        skip = False
        if stats:
            s = json.loads(stats) if isinstance(stats, str) else stats
            mins = s.get("minValues") or {}
            maxs = s.get("maxValues") or {}
            for col, (lo, hi) in range_filter.items():
                if lo is not None and col in maxs and maxs[col] is not None:
                    if maxs[col] < lo:
                        skip = True
                if hi is not None and col in mins and mins[col] is not None:
                    if mins[col] > hi:
                        skip = True
        if not skip:
            out.append(os.path.join(root, p))
    return out, len(adds)


def restore_delta(spark: SparkSession, root: str, version: int) -> int:
    """RESTORE: roll the table back to ``version`` as a NEW commit —
    adds the old snapshot's files, removes the current one's (so
    history stays linear and the bad versions remain auditable; this
    is the protocol's restore shape, not a log rewrite). DV-carrying
    snapshots restore with their descriptors intact. Returns the new
    version."""
    cur_adds, protocol, metadata = _replay(root)
    _check_protocol(protocol, metadata)
    _check_append_only(metadata, "RESTORE (removes current files)")
    old_adds, old_protocol, old_metadata = _replay(root, version)
    _check_protocol(old_protocol, old_metadata)
    new_version = list_commit_versions(root)[-1] + 1
    ts = 1700000000000
    actions: list[dict] = []
    if old_metadata is not None and old_metadata != metadata:
        actions.append({"metaData": old_metadata})
    for p in sorted(cur_adds):
        if p not in old_adds or cur_adds[p] != old_adds[p]:
            actions.append(
                {
                    "remove": {
                        "path": p,
                        "deletionTimestamp": ts,
                        "dataChange": True,
                    }
                }
            )
    for p in sorted(old_adds):
        if p not in cur_adds or cur_adds[p] != old_adds[p]:
            actions.append({"add": old_adds[p]})
    _commit(root, new_version, actions)
    return new_version


def write_delta_partitioned_fixture(
    spark: SparkSession, docs: DataFrame, root: str
) -> str:
    """HIVE-PARTITIONED Delta table: one data file per ``lang`` under
    ``lang=<value>/`` directories, each add action carrying its
    ``partitionValues`` — the protocol's partition layout, enabling
    log-only partition pruning."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    slim = docs.select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_h")
    )
    langs = sorted(
        r[0]
        # driver-ok: one row per lang — bounded enum domain, not rows
        for r in slim.select("lang").distinct().collect()
    )  # metadata-scale: one row per partition value
    actions: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "spark-graft-delta-partitioned-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": "doc_id", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "lang", "type": "string", "nullable": True, "metadata": {}},
                            {"name": "n_chars", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "content_h", "type": "string", "nullable": True, "metadata": {}},
                        ],
                    }
                ),
                "partitionColumns": ["lang"],
                "configuration": {},
            }
        },
    ]
    for lang in langs:
        name = f"lang={lang}/part-0.parquet"
        # partition column is NOT stored in the data file (hive layout)
        _write_single_parquet(
            slim.filter(F.col("lang") == lang).drop("lang"), root, name
        )
        st = os.stat(os.path.join(root, name))
        actions.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {"lang": lang},
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                }
            }
        )
    _commit(root, 0, actions)
    return root


def read_delta_partition_pruned(
    spark: SparkSession,
    root: str,
    partition_filter: dict[str, set] | None = None,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Partition-pruned snapshot read: add actions whose
    ``partitionValues`` miss the filter are dropped from the scan
    WITHOUT touching their files — pure log metadata, the Delta twin of
    Iceberg's manifest-entry partition pruning, under the same
    conservative rule: a file whose partitionValues carry NO value for
    a filtered column is KEPT (pruning only ever acts on a recorded
    non-matching value — never drop data you can't judge). The kept
    files read as ONE distributed scan with ``basePath`` partition
    discovery, so the hive-layout partition column reconstitutes
    natively. Returns (df, n_files_scanned, n_files_total)."""
    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    keep: list[str] = []
    for p in sorted(adds):
        pv = adds[p].get("partitionValues") or {}
        pruned = False
        for k, allowed in partition_filter.items() if partition_filter else ():
            if k not in pv:
                # no recorded value for this column — pruning must never
                # drop data it can't judge (the Iceberg path's rule):
                # keep the file and let the scan filter decide
                continue
            if pv[k] not in {
                None if v is None else str(v) for v in allowed
            }:
                pruned = True
                break
        if pruned:
            continue
        keep.append(os.path.join(root, p))
    if not keep:
        raise ValueError("partition filter prunes every file")
    df = spark.read.option("basePath", root).parquet(*keep)
    return df, len(keep), len(adds)


def write_delta_generated_partition_fixture(
    spark: SparkSession, events: DataFrame, root: str
) -> str:
    """Delta table partitioned by a GENERATED COLUMN: ``day`` carries
    ``delta.generationExpression = "CAST(ts AS DATE)"`` in its field
    metadata (writer feature generatedColumns), and the data lands
    hive-partitioned one file per day in ONE distributed pass
    (repartition on the day key + partitionBy write). Readers can
    derive a partition filter from a predicate on the BASE column —
    the generated-column pruning contract."""
    import shutil

    from pyspark.sql import functions as F

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    (
        events.select("event_type", "ts", "value")
        .withColumn("day", F.to_date("ts").cast("string"))
        .repartition(
            events.sparkSession.sparkContext.defaultParallelism,
            F.col("day"),
        )
        .sortWithinPartitions("day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(os.path.join(root, "._tmp_gen"))
    )
    import glob as _glob

    actions: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": 1,
                "minWriterVersion": 7,
                "writerFeatures": ["generatedColumns"],
            }
        },
        {
            "metaData": {
                "id": "spark-graft-delta-generated-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": "event_type", "type": "string", "nullable": True, "metadata": {}},
                            {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
                            {"name": "value", "type": "double", "nullable": True, "metadata": {}},
                            {
                                "name": "day",
                                "type": "date",
                                "nullable": True,
                                "metadata": {
                                    "delta.generationExpression": "CAST(ts AS DATE)"
                                },
                            },
                        ],
                    }
                ),
                "partitionColumns": ["day"],
                "configuration": {},
            }
        },
    ]
    tmp = os.path.join(root, "._tmp_gen")
    for d in sorted(os.listdir(tmp)):
        if not d.startswith("day="):
            continue
        day = d.split("=", 1)[1]
        parts = sorted(_glob.glob(os.path.join(tmp, d, "part-*.parquet")))
        assert len(parts) == 1, f"day {day} split across tasks"
        name = f"{d}/part-0.parquet"
        os.makedirs(os.path.join(root, d), exist_ok=True)
        os.rename(parts[0], os.path.join(root, name))
        st = os.stat(os.path.join(root, name))
        actions.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {"day": day},
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": True,
                }
            }
        )
    import shutil as _shutil

    _shutil.rmtree(tmp, ignore_errors=True)
    _commit(root, 0, actions)
    return root


def partition_filter_from_generated(
    metadata: dict | None, base_col: str, lo, hi
) -> dict[str, set]:
    """Derive a PARTITION filter from a predicate on the generated
    column's BASE column: for a partition column whose
    ``delta.generationExpression`` is ``CAST(<base> AS DATE)``, a
    ``lo <= base < hi`` timestamp range maps to the covering set of
    day strings — the rewrite that lets queries on the raw timestamp
    prune generated date partitions. Raises by name on expressions
    this deriver does not understand (silently skipping would scan
    everything and hide the contract)."""
    import datetime as _dt

    fields = json.loads(metadata["schemaString"])["fields"]
    part_cols = metadata.get("partitionColumns") or []
    out: dict[str, set] = {}
    for f in fields:
        if f["name"] not in part_cols:
            continue
        expr = (f.get("metadata") or {}).get("delta.generationExpression")
        if expr is None:
            continue
        want = f"CAST({base_col} AS DATE)"
        if expr.strip().upper() != want.upper():
            raise ValueError(
                f"unsupported generationExpression {expr!r} "
                f"(this deriver understands {want!r})"
            )
        days = set()
        d = lo.date()
        end = hi.date() if (hi.time() != _dt.time()) else (
            hi.date() - _dt.timedelta(days=1)
        )
        while d <= end:
            days.add(d.isoformat())
            d += _dt.timedelta(days=1)
        out[f["name"]] = days
    if not out:
        raise ValueError(
            f"no generated partition column derives from {base_col!r}"
        )
    return out


def _footer_stats(path: str) -> str:
    """Per-file stats JSON recovered from the parquet FOOTER (row-group
    min/max + num_rows) — metadata-scale, the write-side half of data
    skipping for files the engine just produced. Columns with missing
    or non-decodable statistics in any row group are omitted (skipping
    must never claim bounds it can't prove)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    mins: dict = {}
    maxs: dict = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for ci in range(rgm.num_columns):
            col = rgm.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    bad.add(name)
                    continue
            if isinstance(mn, str) and (len(mn) >= 64 or len(mx) >= 64):
                # parquet may TRUNCATE long binary stats; an
                # under-reported max would wrongly prune — drop the
                # column's bounds instead of trusting them
                bad.add(name)
                continue
            if hasattr(mn, "isoformat"):
                mn, mx = mn.isoformat(), mx.isoformat()
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    for name in bad:
        mins.pop(name, None)
        maxs.pop(name, None)
    return json.dumps(
        {"numRecords": md.num_rows, "minValues": mins, "maxValues": maxs}
    )


#: z-order grid depth: 8 bits per key -> 16-bit interleaved z-value
_Z_BITS = 8
_Z_SIDE = 1 << _Z_BITS


def compact_delta(
    spark: SparkSession,
    root: str,
    max_files: int = 1,
    zorder_by: tuple[str, str] | None = None,
) -> tuple[int, int, int]:
    """OPTIMIZE: bin-pack the snapshot's data files into ``max_files``
    larger ones and commit the rewrite with ``dataChange: false`` on
    every action — the protocol's signal that the commit reorganizes
    bytes without changing rows (streaming consumers skip it; the CDF
    reader here ignores non-dataChange adds for the same reason).
    DV-carrying snapshots compact through the resolving read, folding
    deletions into the rewrite. Column-mapped tables compact correctly:
    read_delta surfaces LOGICAL names, so the rewrite projects back to
    the schemaString's physical names (carrying parquet field ids for
    mode ``id``) before writing — otherwise the next read's
    physical->logical projection would find no ``col-N`` columns and
    return all-NULL rows. Returns (version, n_files_before,
    n_files_after)."""
    from pyspark.sql import functions as F

    adds, protocol, metadata = _replay(root)
    _check_protocol(protocol, metadata)
    _check_append_only(metadata, "OPTIMIZE (rewrites files)")
    if (metadata or {}).get("partitionColumns"):
        # a flat rewrite would strip the hive layout the partition
        # columns live in; per-partition compaction is not implemented
        raise ValueError(
            "OPTIMIZE on a partitioned table is not supported here — "
            "files must stay under their partition directories"
        )
    n_before = len(adds)
    df = read_delta(spark, root)
    mapping = _column_mapping(metadata)
    restore_field_id_conf: str | None = None
    if mapping is not None:
        phys_cols = []
        for m in mapping:
            if m["name"] not in df.columns:
                continue
            if m["id"] is not None:
                phys_cols.append(
                    F.col(m["name"]).alias(
                        m["physicalName"],
                        metadata={"parquet.field.id": int(m["id"])},
                    )
                )
            else:
                phys_cols.append(F.col(m["name"]).alias(m["physicalName"]))
        df = df.select(*phys_cols)
        restore_field_id_conf = spark.conf.get(
            "spark.sql.parquet.fieldId.write.enabled", None
        )
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    version = list_commit_versions(root)[-1] + 1
    names = []
    try:
        if zorder_by is not None:
            if mapping is not None:
                raise ValueError(
                    "OPTIMIZE ZORDER on a column-mapped table is not "
                    "supported here"
                )
            names = _write_zordered(spark, df, root, version, max_files,
                                    zorder_by)
        elif max_files == 1:
            name = f"compact-{version:05d}.parquet"
            _write_single_parquet(df, root, name)
            names.append(name)
        else:
            tmp = os.path.join(root, f"._tmp_compact_{version}")
            df.coalesce(max_files).write.mode("overwrite").parquet(tmp)
            import shutil

            for i, part in enumerate(
                sorted(
                    n
                    for n in os.listdir(tmp)
                    if n.endswith(".parquet") and not n.startswith(".")
                )
            ):
                name = f"compact-{version:05d}-{i:03d}.parquet"
                shutil.move(os.path.join(tmp, part), os.path.join(root, name))
                names.append(name)
            shutil.rmtree(tmp, ignore_errors=True)
    finally:
        # the fieldId conf is session-global: restore the caller's value
        # so unrelated writes in the same session keep their footers
        if mapping is not None:
            if restore_field_id_conf is None:
                spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
            else:
                spark.conf.set(
                    "spark.sql.parquet.fieldId.write.enabled",
                    restore_field_id_conf,
                )
    actions: list[dict] = []
    ts = 1700000000000
    for name in names:
        actions.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(root, name)),
                    "modificationTime": ts,
                    "dataChange": False,
                    # compaction must not lose data skipping: stats
                    # come back from the parquet footers just written
                    "stats": _footer_stats(os.path.join(root, name)),
                }
            }
        )
    for p, a in sorted(adds.items()):
        rm = {"path": p, "deletionTimestamp": ts, "dataChange": False}
        if a.get("deletionVector"):
            rm["deletionVector"] = a["deletionVector"]
        actions.append({"remove": rm})
    if zorder_by is not None:
        # record the clustering state the way liquid clustering does:
        # a domainMetadata domain any writer can consult to keep the
        # layout on future OPTIMIZE runs
        actions.append(
            {
                "domainMetadata": {
                    "domain": "delta.clustering",
                    "configuration": json.dumps(
                        {"clusteringColumns": list(zorder_by)}
                    ),
                    "removed": False,
                }
            }
        )
    _commit(root, version, actions)
    return version, n_before, len(names)


def _write_zordered(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    version: int,
    max_files: int,
    zorder_by: tuple[str, str],
) -> list[str]:
    """OPTIMIZE ZORDER write path: quantize the two clustering keys to
    an 8-bit grid, interleave the bits into a 16-bit Morton z-value,
    and split the z-RANGE (not the row stream) into ``max_files``
    groups — a deterministic assignment (``zf = zval * max_files >>
    16``) with no sampling-dependent range partitioner, so layouts are
    reproducible. One distributed pass: rows hash-repartition on their
    group id (each group lands wholly in one task) and a partitionBy
    write emits one file per group, each covering a small (x, y) box
    whose footer min/max prune range queries on EITHER key."""
    import shutil

    from pyspark.sql import functions as F

    cx, cy = zorder_by
    b = df.agg(
        F.min(cx).alias("xlo"),
        F.max(cx).alias("xhi"),
        F.min(cy).alias("ylo"),
        F.max(cy).alias("yhi"),
    ).collect()[0]  # 4 scalars — metadata-scale

    def _quant(col, lo, hi):
        return ((col - F.lit(lo)) * _Z_SIDE / F.lit(hi - lo + 1)).cast(
            "long"
        )

    x = _quant(F.col(cx), b["xlo"], b["xhi"])
    y = _quant(F.col(cy), b["ylo"], b["yhi"])
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    zf = (z * max_files / (1 << (2 * _Z_BITS))).cast("long")
    tmp = os.path.join(root, f"._tmp_zorder_{version}")
    (
        df.withColumn("__zf", zf)
        .repartition(max_files, F.col("__zf"))
        .sortWithinPartitions("__zf")
        .write.mode("overwrite")
        .partitionBy("__zf")
        .parquet(tmp)
    )
    names: list[str] = []
    for d in sorted(os.listdir(tmp)):
        if not d.startswith("__zf="):
            continue
        zval = int(d.split("=", 1)[1])
        parts = sorted(
            n
            for n in os.listdir(os.path.join(tmp, d))
            if n.endswith(".parquet") and not n.startswith(".")
        )
        assert len(parts) == 1, f"z-group {zval} split across tasks"
        name = f"compact-{version:05d}-z{zval:03d}.parquet"
        shutil.move(
            os.path.join(tmp, d, parts[0]), os.path.join(root, name)
        )
        names.append(name)
    shutil.rmtree(tmp, ignore_errors=True)
    return names


def vacuum_delta(root: str, retain_last: int = 1) -> list[str]:
    """Physically delete data files (and DV sidecars) referenced by
    NONE of the last ``retain_last`` versions' snapshots — the
    protocol's VACUUM: removes are logical until vacuum makes them
    physical, trading time travel beyond the retention horizon for
    storage. Returns the deleted table-relative paths. The log itself
    is never touched (history/audit stays readable; only the bytes
    go)."""
    versions = list_commit_versions(root)
    keep: set[str] = set()
    for v in versions[-retain_last:]:
        # retained commits keep their change-data files (CDF consumers
        # may still tail this window)
        with open(
            os.path.join(root, "_delta_log", f"{v:020d}.json"),
            encoding="utf-8",
        ) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    action = json.loads(line)
                    if "cdc" in action:
                        keep.add(os.path.normpath(action["cdc"]["path"]))
        adds, _, _ = _replay(root, v)
        for p, a in adds.items():
            keep.add(os.path.normpath(p))
            dv = a.get("deletionVector")
            if dv and dv.get("storageType") == "u":
                enc = dv["pathOrInlineDv"]
                prefix, tail = enc[:-20], enc[-20:]
                u = _uuidlib.UUID(bytes=_z85_decode(tail))
                keep.add(
                    os.path.normpath(
                        os.path.join(prefix, f"deletion_vector_{u}.bin")
                    )
                )
    deleted = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d != "_delta_log"]
        for fn in filenames:
            if not (fn.endswith(".parquet") or fn.endswith(".bin")):
                continue
            rel = os.path.normpath(
                os.path.relpath(os.path.join(dirpath, fn), root)
            )
            if rel not in keep:
                os.remove(os.path.join(dirpath, fn))
                deleted.append(rel)
    return sorted(deleted)


# ---------------------------------------------------------------------------
# checkpoint support (log compaction per the Delta protocol)
# ---------------------------------------------------------------------------


def _last_checkpoint(root: str) -> dict | None:
    p = os.path.join(root, "_delta_log", "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def write_checkpoint(root: str, version: int, parts: int = 1) -> str:
    """Materialize the snapshot state at ``version`` as a
    ``%020d.checkpoint.parquet`` — one row per live add action PLUS the
    protocol and metaData rows the spec requires a checkpoint to carry
    (a reader starting at the checkpoint must be able to reconstruct
    them without older JSON commits) — plus the ``_last_checkpoint``
    pointer. Written with pyarrow: the checkpoint is metadata-scale,
    and keeping the log layer Spark-free mirrors how production
    readers resolve snapshots before any cluster work starts.

    ``parts > 1`` writes the spec's MULTI-PART checkpoint — N files
    named ``%020d.checkpoint.%010d.%010d.parquet`` (1-indexed part /
    total) with the add rows split across parts and the pointer
    carrying ``parts: N``; routine for large tables whose single
    checkpoint parquet would be unwieldy. Returns the (first) file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    rel = sorted(adds)
    n = len(rel)
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("deletionVector", dv_t),
            ("baseRowId", pa.int64()),
            ("defaultRowCommitVersion", pa.int64()),
        ]
    )
    remove_t = pa.struct([("path", pa.string()), ("dataChange", pa.bool_())])
    protocol_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    proto_row = {
        "minReaderVersion": (protocol or {}).get("minReaderVersion", 1),
        "minWriterVersion": (protocol or {}).get("minWriterVersion", 2),
        # reader-v3/writer-v7 tables MUST carry their feature lists in
        # the checkpoint — a foreign reader gates on them by name
        "readerFeatures": (protocol or {}).get("readerFeatures"),
        "writerFeatures": (protocol or {}).get("writerFeatures"),
    }
    meta_row = None
    if metadata is not None:
        meta_row = {
            "id": metadata.get("id"),
            "format": {
                "provider": (metadata.get("format") or {}).get(
                    "provider", "parquet"
                )
            },
            "schemaString": metadata.get("schemaString"),
            "partitionColumns": metadata.get("partitionColumns") or [],
            "configuration": list(
                (metadata.get("configuration") or {}).items()
            ),
        }
    table = pa.table(
        {
            "add": pa.array(
                [
                    {
                        "path": p,
                        # the FULL spec add action: partitionValues /
                        # size / modificationTime are required fields,
                        # and stats must survive the checkpoint or data
                        # skipping dies after checkpoint-seeded replay
                        "partitionValues": list(
                            (adds[p].get("partitionValues") or {}).items()
                        ),
                        "size": adds[p].get("size"),
                        "modificationTime": adds[p].get(
                            "modificationTime"
                        ),
                        "dataChange": bool(
                            adds[p].get("dataChange", True)
                        ),
                        "stats": adds[p].get("stats"),
                        "deletionVector": adds[p].get("deletionVector"),
                        "baseRowId": adds[p].get("baseRowId"),
                        "defaultRowCommitVersion": adds[p].get(
                            "defaultRowCommitVersion"
                        ),
                    }
                    for p in rel
                ]
                + [None, None],
                type=add_t,
            ),
            "remove": pa.array([None] * (n + 2), type=remove_t),
            "protocol": pa.array(
                [None] * n + [proto_row, None], type=protocol_t
            ),
            "metaData": pa.array(
                [None] * (n + 1) + [meta_row], type=meta_t
            ),
        }
    )
    pointer: dict = {"version": version, "size": n + 2}
    if parts <= 1:
        cp = os.path.join(
            root, "_delta_log", f"{version:020d}.checkpoint.parquet"
        )
        pq.write_table(table, cp)
    else:
        # contiguous row ranges per part; protocol/metaData rows ride
        # in the last slice (the spec allows any distribution)
        total = n + 2
        per = -(-total // parts)  # ceil
        first = None
        for i in range(parts):
            sl = table.slice(i * per, per)
            part_path = os.path.join(
                root,
                "_delta_log",
                f"{version:020d}.checkpoint."
                f"{i + 1:010d}.{parts:010d}.parquet",
            )
            pq.write_table(sl, part_path)
            if first is None:
                first = part_path
        pointer["parts"] = parts
        cp = first
    with open(
        os.path.join(root, "_delta_log", "_last_checkpoint"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump(pointer, fh)
    return cp


def write_checkpoint_v2(
    root: str, version: int, sidecars: int = 2, uuid: str | None = None
) -> str:
    """Materialize the snapshot state at ``version`` as a V2 CHECKPOINT
    per the protocol's v2Checkpoint feature: a UUID-named manifest
    ``%020d.checkpoint.<uuid>.parquet`` carrying checkpointMetadata /
    protocol / metaData / sidecar actions, with the add actions split
    across ``sidecars`` files under ``_delta_log/_sidecars/`` — the
    layout that lets large tables rewrite only changed sidecar slices
    between checkpoints instead of one monolithic parquet. Returns the
    manifest path and updates ``_last_checkpoint``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds, protocol, metadata = _replay(root, version)
    _check_protocol(protocol, metadata)
    uuid = uuid or str(_uuidlib.uuid4())
    log_dir = os.path.join(root, "_delta_log")
    side_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(side_dir, exist_ok=True)
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("deletionVector", dv_t),
            ("baseRowId", pa.int64()),
            ("defaultRowCommitVersion", pa.int64()),
        ]
    )

    def _add_row(p: str) -> dict:
        a = adds[p]
        return {
            "path": p,
            "partitionValues": list((a.get("partitionValues") or {}).items()),
            "size": a.get("size"),
            "modificationTime": a.get("modificationTime"),
            "dataChange": bool(a.get("dataChange", True)),
            "stats": a.get("stats"),
            "deletionVector": a.get("deletionVector"),
            "baseRowId": a.get("baseRowId"),
            "defaultRowCommitVersion": a.get("defaultRowCommitVersion"),
        }

    rel = sorted(adds)
    n_side = max(1, min(sidecars, len(rel) or 1))
    per = -(-len(rel) // n_side) if rel else 0
    sidecar_rows = []
    for i in range(n_side):
        chunk = rel[i * per : (i + 1) * per]
        name = f"{uuid}-{i + 1:03d}.parquet"
        sp = os.path.join(side_dir, name)
        pq.write_table(
            pa.table(
                {"add": pa.array([_add_row(p) for p in chunk], type=add_t)}
            ),
            sp,
        )
        sidecar_rows.append(
            {
                "path": name,
                "sizeInBytes": os.path.getsize(sp),
                "modificationTime": 1700000000000,
            }
        )
    sidecar_t = pa.struct(
        [
            ("path", pa.string()),
            ("sizeInBytes", pa.int64()),
            ("modificationTime", pa.int64()),
        ]
    )
    cpmeta_t = pa.struct([("version", pa.int64())])
    protocol_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    proto_row = {
        "minReaderVersion": (protocol or {}).get("minReaderVersion", 1),
        "minWriterVersion": (protocol or {}).get("minWriterVersion", 2),
        "readerFeatures": (protocol or {}).get("readerFeatures"),
        "writerFeatures": (protocol or {}).get("writerFeatures"),
    }
    meta_row = None
    if metadata is not None:
        meta_row = {
            "id": metadata.get("id"),
            "format": {
                "provider": (metadata.get("format") or {}).get(
                    "provider", "parquet"
                )
            },
            "schemaString": metadata.get("schemaString"),
            "partitionColumns": metadata.get("partitionColumns") or [],
            "configuration": list(
                (metadata.get("configuration") or {}).items()
            ),
        }
    n = len(sidecar_rows)
    manifest = pa.table(
        {
            "checkpointMetadata": pa.array(
                [{"version": version}] + [None] * (n + 2), type=cpmeta_t
            ),
            "sidecar": pa.array(
                [None] + sidecar_rows + [None, None], type=sidecar_t
            ),
            "protocol": pa.array(
                [None] * (n + 1) + [proto_row, None], type=protocol_t
            ),
            "metaData": pa.array(
                [None] * (n + 2) + [meta_row], type=meta_t
            ),
        }
    )
    cp = os.path.join(
        log_dir, f"{version:020d}.checkpoint.{uuid}.parquet"
    )
    pq.write_table(manifest, cp)
    with open(
        os.path.join(log_dir, "_last_checkpoint"), "w", encoding="utf-8"
    ) as fh:
        json.dump({"version": version, "size": n + 3}, fh)
    return cp


def delta_snapshot_files_checkpointed(
    root: str, version: int | None = None
) -> tuple[list[str], int, int]:
    """Like :func:`delta_snapshot_files` but resolving THROUGH the
    checkpoint when one covers the requested version: the live-file
    baseline comes from the checkpoint parquet and only the JSON
    commits AFTER it are replayed. Returns
    ``(files, checkpoint_version_used, n_json_commits_replayed)`` —
    -1 for the version when no checkpoint applies (full JSON replay).
    At scale this is the difference between reading one compacted
    file + a handful of tail commits and replaying an unbounded log."""
    adds, _, _, cp_version, replayed = _replay_from_checkpoint(
        root, version
    )
    with_dv = sorted(p for p, a in adds.items() if a.get("deletionVector"))
    if with_dv:
        raise ValueError(
            f"snapshot carries deletion vectors on {with_dv}; a file "
            "list would silently include deleted rows — read through "
            "read_delta_checkpointed()"
        )
    files = [os.path.join(root, p) for p in sorted(adds)]
    return files, cp_version, replayed


def _replay_from_checkpoint(
    root: str, version: int | None = None
) -> tuple[dict[str, dict], dict | None, dict | None, int, int]:
    """Checkpoint-seeded replay -> (adds, protocol, metaData,
    checkpoint_version_used (-1 = none applied), n_commits_replayed).
    The checkpoint's add rows (including deletionVector descriptors)
    and its protocol/metaData rows seed the state; only JSON commits
    after it replay."""
    import pyarrow.parquet as pq

    versions = list_commit_versions(root)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {root}/_delta_log")
    if version is None:
        version = versions[-1]
    cp = _last_checkpoint(root)
    if cp is None or cp["version"] > version:
        adds, protocol, metadata = _replay(root, version)
        return (
            adds,
            protocol,
            metadata,
            -1,
            len([v for v in versions if v <= version]),
        )
    cp_version = cp["version"]
    log_dir = os.path.join(root, "_delta_log")
    n_parts = cp.get("parts")
    if n_parts:
        # spec multi-part checkpoint: N files, union of their action
        # rows IS the checkpoint — names carry 1-indexed part/total
        cp_paths = [
            os.path.join(
                log_dir,
                f"{cp_version:020d}.checkpoint."
                f"{i + 1:010d}.{int(n_parts):010d}.parquet",
            )
            for i in range(int(n_parts))
        ]
        missing = [p for p in cp_paths if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                f"multi-part checkpoint v{cp_version} missing "
                f"{len(missing)}/{n_parts} part files "
                f"(e.g. {os.path.basename(missing[0])})"
            )
    else:
        single = os.path.join(
            log_dir, f"{cp_version:020d}.checkpoint.parquet"
        )
        if not os.path.exists(single):
            # V2 CHECKPOINT (checkpointPolicy=v2): a UUID-named manifest
            # carrying checkpointMetadata/protocol/metaData/sidecar
            # actions, add actions living in _delta_log/_sidecars/
            import glob as _glob

            uuid_named = sorted(
                _glob.glob(
                    os.path.join(
                        log_dir, f"{cp_version:020d}.checkpoint.*.parquet"
                    )
                )
            )
            json_named = sorted(
                _glob.glob(
                    os.path.join(
                        log_dir, f"{cp_version:020d}.checkpoint.*.json"
                    )
                )
            )
            if json_named and not uuid_named:
                raise ValueError(
                    "unsupported Delta checkpoint layout: JSON v2 "
                    f"manifest {os.path.basename(json_named[0])!r} "
                    "(supported: classic, multi-part, parquet "
                    "v2Checkpoint)"
                )
            if not uuid_named:
                raise FileNotFoundError(
                    f"checkpoint v{cp_version} referenced by "
                    "_last_checkpoint not found"
                )
            cp_paths = [uuid_named[-1]]
        else:
            cp_paths = [single]
    adds: dict[str, dict] = {}
    protocol: dict | None = None
    metadata: dict | None = None
    rows: list[dict] = []
    for p in cp_paths:
        rows.extend(pq.read_table(p).to_pylist())
    # v2 manifests reference sidecar files holding the add actions:
    # validate the embedded checkpointMetadata version, then splice the
    # sidecar rows in (they carry ONLY add/remove columns)
    side_dir = os.path.join(log_dir, "_sidecars")
    for row in list(rows):
        cpm = row.get("checkpointMetadata")
        if cpm is not None and cpm.get("version") is not None:
            if int(cpm["version"]) != cp_version:
                raise ValueError(
                    f"v2 checkpoint manifest says version {cpm['version']}"
                    f" but _last_checkpoint points at {cp_version}"
                )
        sc = row.get("sidecar")
        if sc is not None and sc.get("path"):
            sp = os.path.join(side_dir, sc["path"])
            if not os.path.exists(sp):
                raise FileNotFoundError(
                    f"v2 checkpoint sidecar missing: {sc['path']}"
                )
            rows.extend(pq.read_table(sp).to_pylist())
    for row in rows:
        if row.get("add") is not None:
            a = {k: v for k, v in row["add"].items() if v is not None}
            if isinstance(a.get("partitionValues"), list):
                a["partitionValues"] = dict(a["partitionValues"])
            adds[a["path"]] = a
        if row.get("protocol") is not None:
            protocol = {
                k: v for k, v in row["protocol"].items() if v is not None
            }
        if row.get("metaData") is not None:
            m = dict(row["metaData"])
            if isinstance(m.get("configuration"), list):
                m["configuration"] = dict(m["configuration"])
            metadata = m
    replayed = 0
    for v in versions:
        if v <= cp_version or v > version:
            continue
        replayed += 1
        commit = os.path.join(root, "_delta_log", f"{v:020d}.json")
        with open(commit, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    adds[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    adds.pop(action["remove"]["path"], None)
                elif "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    metadata = action["metaData"]
    return adds, protocol, metadata, cp_version, replayed


def read_delta_checkpointed(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read seeded from the checkpoint: same DV anti-join and
    column-mapping projection as :func:`read_delta`, but the log replay
    starts at the checkpoint's materialized state — one compacted
    parquet + the tail commits instead of an unbounded JSON replay."""
    adds, protocol, metadata = _replay_from_checkpoint(root, version)[:3]
    _check_protocol(protocol, metadata)
    return _resolve_df(spark, root, adds, metadata)


# ---------------------------------------------------------------------------
# write-side interop: the engine's MERGE committing to a Delta log
# ---------------------------------------------------------------------------


def export_merge_to_delta(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
) -> int:
    """MERGE ``updates`` into the Delta table at ``root`` (creating it
    on first call) and commit the result as the next Delta version:
    write the merged snapshot as a fresh data file, then append one
    JSON commit that adds it and removes the previous snapshot's files
    — exactly the rewrite-commit shape a non-partitioned Delta MERGE
    produces. Matched keys take the incoming row (update-all), new keys
    insert, untouched rows survive.

    Returns the committed version. The log layer is the same clean-room
    protocol writer the fixtures use, so anything resolving the public
    protocol (including this module's reader and checkpoint path) reads
    the result."""
    from pyspark.sql import functions as F  # noqa: F401

    os.makedirs(root, exist_ok=True)
    versions = (
        list_commit_versions(root)
        if os.path.isdir(os.path.join(root, "_delta_log"))
        else []
    )
    cdc_name = None
    if versions:
        # target resolves through read_delta so deletion-vector tables
        # merge correctly (DV'd rows stay deleted); the remove list is
        # every live add path, which the rewrite commit supersedes.
        adds, protocol, metadata = _replay(root)
        _check_protocol(protocol, metadata)
        prev_files = [os.path.join(root, p) for p in sorted(adds)]
        target = read_delta(spark, root)
        keys = updates.select(key).distinct()
        survivors = target.join(keys, key, "left_anti")
        # allowMissingColumns: schema-widening MERGEs back-fill
        # survivors with NULLs (the add-column evolution path)
        merged = survivors.unionByName(updates, allowMissingColumns=True)
        version = versions[-1] + 1
        # Change Data Feed: the MERGE's row-level changes as a cdc
        # action (update pre/postimages for matched keys, inserts for
        # new keys) — derived from the frames the MERGE already holds,
        # so CDF costs one extra column + one file, not a diff job.
        tkeys = target.select(key).distinct()
        pre = target.join(keys, key, "left_semi").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = updates.join(tkeys, key, "left_semi").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        ins = updates.join(tkeys, key, "left_anti").withColumn(
            "_change_type", F.lit("insert")
        )
        changes = pre.unionByName(
            post.unionByName(ins), allowMissingColumns=True
        )
        cdc_name = f"_change_data/cdc-{version:05d}.parquet"
        _write_single_parquet(changes, root, cdc_name)
    else:
        prev_files = []
        merged = updates
        version = 0
    name = f"part-{version:05d}.parquet"
    merged, _merged_stats = _stats_observed(merged)
    _write_single_parquet(merged, root, name)
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": "spark-graft-delta-export",
                    "format": {"provider": "parquet", "options": {}},
                    # StructType.json() IS the Delta schemaString shape
                    "schemaString": merged.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        )
    st = os.stat(os.path.join(root, name))
    actions.append(
        {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
                "stats": _merged_stats(),
            }
        }
    )
    for f in prev_files:
        actions.append(
            {
                "remove": {
                    "path": os.path.relpath(f, root),
                    "deletionTimestamp": int(st.st_mtime * 1000),
                    "dataChange": True,
                }
            }
        )
    if cdc_name is not None:
        actions.append(
            {
                "cdc": {
                    "path": cdc_name,
                    "partitionValues": {},
                    "size": os.path.getsize(os.path.join(root, cdc_name)),
                    "dataChange": False,  # per spec: cdc never changes data
                }
            }
        )
    _commit(root, version, actions)
    return version


def read_delta_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change Data Feed over ``[from_version, to_version]`` — one row
    per row-level change with ``_change_type`` (insert /
    update_preimage / update_postimage / delete) and
    ``_commit_version``. Commits carrying ``cdc`` actions read exactly
    those files (the spec: cdc supersedes add/remove for change
    derivation); pure-append commits (dataChange adds only) derive
    inserts from the added files; a dataChange remove WITHOUT a cdc
    action raises — silently inventing deletes would corrupt the
    feed."""
    from pyspark.sql import functions as F

    versions = [
        v
        for v in list_commit_versions(root)
        if from_version <= v <= (to_version if to_version is not None
                                 else 1 << 62)
    ]
    if not versions:
        raise ValueError(f"no commits in range at {root}")
    out: DataFrame | None = None
    for v in versions:
        cdc_files: list[str] = []
        add_actions: list[dict] = []
        remove_actions: list[dict] = []
        with open(
            os.path.join(root, "_delta_log", f"{v:020d}.json"),
            encoding="utf-8",
        ) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "cdc" in action:
                    cdc_files.append(action["cdc"]["path"])
                elif "add" in action and action["add"].get(
                    "dataChange", True
                ):
                    add_actions.append(action["add"])
                elif "remove" in action and action["remove"].get(
                    "dataChange", True
                ):
                    remove_actions.append(action["remove"])
        add_files = [a["path"] for a in add_actions]
        dv_shape = (
            add_actions
            and all(a.get("deletionVector") for a in add_actions)
            and {a["path"] for a in add_actions}
            == {r["path"] for r in remove_actions}
        )
        if cdc_files:
            part = spark.read.parquet(
                *[os.path.join(root, p) for p in cdc_files]
            )
        elif dv_shape:
            # a DV commit re-adds each file with a grown bitmap: the
            # commit's DELETES are exactly (new DV minus old DV) per
            # file — the spec's derivation for merge-on-read deletes.
            # Bitmap diff is metadata-scale; the row fetch is one scan
            # of the touched files semi-joined on (file, position).
            old_dv = {
                r["path"]: r.get("deletionVector") for r in remove_actions
            }
            pairs = []
            for a in add_actions:
                new_idx = set(_dv_indexes(root, a["deletionVector"]))
                prev = old_dv.get(a["path"])
                prev_idx = set(_dv_indexes(root, prev)) if prev else set()
                pairs.extend((a["path"], i) for i in sorted(new_idx - prev_idx))
            if not pairs:
                continue  # DV rewrite that masked nothing new
            dels = _local_df(
                spark, pairs, "file_path string, pos long"
            )
            _, _, metadata = _replay(root, v)
            tagged = _grouped_scan(
                spark,
                root,
                [os.path.join(root, p) for p in sorted({p for p, _ in pairs})],
                metadata,
                True,
            )
            part = (
                tagged.join(
                    dels,
                    (tagged["__file"] == dels["file_path"])
                    & (tagged["__pos"] == dels["pos"]),
                    "left_semi",
                )
                .drop("__file", "__pos")
                .withColumn("_change_type", F.lit("delete"))
            )
        elif add_files:
            if remove_actions:
                raise ValueError(
                    f"commit {v} rewrites data without a cdc action — "
                    "changes are not derivable"
                )
            part = spark.read.parquet(
                *[os.path.join(root, p) for p in add_files]
            ).withColumn("_change_type", F.lit("insert"))
        else:
            continue  # metadata-only commit
        part = part.withColumn("_commit_version", F.lit(v).cast("bigint"))
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    if out is None:
        raise ValueError(f"no data-changing commits in range at {root}")
    return out


# ---------------------------------------------------------------------------
# streaming sink: per-batch append commits with txn exactly-once guard
# ---------------------------------------------------------------------------


def txn_last_version(root: str, app_id: str) -> int:
    """Highest ``txn.version`` committed by ``app_id`` across the log —
    the protocol's idempotent-writer bookkeeping (a streaming sink
    replaying a micro-batch after restart sees its own txn and skips).
    Returns -1 when the app never committed."""
    last = -1
    log_dir = os.path.join(root, "_delta_log")
    if not os.path.isdir(log_dir):
        return last
    for v in list_commit_versions(root):
        with open(
            os.path.join(log_dir, f"{v:020d}.json"), encoding="utf-8"
        ) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                txn = action.get("txn")
                if txn and txn.get("appId") == app_id:
                    last = max(last, int(txn["version"]))
    return last


def add_check_constraint(root: str, name: str, expr: str) -> int:
    """Register a CHECK constraint (writer feature checkConstraints):
    the SQL predicate lands in table configuration as
    ``delta.constraints.<name>`` and the protocol upgrades with the
    feature named — from then on every writer MUST validate appended
    rows against it before committing. Returns the commit version."""
    adds, protocol, metadata = _replay(root)
    if metadata is None:
        raise ValueError(f"no table metadata at {root}")
    new_meta = dict(metadata)
    conf = dict(metadata.get("configuration") or {})
    conf[f"delta.constraints.{name}"] = expr
    new_meta["configuration"] = conf
    prior_w = set((protocol or {}).get("writerFeatures") or [])
    version = list_commit_versions(root)[-1] + 1
    _commit(
        root,
        version,
        [
            {
                "protocol": {
                    "minReaderVersion": (protocol or {}).get(
                        "minReaderVersion", 1
                    ),
                    "minWriterVersion": max(
                        7, (protocol or {}).get("minWriterVersion", 1)
                    ),
                    **(
                        {
                            "readerFeatures": (protocol or {}).get(
                                "readerFeatures"
                            )
                        }
                        if (protocol or {}).get("readerFeatures")
                        else {}
                    ),
                    "writerFeatures": sorted(
                        prior_w | {"checkConstraints"}
                    ),
                }
            },
            {"metaData": new_meta},
        ],
    )
    return version


def _check_append_only(metadata: dict | None, op: str) -> None:
    """delta.appendOnly=true forbids any commit that removes data —
    the table property ingest pipelines set so history can never be
    rewritten under their consumers. Raises with the operation
    named."""
    conf = (metadata or {}).get("configuration") or {}
    if str(conf.get("delta.appendOnly", "false")).lower() == "true":
        raise ValueError(
            f"table is delta.appendOnly=true: {op} would remove data"
        )


def _apply_column_defaults(batch_df: DataFrame, metadata: dict | None):
    """Writer feature allowColumnDefaults: a batch missing a column
    whose field metadata records CURRENT_DEFAULT gets the default
    filled at write time (typed literal, map-side). Columns present in
    the batch are untouched — defaults are for absent columns only."""
    from pyspark.sql import functions as F

    if not metadata or "schemaString" not in metadata:
        return batch_df
    for f in json.loads(metadata["schemaString"])["fields"]:
        md = f.get("metadata") or {}
        if "CURRENT_DEFAULT" in md and f["name"] not in batch_df.columns:
            raw = md["CURRENT_DEFAULT"]
            # the spec stores the default as a SQL literal string
            lit = raw.strip("'") if isinstance(raw, str) else raw
            batch_df = batch_df.withColumn(
                f["name"],
                F.lit(lit).cast(
                    f["type"] if isinstance(f["type"], str) else "string"
                ),
            )
    return batch_df


def _enforce_check_constraints(batch_df: DataFrame, metadata: dict | None):
    """Writer-side CHECK validation: every ``delta.constraints.*``
    predicate must hold on every appended row; a violation raises with
    the constraint named and the violating row count — the protocol's
    contract that a constraint, once added, is never silently
    bypassed. One filter+count per constraint, map-side."""
    conf = (metadata or {}).get("configuration") or {}
    for key in sorted(conf):
        if not key.startswith("delta.constraints."):
            continue
        name = key[len("delta.constraints."):]
        expr = conf[key]
        n_bad = batch_df.filter(f"NOT ({expr})").count()
        if n_bad:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) violated by "
                f"{n_bad} rows — append rejected"
            )


def append_batch_to_delta(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    app_id: str,
    batch_id: int,
) -> bool:
    """Commit one micro-batch as a Delta APPEND version carrying a
    ``txn`` action — the exactly-once streaming-sink protocol: if this
    ``(app_id, batch_id)`` already committed (restart replay), the call
    is a no-op. CHECK constraints on the table are enforced before any
    byte is written. Returns True when a commit happened."""
    if txn_last_version(root, app_id) >= batch_id:
        return False  # replayed batch — already durable
    os.makedirs(root, exist_ok=True)
    versions = (
        list_commit_versions(root)
        if os.path.isdir(os.path.join(root, "_delta_log"))
        else []
    )
    if versions:
        _, _, _existing_meta = _replay(root)
        batch_df = _apply_column_defaults(batch_df, _existing_meta)
        _enforce_check_constraints(batch_df, _existing_meta)
    version = (versions[-1] + 1) if versions else 0
    name = f"batch-{app_id}-{batch_id:05d}.parquet"
    batch_df, _batch_stats = _stats_observed(batch_df)
    _write_single_parquet(batch_df, root, name)
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": f"spark-graft-delta-sink-{app_id}",
                    "format": {"provider": "parquet", "options": {}},
                    # StructType.json() IS the Delta schemaString shape
                    "schemaString": batch_df.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            }
        )
    actions.append({"txn": {"appId": app_id, "version": batch_id}})
    st = os.stat(os.path.join(root, name))
    actions.append(
        {
            "add": {
                "path": name,
                "partitionValues": {},
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
                # per-file stats = the write-side half of data skipping
                "stats": _batch_stats(),
            }
        }
    )
    _commit(root, version, actions)
    return True


def write_version_checksum(root: str, version: int | None = None) -> str:
    """Write the ``%020d.crc`` VERSION CHECKSUM file for ``version``
    (default: latest) — the state-validation artifact the reference
    implementation emits per commit: a one-line JSON carrying the
    snapshot's tableSizeBytes / numFiles / numDeletedRecordsOpt (DV
    cardinality total) plus the protocol and metaData, letting a reader
    cross-check its reconstructed state without re-listing data files.
    Returns the crc path."""
    versions = list_commit_versions(root)
    if version is None:
        version = versions[-1]
    adds, protocol, metadata = _replay(root, version)
    n_deleted = 0
    for a in adds.values():
        dv = a.get("deletionVector")
        if dv and dv.get("cardinality") is not None:
            n_deleted += int(dv["cardinality"])
    state = {
        "tableSizeBytes": sum(int(a.get("size") or 0) for a in adds.values()),
        "numFiles": len(adds),
        "numDeletedRecordsOpt": n_deleted,
        "numMetadata": 1,
        "numProtocol": 1,
        "protocol": protocol
        or {"minReaderVersion": 1, "minWriterVersion": 2},
    }
    if metadata is not None:
        state["metadata"] = metadata
    path = os.path.join(root, "_delta_log", f"{version:020d}.crc")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(state, fh)
    return path


def validate_version_checksum(root: str, version: int | None = None) -> dict:
    """Recompute the snapshot state at ``version`` and compare against
    the recorded ``.crc`` — the reader-side state validation. Raises
    ``ValueError`` naming every diverging field (a divergence means the
    log was mutated after the checksum, or replay is buggy); returns
    the validated state dict."""
    versions = list_commit_versions(root)
    if version is None:
        version = versions[-1]
    path = os.path.join(root, "_delta_log", f"{version:020d}.crc")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no version checksum at {path}")
    with open(path, encoding="utf-8") as fh:
        recorded = json.load(fh)
    adds, protocol, metadata = _replay(root, version)
    n_deleted = 0
    for a in adds.values():
        dv = a.get("deletionVector")
        if dv and dv.get("cardinality") is not None:
            n_deleted += int(dv["cardinality"])
    actual = {
        "tableSizeBytes": sum(int(a.get("size") or 0) for a in adds.values()),
        "numFiles": len(adds),
        "numDeletedRecordsOpt": n_deleted,
    }
    diverged = [
        f"{k}: crc={recorded.get(k)!r} actual={v!r}"
        for k, v in actual.items()
        if recorded.get(k) != v
    ]
    if protocol is not None and recorded.get("protocol") != protocol:
        diverged.append(
            f"protocol: crc={recorded.get('protocol')!r} actual={protocol!r}"
        )
    if diverged:
        raise ValueError(
            f"version checksum mismatch at v{version}: " + "; ".join(diverged)
        )
    return recorded
