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

from pyspark.sql import DataFrame, SparkSession


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


def delta_snapshot_files(root: str, version: int | None = None) -> list[str]:
    """Absolute paths of the data files live at ``version`` (default:
    latest). Replays add/remove actions in commit order; within a
    commit, later actions win (per the protocol, a commit is an ordered
    atomic batch)."""
    versions = list_commit_versions(root)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {root}/_delta_log")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    live: dict[str, bool] = {}
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
                    live[action["add"]["path"]] = True
                elif "remove" in action:
                    live[action["remove"]["path"]] = False
    return [
        os.path.join(root, p) for p, alive in sorted(live.items()) if alive
    ]


def read_delta(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """DataFrame over the Delta table's snapshot at ``version`` (latest
    when None) — one distributed parquet scan over exactly the live
    files, so pushdown/pruning behave as on any parquet read."""
    files = delta_snapshot_files(root, version)
    return spark.read.parquet(*files)


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


def _commit(root: str, version: int, actions: list[dict]) -> None:
    log_dir = os.path.join(root, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


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
    _write_single_parquet(slim.filter(F.col("lang") != "fr"), root, "file-0.parquet")
    _write_single_parquet(slim.filter(F.col("lang") == "fr"), root, "file-1.parquet")
    _write_single_parquet(
        slim.filter((F.col("lang") == "fr") & (F.col("n_chars") >= 600)),
        root,
        "file-2.parquet",
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


# ---------------------------------------------------------------------------
# checkpoint support (log compaction per the Delta protocol)
# ---------------------------------------------------------------------------


def _last_checkpoint(root: str) -> dict | None:
    p = os.path.join(root, "_delta_log", "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def write_checkpoint(root: str, version: int) -> str:
    """Materialize the snapshot state at ``version`` as a
    ``%020d.checkpoint.parquet`` (one row per live add action, the
    protocol's log-compaction artifact) plus the ``_last_checkpoint``
    pointer. Written with pyarrow — the checkpoint is metadata-scale,
    and keeping the log layer Spark-free mirrors how production
    readers resolve snapshots before any cluster work starts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = delta_snapshot_files(root, version)
    rel = [os.path.relpath(f, root) for f in files]
    table = pa.table(
        {
            "add": [
                {"path": p, "dataChange": True} for p in rel
            ],
            "remove": pa.array(
                [None] * len(rel),
                type=pa.struct(
                    [("path", pa.string()), ("dataChange", pa.bool_())]
                ),
            ),
        }
    )
    cp = os.path.join(
        root, "_delta_log", f"{version:020d}.checkpoint.parquet"
    )
    pq.write_table(table, cp)
    with open(
        os.path.join(root, "_delta_log", "_last_checkpoint"),
        "w",
        encoding="utf-8",
    ) as fh:
        json.dump({"version": version, "size": len(rel)}, fh)
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
    import pyarrow.parquet as pq

    versions = list_commit_versions(root)
    if not versions:
        raise FileNotFoundError(f"no Delta commits under {root}/_delta_log")
    if version is None:
        version = versions[-1]
    cp = _last_checkpoint(root)
    if cp is None or cp["version"] > version:
        files = delta_snapshot_files(root, version)
        return files, -1, len([v for v in versions if v <= version])
    cp_version = cp["version"]
    cp_path = os.path.join(
        root, "_delta_log", f"{cp_version:020d}.checkpoint.parquet"
    )
    live: dict[str, bool] = {}
    for row in pq.read_table(cp_path, columns=["add"]).to_pylist():
        if row["add"] is not None:
            live[row["add"]["path"]] = True
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
                    live[action["add"]["path"]] = True
                elif "remove" in action:
                    live[action["remove"]["path"]] = False
    files = [
        os.path.join(root, p) for p, alive in sorted(live.items()) if alive
    ]
    return files, cp_version, replayed


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
    if versions:
        prev_files = delta_snapshot_files(root)
        target = spark.read.parquet(*prev_files)
        keys = updates.select(key).distinct()
        survivors = target.join(keys, key, "left_anti")
        merged = survivors.unionByName(updates)
        version = versions[-1] + 1
    else:
        prev_files = []
        merged = updates
        version = 0
    name = f"part-{version:05d}.parquet"
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
                    "schemaString": json.dumps(
                        {"type": "struct", "fields": []}
                    ),
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
    _commit(root, version, actions)
    return version


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
    is a no-op. Returns True when a commit happened."""
    if txn_last_version(root, app_id) >= batch_id:
        return False  # replayed batch — already durable
    os.makedirs(root, exist_ok=True)
    versions = (
        list_commit_versions(root)
        if os.path.isdir(os.path.join(root, "_delta_log"))
        else []
    )
    version = (versions[-1] + 1) if versions else 0
    name = f"batch-{app_id}-{batch_id:05d}.parquet"
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
                    "schemaString": json.dumps(
                        {"type": "struct", "fields": []}
                    ),
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
            }
        }
    )
    _commit(root, version, actions)
    return True
