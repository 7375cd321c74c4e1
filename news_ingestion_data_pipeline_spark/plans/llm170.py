"""Hundred-seventieth wave: Delta deletion vectors (merge-on-read
DELETE) — the round-6 interop gap close.

  * scan_delta_deletion_vectors — a DV commit (protocol reader 3 /
    writer 7, readerFeatures=[deletionVectors]) marks rows deleted as
    per-file roaring bitmaps in ONE .bin sidecar, zero data files
    rewritten; the reader decodes the bitmaps (clean-room z85 +
    RoaringFormatSpec codec, operators/deltalog.py) and anti-joins the
    (file, row_index) positions against the scan's parquet metadata
    identity. Pre-DV and post-DV snapshots are read side by side from
    the same directory, certifying both merge-on-read semantics and
    snapshot isolation across the protocol upgrade.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import deltalog as DL
from news_ingestion_data_pipeline_spark.plans.llm157 import (
    _AGG_SQL,
    _LIVE_SQL,
    _snapshot_agg,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm170")


def _fixture(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Delta fixture (v0 append, v1 French rewrite) + a v2 DV commit
    deleting doc_id % 5 == 0 from the live snapshot."""
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_dv_{sfx}"
    DL.write_delta_fixture(spark, t(spark, sf_dir, "documents"), root)
    v_dv, _ = DL.delete_where_with_dv(
        spark, root, F.col("doc_id") % 5 == 0
    )
    return root, v_dv


@register(
    "scan_delta_deletion_vectors",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
post AS (SELECT * FROM live WHERE doc_id % 5 <> 0),
a1 AS ({_AGG_SQL.format(extra="1 AS version,", extra_grp="1,", src="live")}),
a2 AS ({_AGG_SQL.format(extra="2 AS version,", extra_grp="1,", src="post")})
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="Delta deletion vectors (merge-on-read DELETE): a v2 "
    "commit records doc_id % 5 == 0 rows as per-file roaring-bitmap "
    "sidecars (protocol upgrade to reader 3 / writer 7 with the "
    "deletionVectors feature) — zero data files rewritten. The reader "
    "decodes the bitmaps with a clean-room z85 + RoaringFormatSpec "
    "codec and anti-joins the (file, row_index) positions against the "
    "scan's parquet metadata identity, so deleted rows vanish without "
    "touching the distributed data path. Pre-DV (v1) and post-DV (v2) "
    "snapshots of the SAME directory are aggregated side by side: "
    "per-lang counts, char sums and order-pinned content checksums must "
    "match their generating SQL simultaneously, certifying both the "
    "bitmap semantics and snapshot isolation across the protocol "
    "upgrade. Scale: DV decode is metadata-scale like the log replay; "
    "the anti-join keys are (file, position) — exactly how production "
    "Delta readers mask DV'd rows.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root, v_dv = _fixture(spark, sf_dir)
    pre = _snapshot_agg(DL.read_delta(spark, root, v_dv - 1)).select(
        F.lit(1).alias("version"), "*"
    )
    post = _snapshot_agg(DL.read_delta(spark, root, v_dv)).select(
        F.lit(2).alias("version"), "*"
    )
    return pre.unionByName(post)


@register(
    "scan_iceberg_field_id_rename",
    oracle="""
WITH docs500 AS (
  SELECT * FROM documents ORDER BY doc_id LIMIT 500
), a1 AS (
  SELECT 1 AS version, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM docs500 WHERE doc_id % 2 = 0 GROUP BY lang
), a2 AS (
  SELECT 2 AS version, lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM docs500 GROUP BY lang
)
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="Iceberg field-id schema evolution (the spec's "
    "headline feature): snapshot 1 writes even doc_ids under schema 0 "
    "(doc_id/lang/n_chars, parquet field ids 1/2/3); snapshot 2 RENAMES "
    "field 3 to char_count and appends odd doc_ids under the new name. "
    "The reader groups data files by their footer (field_id -> physical "
    "name) signature — footer-only reads, metadata-scale like the "
    "manifests — and aliases physical columns to the governing schema's "
    "names BY ID, so file-a's physical n_chars surfaces as char_count "
    "in the current read while time travel to snapshot 1 reads under "
    "its PINNED schema-id with the old name. A name-based read would "
    "drop the renamed column entirely. Both versions' per-lang counts "
    "and char sums must match the generating SQL simultaneously.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_field_id_rename(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_rename_{sfx}"
    s1, s2 = IB.write_iceberg_rename_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    old = (
        IB.read_iceberg(spark, root, s1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(F.lit(1).alias("version"), "*")
    )
    cur = (
        IB.read_iceberg(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("char_count").alias("sum_chars"),
        )
        .select(F.lit(2).alias("version"), "*")
    )
    return old.unionByName(cur)


@register(
    "scan_iceberg_deflate_metadata",
    oracle=f"""
WITH live AS ({_LIVE_SQL})
{_AGG_SQL.format(extra="", extra_grp="", src="live")}
""",
    description="Iceberg metadata written DEFLATE-compressed (the Avro "
    "codec Spark/Flink/Trino emit by default for manifest lists and "
    "manifests) resolved end-to-end: same two-snapshot French-rewrite "
    "table as scan_iceberg_table, but every Avro container in the "
    "metadata tree carries raw RFC-1951 block bodies that the "
    "clean-room codec (operators/avro_lite.py) must inflate before "
    "schema-driven decoding. Result must hash-match the uncompressed "
    "twin's oracle exactly — certifying the codec through the full "
    "manifest-list -> manifest -> status-merge stack, not just a unit "
    "roundtrip. This closes the 'foreign-written Iceberg tables fail "
    "to parse' interop gap.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_deflate_metadata(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_deflate_{sfx}"
    IB.write_iceberg_fixture(
        spark, t(spark, sf_dir, "documents"), root, codec="deflate"
    )
    return _snapshot_agg(IB.read_iceberg(spark, root))


@register(
    "scan_delta_column_mapping",
    oracle="""
WITH a AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM documents GROUP BY lang
)
SELECT 0 AS version, * FROM a
UNION ALL
SELECT 1 AS version, * FROM a
""",
    description="Delta column mapping (protocol reader 2 / writer 5): "
    "physical parquet columns are opaque col-N names; logical names "
    "live only in the schemaString's per-field metadata (physicalName "
    "+ columnMapping.id). Commit v1 renames logical n_chars -> "
    "char_count with a METADATA-ONLY commit — zero data rewritten, the "
    "free-rename operation column mapping exists to provide. The "
    "reader projects physical -> logical per the spec (footer field "
    "ids win in id mode, physicalName otherwise); v0 and v1 of the "
    "same directory aggregate identically under their respective "
    "logical names, and the physical layer never leaks into the "
    "output. Scale: the projection is one aliasing select on top of "
    "the distributed scan — pushdown and pruning untouched.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_colmap_{sfx}"
    DL.write_delta_column_mapping_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )

    def _agg(df: DataFrame, version: int, col: str) -> DataFrame:
        return (
            df.groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(col).alias("sum_chars"),
            )
            .select(F.lit(version).alias("version"), "*")
        )

    v0 = _agg(DL.read_delta(spark, root, 0), 0, "n_chars")
    v1 = _agg(DL.read_delta(spark, root, 1), 1, "char_count")
    return v0.unionByName(v1)


@register(
    "scan_iceberg_metrics_pruned",
    oracle="""
WITH b AS (
  SELECT *, CASE WHEN n_chars < 150 THEN 0 WHEN n_chars < 300 THEN 1
                 WHEN n_chars < 450 THEN 2 ELSE 3 END AS bucket
  FROM documents
), f AS (
  SELECT bucket, MAX(n_chars) AS ub FROM b GROUP BY bucket
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_files_total,
         CAST(COUNT(*) FILTER (ub >= 300) AS BIGINT) AS n_files_read
  FROM f
)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
       a.n_files_total, a.n_files_read
FROM b d CROSS JOIN audit a
WHERE d.n_chars >= 300
GROUP BY d.lang, a.n_files_total, a.n_files_read
""",
    description="Iceberg column-metrics file pruning (zone-map style, "
    "orthogonal to partition pruning): the documents table lands in "
    "n_chars-range-bucketed files whose manifest entries carry REAL "
    "int64-LE lower/upper bounds per the spec's single-value "
    "serialization; the reader evaluates n_chars >= 300 against the "
    "recorded [lower, upper] and skips every file the metrics prove "
    "empty WITHOUT opening it — at 100 TB this is the mechanism that "
    "turns a full scan into reading only matching files when the "
    "layout is range-clustered (see storage_zorder_layout for the "
    "layout side). n_files_total vs n_files_read ride along as audit "
    "columns proving files were skipped by metadata alone; per-lang "
    "aggregates over the surviving files must still match the "
    "generating SQL exactly (pruning must never change answers).",
    tags=("scan", "storage", "pruning", "pipeline"),
)
def scan_iceberg_metrics_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_metrics_{sfx}"
    IB.write_iceberg_metrics_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    files, n_total = IB.snapshot_files(root, range_filter={3: (300, None)})
    return (
        spark.read.parquet(*files)
        .filter(F.col("n_chars") >= 300)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(n_total).cast("bigint").alias("n_files_total"),
            F.lit(len(files)).cast("bigint").alias("n_files_read"),
        )
    )


@register(
    "pipeline_dedup_delta_dv",
    oracle=f"""
WITH fp AS (
  SELECT doc_id, lang, n_chars,
         md5({SQL_NORM.format(col='text')}) AS f
  FROM documents
), keep AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY f) AS keep_id FROM fp
), live AS (
  SELECT * FROM keep WHERE doc_id = keep_id
), dropped AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped
  FROM keep WHERE doc_id <> keep_id
)
SELECT l.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(l.n_chars) AS BIGINT) AS sum_chars,
       d.n_dropped
FROM live l CROSS JOIN dropped d
GROUP BY l.lang, d.n_dropped
""",
    description="Dedup decisions MATERIALIZED as Delta deletion "
    "vectors — the composition a production curation DAG runs: the "
    "corpus lands as a Delta table, exact-duplicate losers (non-min-id "
    "rows per normalized-content fingerprint group, dedup_exact_rows' "
    "rule) are computed as a drop-key list, and delete_keys_with_dv "
    "commits them as per-file roaring bitmaps — ZERO data files "
    "rewritten, the drop is a metadata commit, and the pre-dedup "
    "corpus remains time-travelable for audit. The post-dedup read "
    "must equal the keeper set exactly (per-lang counts + char sums), "
    "with the dropped-row count riding along as the audit column. At "
    "100 TB this is why DV-based dedup beats rewrite-based: touching "
    "0.1% of rows costs metadata, not a corpus rewrite.",
    tags=("pipeline", "dedup", "storage", "llm"),
)
def pipeline_dedup_delta_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_dedup_dv_{sfx}"
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread + pin: the normalized-text md5 fingerprint map is consumed
    # THREE times (Delta export, keeper aggregate, loser join side) and
    # ran once per consumer on the scan's partitioning (r11 profile: a
    # 45 CPU-s compute stage dominating the query)
    slim = (
        spread(t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            TX.doc_fingerprint(F.col("text")).alias("f"),
        )
        .localCheckpoint()
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    DL.export_merge_to_delta(spark, root, slim, key="doc_id")
    keepers = slim.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    losers = (
        slim.join(keepers, "f")
        .filter(F.col("doc_id") != F.col("keep_id"))
        .select("doc_id")
    )
    _, n_dropped = DL.delete_keys_with_dv(spark, root, losers, "doc_id")
    return (
        DL.read_delta(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(n_dropped).cast("bigint").alias("n_dropped"),
        )
    )


@register(
    "pipeline_delta_vacuum",
    oracle=f"""
WITH live AS ({_LIVE_SQL})
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(1 AS BIGINT) AS n_files_vacuumed
FROM live GROUP BY lang
""",
    description="Delta VACUUM: the two-commit French-rewrite fixture "
    "leaves v0's superseded file physically present (removes are "
    "logical — that is what makes time travel free); vacuum_delta "
    "retains the files referenced by the LAST snapshot and physically "
    "deletes the rest — exactly one file here, the replaced French "
    "slice — returning the deleted list as the audit. The post-vacuum "
    "current read must still equal the live SQL byte-for-byte "
    "(vacuum must never touch referenced bytes), with the deleted "
    "count riding along. At 100 TB vacuum is the storage-reclaim knob "
    "traded against time-travel depth; the log itself stays intact "
    "for audit.",
    tags=("pipeline", "storage",),
)
def pipeline_delta_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_vacuum_{sfx}"
    DL.write_delta_fixture(spark, t(spark, sf_dir, "documents"), root)
    deleted = DL.vacuum_delta(root, retain_last=1)
    return (
        DL.read_delta(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(len(deleted)).cast("bigint").alias("n_files_vacuumed"),
        )
    )


@register(
    "scan_iceberg_hidden_partition",
    oracle="""
WITH b AS (
  SELECT *, n_chars - n_chars % 100 AS pv FROM documents
), f AS (
  SELECT pv FROM b GROUP BY pv
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_files_total,
         CAST(COUNT(*) FILTER (pv IN (200, 300)) AS BIGINT) AS n_files_read
  FROM f
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
       a.n_files_total, a.n_files_read
FROM b d CROSS JOIN audit a
WHERE d.n_chars >= 200 AND d.n_chars < 400
GROUP BY d.lang, a.n_files_total, a.n_files_read
""",
    description="Iceberg HIDDEN partitioning (the spec's headline "
    "layout feature): the table is partitioned by truncate[100] on "
    "n_chars — a derived key that never exists as a data column; the "
    "partition spec records (source column, transform, partition "
    "field) and the reader prunes a RAW n_chars predicate by pushing "
    "candidate values through the registered transform "
    "(murmur3-bucket and truncate implemented per the spec, bucket "
    "validated against the spec's own hash vector). Here n_chars in "
    "[200, 400) maps to partition values {200, 300}; only those files "
    "open. n_files_total vs n_files_read audit the metadata-level "
    "skip; per-lang aggregates over the surviving files must match "
    "the generating SQL exactly. This is what lets users write "
    "date-truncated / bucketed layouts at 100 TB without leaking "
    "layout keys into queries.",
    tags=("scan", "storage", "pruning", "pipeline"),
)
def scan_iceberg_hidden_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_hidden_{sfx}"
    IB.write_iceberg_hidden_partition_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    pf = IB.partition_filter_for(root, {"n_chars": {200, 300}})
    files, n_total = IB.snapshot_files(root, partition_filter=pf)
    return (
        spark.read.parquet(*files)
        .filter((F.col("n_chars") >= 200) & (F.col("n_chars") < 400))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(n_total).cast("bigint").alias("n_files_total"),
            F.lit(len(files)).cast("bigint").alias("n_files_read"),
        )
    )


@register(
    "pipeline_delta_change_feed",
    oracle="""
WITH slim AS (SELECT doc_id, lang, n_chars FROM documents),
upd AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars
        FROM slim WHERE doc_id % 10 = 0),
ins AS (SELECT doc_id + 1000000 AS doc_id, lang, n_chars
        FROM slim WHERE doc_id < 5),
ch AS (
  SELECT doc_id, n_chars, 'update_preimage' AS change_type
  FROM slim WHERE doc_id % 10 = 0
  UNION ALL SELECT doc_id, n_chars, 'update_postimage' FROM upd
  UNION ALL SELECT doc_id, n_chars, 'insert' FROM ins
)
SELECT change_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM ch GROUP BY change_type
""",
    description="Delta Change Data Feed: the MERGE commit carries a "
    "cdc action whose file holds the row-level changes — "
    "update_preimage/update_postimage for matched keys (old and new "
    "n_chars), insert for new keys — derived from the frames the MERGE "
    "already holds (CDF costs one column + one file, never a diff "
    "job). read_delta_changes replays the version range off the cdc "
    "actions per the spec (cdc supersedes add/remove for change "
    "derivation; pure appends derive inserts; a rewrite without cdc "
    "raises). Per-change-type counts and value sums must match the "
    "generating SQL exactly — preimages prove OLD values survive in "
    "the feed after the table itself moved on. At 100 TB, CDF is what "
    "lets downstream consumers (index refresh, cache invalidation, "
    "incremental training-data deltas) tail row-level changes without "
    "diffing snapshots.",
    tags=("pipeline", "storage", "stream"),
)
def pipeline_delta_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_cdf_{sfx}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    DL.export_merge_to_delta(spark, root, slim, key="doc_id")
    upd = slim.filter(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    ins = slim.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    DL.export_merge_to_delta(
        spark, root, upd.unionByName(ins), key="doc_id"
    )
    return (
        DL.read_delta_changes(spark, root, 1, 1)
        .groupBy(F.col("_change_type").alias("change_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


@register(
    "scan_iceberg_incremental",
    oracle="""
WITH docs500 AS (
  SELECT * FROM documents ORDER BY doc_id LIMIT 500
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM docs500 WHERE doc_id % 2 = 1
GROUP BY lang
""",
    description="Iceberg incremental append scan: rows ADDED between "
    "two snapshots (manifest entries with status ADDED whose "
    "snapshot_id falls in the range) — the mechanism a downstream "
    "consumer uses to tail an Iceberg table without diffing "
    "snapshots. On the rename fixture, snapshot 2 appends exactly the "
    "odd-doc_id file: the increment's per-lang counts and char sums "
    "must match the generating SQL, proving the scan surfaced the "
    "new snapshot's adds and nothing else (the EXISTING even-doc_id "
    "file is excluded despite riding the same manifest list). Scale: "
    "the increment resolves at metadata level (manifest status + "
    "snapshot id) and reads only the new files — incremental cost is "
    "proportional to the delta, never the table.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_incr_{sfx}"
    s1, _ = IB.write_iceberg_rename_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    # the appended file carries the renamed physical column char_count
    return (
        IB.read_iceberg_incremental(spark, root, s1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("char_count").cast("bigint").alias("sum_chars"),
        )
    )


@register(
    "pipeline_delta_optimize",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(4 AS BIGINT) AS n_files_before,
       CAST(1 AS BIGINT) AS n_files_after
FROM documents GROUP BY lang
""",
    description="Delta OPTIMIZE (small-file compaction): four streaming "
    "append commits leave four small files; compact_delta bin-packs "
    "them into one and commits the rewrite with dataChange=false on "
    "every action — the protocol's reorganization signal, which the "
    "CDF reader honors by ignoring the commit (no phantom inserts) and "
    "streaming consumers skip. The compacted read must equal the "
    "pre-compaction corpus byte-for-byte; before/after file counts "
    "ride as audit columns. At 100 TB compaction is what keeps scan "
    "task counts sane under high-frequency micro-batch ingestion — "
    "and because it folds deletion vectors into the rewrite, it also "
    "re-zeroes the DV read overhead.",
    tags=("pipeline", "storage",),
)
def pipeline_delta_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_optimize_{sfx}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    for i in range(4):
        DL.append_batch_to_delta(
            spark, root, slim.filter(F.col("doc_id") % 4 == i),
            app_id="optimize_fixture", batch_id=i,
        )
    _, n_before, n_after = DL.compact_delta(spark, root)
    return (
        DL.read_delta(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(n_before).cast("bigint").alias("n_files_before"),
            F.lit(n_after).cast("bigint").alias("n_files_after"),
        )
    )


@register(
    "pipeline_iceberg_expire",
    oracle="""
WITH merged AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000
              ELSE n_chars END AS n_chars
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(3 AS BIGINT) AS n_expired_files
FROM merged GROUP BY lang
""",
    description="Iceberg expireSnapshots: after a MERGE supersedes the "
    "initial snapshot, expiry retains only the current snapshot — a "
    "new vN.metadata.json with trimmed history (history trimming is "
    "itself a metadata commit) — and physically deletes everything "
    "reachable only from the expired one: its data file, its add "
    "manifest and its manifest list (exactly 3 files, the audit "
    "column). The current read must be untouched, and later commits "
    "keep working on the trimmed history. At 100 TB expiry is the "
    "metadata-AND-storage reclaim knob traded against time-travel "
    "depth — unbounded snapshot history means unbounded manifest "
    "accumulation.",
    tags=("pipeline", "storage",),
)
def pipeline_iceberg_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_expire_{sfx}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    IB.export_merge_to_iceberg(spark, root, slim, key="doc_id")
    upd = slim.filter(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000
    )
    IB.export_merge_to_iceberg(spark, root, upd, key="doc_id")
    deleted = IB.expire_snapshots(root, keep_last=1)
    return (
        IB.read_iceberg(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(len(deleted)).cast("bigint").alias("n_expired_files"),
        )
    )


@register(
    "pipeline_delta_restore",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(2 AS BIGINT) AS restored_as_version
FROM documents GROUP BY lang
""",
    description="Delta RESTORE: a bad MERGE (every doc_id % 10 == 0 "
    "row corrupted with n_chars + 1000000) is rolled back by "
    "restore_delta as a NEW commit that re-adds the good snapshot's "
    "files and removes the bad one's — history stays linear, the bad "
    "version remains auditable via time travel, and the restored read "
    "must equal the ORIGINAL corpus byte-for-byte. The recovery "
    "primitive every production table needs after a bad pipeline "
    "deploy; at 100 TB it costs one metadata commit, zero data "
    "movement (the good files never left).",
    tags=("pipeline", "storage",),
)
def pipeline_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_restore_{sfx}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    DL.export_merge_to_delta(spark, root, slim, key="doc_id")
    bad = slim.filter(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000000
    )
    DL.export_merge_to_delta(spark, root, bad, key="doc_id")
    v = DL.restore_delta(spark, root, 0)
    return (
        DL.read_delta(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(v).cast("bigint").alias("restored_as_version"),
        )
    )


@register(
    "pipeline_iceberg_rollback",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       TRUE AS bad_snapshot_still_travelable
FROM documents GROUP BY lang
""",
    description="Iceberg rollback: after a bad MERGE, "
    "rollback_to_snapshot publishes a new vN.metadata.json whose "
    "current-snapshot-id points at the good snapshot — a PURE metadata "
    "operation (nothing moved, nothing rewritten; verified by reading "
    "the bad snapshot via time travel afterwards, the audit column). "
    "The rolled-back read must equal the original corpus exactly. "
    "Iceberg's killer recovery property: at 100 TB, undoing a bad "
    "commit costs one kilobyte JSON write.",
    tags=("pipeline", "storage",),
)
def pipeline_iceberg_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import iceberg as IB

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_rollback_{sfx}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    s1 = IB.export_merge_to_iceberg(spark, root, slim, key="doc_id")
    bad = slim.filter(F.col("doc_id") % 10 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1000000
    )
    s2 = IB.export_merge_to_iceberg(spark, root, bad, key="doc_id")
    IB.rollback_to_snapshot(root, s1)
    bad_readable = (
        IB.read_iceberg(spark, root, s2)
        .filter(F.col("n_chars") > 1000000)
        .count()
        > 0
    )
    return (
        IB.read_iceberg(spark, root)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(bad_readable).alias("bad_snapshot_still_travelable"),
        )
    )


_NB_BANDS = None  # built lazily to avoid import-order issues


def _nb_bands():
    global _NB_BANDS
    if _NB_BANDS is None:
        from news_ingestion_data_pipeline_spark.operators import (
            similarity as SIM,
        )

        _NB_BANDS = [
            SIM.make_hyperplanes(dim=64, n_planes=6, seed=101),
            SIM.make_hyperplanes(dim=64, n_planes=6, seed=202),
        ]
    return _NB_BANDS


def _nb_oracle() -> str:
    from news_ingestion_data_pipeline_spark.plans.llm import (
        _SQL_COS,
        _hyperplane_sql_bits,
    )

    b1, b2 = _nb_bands()
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s1 AS (SELECT vec_id, {_hyperplane_sql_bits(b1)} AS bucket FROM embeddings),
s2 AS (SELECT vec_id, {_hyperplane_sql_bits(b2)} AS bucket FROM embeddings),
cand AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b
  FROM s1 x JOIN s1 y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
  UNION
  SELECT x.vec_id, y.vec_id
  FROM s2 x JOIN s2 y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT c.id_a, c.id_b, {_SQL_COS} AS cos_sim
FROM cand c
JOIN e a ON a.vec_id = c.id_a
JOIN e q ON q.vec_id = c.id_b
WHERE {_SQL_COS} >= 0.35
"""


@register(
    "dedup_embedding_neardup_banded",
    oracle=_nb_oracle(),
    description="OR-banded hyperplane LSH near-dup pairs — the "
    "quadratic-killer upgrade of dedup_embedding_neardup: 2 bands x "
    "6 planes instead of one 4-plane signature. Candidates share ANY "
    "band's full signature (union, distinct, ONE exact-cosine verify "
    "per pair). At cos 0.95 the banded recall is ~0.78 vs the single "
    "signature's ~0.65 while per-band buckets are 64-way instead of "
    "16-way — candidate volume drops ~8x AND recall rises, the same "
    "AND-OR trade minhash-LSH makes. Each band's self-join is salted "
    "(no corpus broadcast, no bucket-count parallelism cap). This is "
    "the knob the docs-replication smoke points at: as the corpus "
    "grows, planes-per-band and band count rise together to hold "
    "bucket occupancy — and with it the quadratic term — constant.",
    tags=("llm", "dedup", "similarity"),
)
def dedup_embedding_neardup_banded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import dedup as DD

    return DD.embedding_neardup_pairs_banded(
        t(spark, sf_dir, "embeddings"),
        bands=_nb_bands(),
        threshold=0.35,
    )


@register(
    "scan_delta_stats_pruned",
    oracle="""
WITH b AS (
  SELECT *, CASE WHEN n_chars < 150 THEN 0 WHEN n_chars < 300 THEN 1
                 WHEN n_chars < 450 THEN 2 ELSE 3 END AS bucket
  FROM documents
), f AS (
  SELECT bucket, MAX(n_chars) AS ub FROM b GROUP BY bucket
), audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_files_total,
         CAST(COUNT(*) FILTER (ub >= 300) AS BIGINT) AS n_files_read
  FROM f
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
       a.n_files_total, a.n_files_read
FROM b d CROSS JOIN audit a
WHERE d.n_chars >= 300
GROUP BY d.lang, a.n_files_total, a.n_files_read
""",
    description="Delta data skipping on add-action stats (the twin of "
    "scan_iceberg_metrics_pruned): every commit records per-file "
    "numRecords/minValues/maxValues in its add action's stats JSON "
    "(computed by one tiny aggregate at write time); the reader "
    "evaluates n_chars >= 300 against the recorded bounds and skips "
    "files the stats prove empty without opening them. The table is "
    "built as range-clustered append commits (the layout a streaming "
    "ingest naturally produces when partitioned by a rolling key), so "
    "exactly the upper buckets survive; n_files_total vs n_files_read "
    "audit the metadata-level skip and the per-lang aggregates over "
    "the surviving files must match the generating SQL exactly. Both "
    "open formats now prune identically: stats in the commit log "
    "(Delta) vs bounds in the manifests (Iceberg).",
    tags=("scan", "storage", "pruning", "pipeline"),
)
def scan_delta_stats_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_stats_{sfx}"
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    edges = [None, 150, 300, 450, None]
    bi = 0
    for i in range(4):
        lo, hi = edges[i], edges[i + 1]
        part = slim
        if lo is not None:
            part = part.filter(F.col("n_chars") >= lo)
        if hi is not None:
            part = part.filter(F.col("n_chars") < hi)
        if part.limit(1).count() == 0:
            continue
        DL.append_batch_to_delta(
            spark, root, part, app_id="stats_fixture", batch_id=bi
        )
        bi += 1
    files, n_total = DL.delta_snapshot_files_pruned(
        root, {"n_chars": (300, None)}
    )
    return (
        spark.read.parquet(*files)
        .filter(F.col("n_chars") >= 300)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.lit(n_total).cast("bigint").alias("n_files_total"),
            F.lit(len(files)).cast("bigint").alias("n_files_read"),
        )
    )
