"""Hundred-seventy-third wave: Delta type widening (reader feature).

The typeWidening feature lets a table widen a column's type in place
(integer -> long here): files written BEFORE the widen commit keep
their narrow physical type, and the reader must upcast them to the
schemaString's logical type at scan time. The clean-room reader
(operators/deltalog.py) groups the snapshot's live files by the
physical types of the widened columns (parquet footer reads —
metadata-scale) and gives each group its own vectorized scan with a
per-group upcast projection, because one mixed scan cannot promote
int32 pages to the widened type. The widen commit records the change
in the spec's ``delta.typeChanges`` field metadata and upgrades the
protocol to reader 3 / writer 7 with the feature named.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import deltalog as DL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm173")


def _fixture(spark: SparkSession, sf_dir: str) -> str:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_widen_{sfx}"
    DL.write_delta_type_widening_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    return root


def _agg(df: DataFrame, version: int) -> DataFrame:
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("score").cast("long").alias("sum_score"),
            F.max("score").cast("long").alias("max_score"),
        )
        .select(F.lit(version).alias("version"), "*")
    )


@register(
    "scan_delta_type_widening",
    oracle="""
WITH pre AS (
  SELECT lang, CAST(n_chars % 90000 AS BIGINT) AS score
  FROM documents WHERE lang <> 'fr'
),
post AS (
  SELECT * FROM pre
  UNION ALL
  SELECT lang, n_chars + 3000000000 FROM documents WHERE lang = 'fr'
),
a1 AS (
  SELECT 1 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(score) AS BIGINT) AS sum_score,
         CAST(MAX(score) AS BIGINT) AS max_score
  FROM pre GROUP BY lang
),
a2 AS (
  SELECT 2 AS version, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(score) AS BIGINT) AS sum_score,
         CAST(MAX(score) AS BIGINT) AS max_score
  FROM post GROUP BY lang
)
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="Delta TYPE WIDENING (reader feature): v0 writes the "
    "score column as INTEGER; the v1 widen commit flips the "
    "schemaString to LONG, records the change in the spec's "
    "delta.typeChanges field metadata, upgrades the protocol to "
    "reader 3 / writer 7 with typeWidening named, and appends a file "
    "whose scores exceed int32 range. The reader groups live files by "
    "the widened columns' physical footer types (metadata-scale) and "
    "upcasts each group in its own vectorized scan — a single mixed "
    "scan cannot promote int32 pages. Pre-widen (v0) and post-widen "
    "(latest) snapshots of the SAME directory aggregate side by side; "
    "the post-widen max_score > 2^31 certifies the narrow files really "
    "read under the widened logical type. Scale: footer reads are one "
    "per file like production Delta readers' schema adaptation; the "
    "data path stays whole-stage-codegen parquet scans with pushdown "
    "intact.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _fixture(spark, sf_dir)
    pre = _agg(DL.read_delta(spark, root, 0), 1)
    post = _agg(DL.read_delta(spark, root), 2)
    return pre.unionByName(post)


# ---------------------------------------------------------------------------
# Iceberg v3 default values
# ---------------------------------------------------------------------------

from news_ingestion_data_pipeline_spark.operators import iceberg as IC  # noqa: E402


def _defaults_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_defaults_{sfx}"
    s1, s2 = IC.write_iceberg_v3_default_values_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    return root, s1, s2


@register(
    "scan_iceberg_default_values",
    oracle="""
WITH docs500 AS (
  SELECT * FROM documents ORDER BY doc_id LIMIT 500
),
pre AS (
  SELECT lang, n_chars FROM docs500 WHERE lang <> 'fr'
),
cur AS (
  SELECT lang, 'legacy' AS tier, n_chars FROM pre
  UNION ALL
  SELECT lang, CASE WHEN n_chars >= 600 THEN 'standard' ELSE 'short' END,
         n_chars
  FROM docs500 WHERE lang = 'fr'
),
a1 AS (
  SELECT 1 AS version, lang, '(schema-0)' AS tier,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM pre GROUP BY lang
),
a2 AS (
  SELECT 2 AS version, lang, tier,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM cur GROUP BY lang, tier
)
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="Iceberg v3 DEFAULT VALUES: schema 1 adds a tier "
    "column carrying initial-default 'legacy' (and write-default "
    "'standard'); data files written under schema 0 resolve the "
    "missing field 4 to the DEFAULT — not null — per the spec's "
    "Column Projection rule, while the post-add file reads its "
    "explicit values. Snapshot 1 is read under its PINNED schema-id 0 "
    "(no tier column at all), certifying both default resolution and "
    "schema pinning from the same directory. Scale: defaults are "
    "schema metadata folded into the per-file-group projection the "
    "field-id reader already does — zero extra distributed work.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_default_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root, s1, _ = _defaults_fixture(spark, sf_dir)
    pre = (
        IC.read_iceberg_v3(spark, root, s1)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(
            F.lit(1).alias("version"),
            "lang",
            F.lit("(schema-0)").alias("tier"),
            "n_docs",
            "sum_chars",
        )
    )
    cur = (
        IC.read_iceberg_v3(spark, root)
        .groupBy("lang", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select(F.lit(2).alias("version"), "*")
    )
    return pre.unionByName(cur)


# ---------------------------------------------------------------------------
# Iceberg metadata (inspection) tables
# ---------------------------------------------------------------------------

from news_ingestion_data_pipeline_spark.plans.llm158 import (  # noqa: E402
    _fixture as _iceberg_fixture,
)


@register(
    "storage_iceberg_metadata_tables",
    oracle="""
WITH langs AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
),
nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM langs),
files AS (
  SELECT 'files' AS section,
         'data/lang=' || lang || '/file-1.parquet' AS name,
         lang AS detail, n
  FROM langs WHERE lang <> 'fr'
  UNION ALL
  SELECT 'files', 'data/lang=fr/file-2.parquet', 'fr',
         (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
          WHERE lang = 'fr' AND n_chars >= 600)
),
snaps AS (
  SELECT 'snapshots' AS section, '1001' AS name, 'append' AS detail,
         (SELECT k FROM nl) AS n
  UNION ALL
  SELECT 'snapshots', '1002', 'overwrite', (SELECT k FROM nl)
),
mans AS (
  SELECT 'manifests' AS section, 'metadata/m2.avro' AS name,
         'data' AS detail, (SELECT k - 1 FROM nl) AS n
  UNION ALL
  SELECT 'manifests', 'metadata/m3.avro', 'data', 1
)
SELECT * FROM files UNION ALL SELECT * FROM snaps UNION ALL
SELECT * FROM mans
""",
    description="Iceberg INSPECTION TABLES (the spec's table$files / "
    "$snapshots / $manifests relations): operational metadata queried "
    "through the same engine as data. The files section lists every "
    "live data file of the current snapshot with its partition value "
    "and manifest-recorded record_count; the snapshots section lists "
    "both snapshots with their summary operation and live-file count; "
    "the manifests section lists the current manifest list's entries "
    "with their LIVE entry counts. All three replay from the documents "
    "table via the deterministic fixture layout, so the oracle "
    "certifies the metadata pipeline (manifest-list -> manifest -> "
    "entry) end to end. Scale: inspection tables are manifest-scale — "
    "one row per file/manifest/snapshot, never per data row — exactly "
    "how production engines answer these queries at 100 TB.",
    tags=("storage", "scan"),
)
def storage_iceberg_metadata_tables(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root, s1, s2 = _iceberg_fixture(spark, sf_dir)
    files = IC.iceberg_metadata_table(spark, root, "files").select(
        F.lit("files").alias("section"),
        F.col("file_path").alias("name"),
        F.get_json_object("partition", "$.lang").alias("detail"),
        F.col("record_count").alias("n"),
    )
    live_counts = {
        s1: IC.iceberg_metadata_table(spark, root, "files", s1).count(),
        s2: IC.iceberg_metadata_table(spark, root, "files", s2).count(),
    }
    snaps_df = IC.iceberg_metadata_table(spark, root, "snapshots")
    counts = local_df(
        spark, [(k, v) for k, v in live_counts.items()], "sid long, n_live long"
    )
    snaps = (
        snaps_df.join(counts, snaps_df["snapshot_id"] == counts["sid"])
        .select(
            F.lit("snapshots").alias("section"),
            F.col("snapshot_id").cast("string").alias("name"),
            F.col("operation").alias("detail"),
            F.col("n_live").alias("n"),
        )
    )
    mans = (
        IC.iceberg_metadata_table(spark, root, "files")
        .groupBy("manifest")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("manifests").alias("section"),
            F.col("manifest").alias("name"),
            F.lit("data").alias("detail"),
            F.col("n"),
        )
    )
    return files.unionByName(snaps).unionByName(mans)


# ---------------------------------------------------------------------------
# Delta in-commit timestamps
# ---------------------------------------------------------------------------

from news_ingestion_data_pipeline_spark.plans.llm157 import (  # noqa: E402
    _AGG_SQL,
    _snapshot_agg,
)


@register(
    "scan_delta_ict_time_travel",
    oracle=f"""
WITH all_docs AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h FROM documents
),
filt AS (SELECT * FROM all_docs WHERE n_chars >= 600),
nofr AS (SELECT * FROM filt WHERE lang <> 'fr'),
a1 AS ({_AGG_SQL.format(extra="1 AS version,", extra_grp="1,", src="all_docs")}),
a2 AS ({_AGG_SQL.format(extra="2 AS version,", extra_grp="1,", src="filt")}),
a3 AS ({_AGG_SQL.format(extra="3 AS version,", extra_grp="1,", src="nofr")})
SELECT * FROM a1 UNION ALL SELECT * FROM a2 UNION ALL SELECT * FROM a3
""",
    description="Delta IN-COMMIT TIMESTAMPS (writer feature "
    "inCommitTimestamp): each commit's logical time lives in its "
    "commitInfo action — the first action per the spec — so "
    "timestamp-based time travel is stable across file copies and "
    "restores (file mtimes no longer matter). Three commits 10 s "
    "apart (all docs; n_chars >= 600; plus drop-French) are read "
    "TIMESTAMP AS OF the exact first ICT (inclusive boundary), "
    "mid-window, and the last ICT; the writer clamps non-monotonic "
    "clocks to previous+1 and the resolver raises on a non-monotonic "
    "log. Scale: resolution reads one commitInfo line per commit — "
    "pure log metadata, zero data I/O until the chosen snapshot "
    "scans.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_ict_time_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_ict_{sfx}"
    t0, t1, t2 = DL.write_delta_ict_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    a1 = _snapshot_agg(
        DL.read_delta_as_of_timestamp(spark, root, t0)
    ).select(F.lit(1).alias("version"), "*")
    a2 = _snapshot_agg(
        DL.read_delta_as_of_timestamp(spark, root, t1 + 5000)
    ).select(F.lit(2).alias("version"), "*")
    a3 = _snapshot_agg(
        DL.read_delta_as_of_timestamp(spark, root, t2)
    ).select(F.lit(3).alias("version"), "*")
    return a1.unionByName(a2).unionByName(a3)


# ---------------------------------------------------------------------------
# UniForm-style dual publish (one dataset, two protocol readers)
# ---------------------------------------------------------------------------

from news_ingestion_data_pipeline_spark.plans.llm157 import (  # noqa: E402
    _LIVE_SQL,
)


@register(
    "pipeline_uniform_dual_publish",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
a1 AS ({_AGG_SQL.format(extra="'delta' AS reader,", extra_grp="1,", src="live")}),
a2 AS ({_AGG_SQL.format(extra="'iceberg' AS reader,", extra_grp="1,", src="live")})
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="UniForm-style DUAL-FORMAT publish: a Delta table's "
    "live snapshot gains generated Iceberg metadata (manifest -> "
    "manifest list -> metadata.json) over the SAME parquet files — no "
    "data copied or rewritten, the two formats are metadata layers on "
    "one dataset. Both protocol readers then scan the directory "
    "independently and their per-lang counts, char sums and "
    "order-pinned content checksums must agree exactly (and match the "
    "generating SQL). DV-carrying snapshots are refused by name: a "
    "row-level mask has no v2 file-level equivalent. Scale: the "
    "publish is one log replay plus kilobytes of Avro/JSON regardless "
    "of data size — how production dual-format tables stay cheap.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_uniform_dual_publish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/uniform_{sfx}"
    DL.write_delta_fixture(spark, t(spark, sf_dir, "documents"), root)
    IC.publish_iceberg_metadata_for_delta(root)
    via_delta = _snapshot_agg(DL.read_delta(spark, root)).select(
        F.lit("delta").alias("reader"), "*"
    )
    via_iceberg = _snapshot_agg(IC.read_iceberg(spark, root)).select(
        F.lit("iceberg").alias("reader"), "*"
    )
    return via_delta.unionByName(via_iceberg)


# ---------------------------------------------------------------------------
# Delta row tracking (the Iceberg row-lineage twin)
# ---------------------------------------------------------------------------


@register(
    "scan_delta_row_tracking",
    oracle="""
WITH evens AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS _row_id
  FROM documents WHERE doc_id % 2 = 0
),
odds AS (
  SELECT doc_id, lang, n_chars,
         (SELECT COUNT(*) FROM documents WHERE doc_id % 2 = 0)
         + ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS _row_id
  FROM documents WHERE doc_id % 2 = 1
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(_row_id AS BIGINT) AS _row_id
FROM (SELECT * FROM evens UNION ALL SELECT * FROM odds)
""",
    description="Delta ROW TRACKING (writer feature rowTracking): add "
    "actions carry baseRowId + defaultRowCommitVersion, and a row's "
    "fresh _row_id is its file's baseRowId plus its position — the "
    "Delta protocol's twin of Iceberg v3 row lineage, giving every row "
    "a durable identity without a user key. v0 adds even doc_ids at "
    "row-id 0.., v1 appends odds at the high-water mark. The id "
    "materializes map-side from the scan's row_index against a "
    "broadcast file->baseRowId map (log-scale) — no shuffle. Oracle "
    "replays the assignment as per-commit ROW_NUMBERs in doc_id order.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_rowtrack_{sfx}"
    DL.write_delta_row_tracking_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    return DL.read_delta_with_row_ids(spark, root).select(
        "doc_id", "lang", F.col("n_chars").cast("long"), "_row_id"
    )


# ---------------------------------------------------------------------------
# Iceberg as a streaming sink (the Delta sink's twin)
# ---------------------------------------------------------------------------

import os  # noqa: E402
import shutil  # noqa: E402


@register(
    "stream_iceberg_append_sink",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       CAST(4 AS BIGINT) AS n_snapshots,
       TRUE AS replay_skipped
FROM events
GROUP BY event_type
""",
    description="Streaming -> Iceberg sink (the Delta sink's twin): a "
    "maxFilesPerTrigger=1 AvailableNow stream drains 4 source files "
    "through foreachBatch, each micro-batch committing one FAST-APPEND "
    "snapshot whose summary records (streaming-app-id, "
    "streaming-batch-id) — Iceberg's idiom for exactly-once streaming "
    "writes. The last batch is then deliberately REPLAYED (the "
    "restart-after-commit crash window) and the summary guard skips it "
    "before writing a byte; audit columns certify exactly 4 snapshots "
    "and the skip, and the read-back per-type counts/sums equal the "
    "batch aggregate — each record exactly once. Scale: the guard is "
    "one metadata read; each commit is one manifest + manifest list, "
    "kilobytes regardless of batch size.",
    tags=("streaming", "storage", "pipeline"),
)
def stream_iceberg_append_sink(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = f"{_ROOT}/ice_sink_src_{sfx}"
    tbl = f"{_ROOT}/ice_sink_tbl_{sfx}"
    ckpt = f"{_ROOT}/ice_sink_ckpt_{sfx}"
    for p in (src, tbl, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    ev.repartition(4).write.mode("overwrite").parquet(src)
    app_id = f"ice_sink_{sfx}"

    batch_ids: list[int] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        committed = IC.append_batch_to_iceberg(
            spark, tbl, batch_df, app_id=app_id, batch_id=batch_id
        )
        assert committed, f"batch {batch_id} unexpectedly deduped"
        batch_ids.append(batch_id)

    q = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    replay_committed = IC.append_batch_to_iceberg(
        spark,
        tbl,
        spark.read.parquet(src),
        app_id=app_id,
        batch_id=max(batch_ids),
    )
    n_snapshots = len(IC.current_metadata(tbl)["snapshots"])

    back = IC.read_iceberg(spark, tbl)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(20,10)"))
        .cast("double")
        .alias("sum_value"),
        F.lit(n_snapshots).cast("bigint").alias("n_snapshots"),
        F.lit(not replay_committed).alias("replay_skipped"),
    )


@register(
    "stream_iceberg_source_tail",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       CAST(4 AS BIGINT) AS n_batches_ge
FROM events
GROUP BY event_type
""",
    description="Iceberg table as a STREAMING SOURCE (completes the "
    "2x2 open-format streaming matrix: Delta/Iceberg x sink/source): "
    "an append-only table built by 4 summary-guarded streaming commits "
    "is tailed snapshot by snapshot via the spec's incremental append "
    "scan — each snapshot's ADDED manifest entries are one micro-batch. "
    "The streamed aggregate must equal the batch aggregate of the "
    "whole corpus (nothing dropped or doubled across snapshot "
    "boundaries), with the batch count as audit. At 100 TB this is how "
    "downstream jobs consume an ingest table continuously: per-snapshot "
    "increments resolved from manifest metadata, never full-table "
    "re-reads.",
    tags=("streaming", "storage", "pipeline"),
)
def stream_iceberg_source_tail(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"{_ROOT}/ice_srctbl_{sfx}"
    shutil.rmtree(tbl, ignore_errors=True)

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        (F.col("event_id") % 4).alias("slice"),
    )
    for i in range(4):
        IC.append_batch_to_iceberg(
            spark,
            tbl,
            ev.filter(F.col("slice") == i).drop("slice"),
            app_id=f"ice_tail_{sfx}",
            batch_id=i,
        )

    snaps = [
        s["snapshot-id"] for s in IC.current_metadata(tbl)["snapshots"]
    ]
    agg = None
    n_batches = 0
    prev = None
    for sid in snaps:
        if prev is None:
            batch = IC.read_iceberg(spark, tbl, sid)
        else:
            batch = IC.read_iceberg_incremental(spark, tbl, prev, sid).drop(
                "_snapshot_id"
            )
        prev = sid
        n_batches += 1
        part = batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,10)")).alias("s"),
        )
        agg = part if agg is None else agg.unionByName(part)
    return (
        agg.groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            "n_events",
            "sum_value",
            F.lit(n_batches).cast("bigint").alias("n_batches_ge"),
        )
    )


@register(
    "pipeline_delta_cdf_dv",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
dropped AS (SELECT * FROM live WHERE doc_id % 5 = 0)
SELECT 'delete' AS _change_type, lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5
FROM dropped GROUP BY lang
""",
    description="Change Data Feed DERIVED FROM DELETION VECTORS: a DV "
    "commit re-adds each touched file with a grown bitmap and no cdc "
    "files, so the CDF reader computes the commit's deletes as the "
    "per-file bitmap DIFF (new DV minus old DV) and fetches exactly "
    "those rows via a (file, position) semi-join — the spec's "
    "derivation for merge-on-read deletes, previously a hard error "
    "here. Per-lang counts and order-pinned content checksums of the "
    "emitted delete rows must equal the predicate's selection. Scale: "
    "the bitmap diff is metadata-scale; the row fetch scans only the "
    "touched files.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_delta_cdf_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_cdf_dv_{sfx}"
    DL.write_delta_fixture(spark, t(spark, sf_dir, "documents"), root)
    v_dv, _ = DL.delete_where_with_dv(spark, root, F.col("doc_id") % 5 == 0)
    changes = DL.read_delta_changes(spark, root, v_dv, v_dv)
    return changes.groupBy("_change_type", "lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "content_h"))
                    ),
                    lambda s: s["content_h"],
                ),
                "",
            )
        ).alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# Delta OPTIMIZE ZORDER (clustered compaction that keeps data skipping)
# ---------------------------------------------------------------------------


def _zsql(x: str, y: str) -> str:
    terms = []
    for i in range(8):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "pipeline_delta_optimize_zorder",
    oracle=f"""
WITH docs AS (SELECT doc_id, n_chars FROM documents),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM docs),
stats AS (SELECT MIN(doc_id) AS xlo, MAX(doc_id) AS xhi,
                 MIN(n_chars) AS ylo, MAX(n_chars) AS yhi FROM docs),
q AS (
  SELECT n_chars,
         CAST(floor((doc_id - xlo) * 256.0 / (xhi - xlo + 1)) AS BIGINT)
           AS x,
         CAST(floor((n_chars - ylo) * 256.0 / (yhi - ylo + 1)) AS BIGINT)
           AS y
  FROM docs, stats
),
z AS (SELECT n_chars, {_zsql('x', 'y')} AS zval FROM q),
g AS (
  SELECT (zval * 4) // 65536 AS zf, MAX(n_chars) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM z GROUP BY 1
)
SELECT 'pre' AS phase, CAST(1 AS BIGINT) AS n_files,
       CAST(1 AS BIGINT) AS n_kept, (SELECT total FROM nn) AS n_rows_kept
UNION ALL
SELECT 'zorder', (SELECT CAST(COUNT(*) AS BIGINT) FROM g),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM g WHERE mx >= 300),
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM g WHERE mx >= 300)
""",
    description="Delta OPTIMIZE ZORDER: compaction that CLUSTERS "
    "instead of just concatenating — (doc_id, n_chars) quantize to an "
    "8-bit grid, interleave into a 16-bit Morton z-value, and the "
    "z-RANGE splits deterministically into 4 files (zf = z*4 >> 16, no "
    "sampling-dependent range partitioner), one distributed pass via "
    "hash-repartition on the group id + partitionBy write. Every "
    "rewritten add carries stats recovered from its parquet FOOTER, so "
    "data skipping survives the rewrite: an n_chars >= 300 range query "
    "prunes the low-n_chars z-files from the log alone, and scanning "
    "only the kept files yields exactly the kept groups' row count. "
    "The oracle replays the quantization, interleave, grouping and "
    "pruning decision bit for bit. Scale: this is the OPTIMIZE ZORDER "
    "BY command users run nightly at 100 TB — clustering cost is one "
    "shuffle, skipping benefit is permanent.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_delta_optimize_zorder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_zorder_{sfx}"
    shutil.rmtree(root, ignore_errors=True)
    slim = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    DL.export_merge_to_delta(spark, root, slim, key="doc_id")
    pre_files, pre_total = DL.delta_snapshot_files_pruned(
        root, {"n_chars": (300, None)}
    )
    n_pre = spark.read.parquet(*pre_files).count() if pre_files else 0
    DL.compact_delta(
        spark, root, max_files=4, zorder_by=("doc_id", "n_chars")
    )
    post_files, post_total = DL.delta_snapshot_files_pruned(
        root, {"n_chars": (300, None)}
    )
    n_post = (
        spark.read.parquet(*post_files).count() if post_files else 0
    )
    return local_df(
        spark,
        [
            ("pre", pre_total, len(pre_files), n_pre),
            ("zorder", post_total, len(post_files), n_post),
        ],
        "phase string, n_files long, n_kept long, n_rows_kept long",
    )


@register(
    "scan_delta_partition_pruned",
    oracle="""
WITH fr AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h
  FROM documents WHERE lang IN ('fr', 'de')
),
nl AS (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS k FROM documents)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5,
       CAST(2 AS BIGINT) AS n_files_scanned,
       (SELECT k FROM nl) AS n_files_total
FROM fr GROUP BY lang
""",
    description="Delta PARTITION PRUNING (the Iceberg twin): a "
    "hive-partitioned Delta table (one file per lang under "
    "lang=<value>/ dirs, add actions carrying partitionValues) is read "
    "with a {fr, de} partition filter resolved from the LOG alone — "
    "non-matching files never open. The kept files scan as ONE "
    "distributed read with basePath partition discovery, so the "
    "partition column (stored in the path, not the data files) "
    "reconstitutes natively. Audit columns certify exactly 2 of "
    "n-langs files scanned; per-lang counts + order-pinned content "
    "checksums certify nothing leaked across the prune. Scale: "
    "pruning cost is one log replay — at 100 TB this is the difference "
    "between scanning a partition and scanning a table.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_partition_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_part_{sfx}"
    DL.write_delta_partitioned_fixture(
        spark, t(spark, sf_dir, "documents"), root
    )
    df, n_scanned, n_total = DL.read_delta_partition_pruned(
        spark, root, {"lang": {"fr", "de"}}
    )
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "content_h"))
                    ),
                    lambda s: s["content_h"],
                ),
                "",
            )
        ).alias("content_md5"),
        F.lit(n_scanned).cast("bigint").alias("n_files_scanned"),
        F.lit(n_total).cast("bigint").alias("n_files_total"),
    )


@register(
    "pipeline_iceberg_rewrite_files",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
nl AS (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS k FROM documents),
a1 AS ({_AGG_SQL.format(extra="'pre' AS phase,", extra_grp="1,", src="live")}),
a2 AS ({_AGG_SQL.format(extra="'post' AS phase,", extra_grp="1,", src="live")})
SELECT a1.*, (SELECT k FROM nl) AS n_files FROM a1
UNION ALL
SELECT a2.*, (SELECT k FROM nl) AS n_files FROM a2
""",
    description="Iceberg rewriteDataFiles (bin-pack COMPACTION): the "
    "lang-partitioned fixture's live files rewrite into ONE file PER "
    "PARTITION via a REPLACE snapshot — a manifest marking every old "
    "entry DELETED plus the ADDED entries, each carrying its REAL "
    "recorded partition value so partition pruning stays valid after "
    "compaction; history retained. Pre- and post-compaction reads of "
    "the SAME directory must aggregate identically (per-lang counts, "
    "char sums, order-pinned content checksums), with the live file "
    "count as the audit column — compaction reorganizes bytes, never "
    "rows. The Iceberg twin of Delta OPTIMIZE. Scale: the commit is "
    "one manifest + manifest list; the data pass is the per-partition "
    "rewrite every maintenance window pays.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_iceberg_rewrite_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_rewrite_{sfx}"
    IC.write_iceberg_fixture(spark, t(spark, sf_dir, "documents"), root)
    pre_files, _ = IC.snapshot_files(root)
    pre = _snapshot_agg(IC.read_iceberg(spark, root)).select(
        F.lit("pre").alias("phase"),
        "*",
        F.lit(len(pre_files)).cast("bigint").alias("n_files"),
    )
    _, n_before, n_after = IC.rewrite_data_files(
        spark, root, sort_by="doc_id"
    )
    post_files, _ = IC.snapshot_files(root)
    post = _snapshot_agg(IC.read_iceberg(spark, root)).select(
        F.lit("post").alias("phase"),
        "*",
        F.lit(len(post_files)).cast("bigint").alias("n_files"),
    )
    return pre.unionByName(post)


@register(
    "pipeline_iceberg_changelog",
    oracle="""
WITH ins AS (
  SELECT 'insert' AS _change_type, 1 AS phase, lang,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
           AS ids_md5
  FROM documents GROUP BY lang
),
d1 AS (
  SELECT 'delete' AS _change_type, 2 AS phase, lang,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
           AS ids_md5
  FROM documents WHERE lang = 'fr' GROUP BY lang
),
d2 AS (
  SELECT 'delete' AS _change_type, 3 AS phase, lang,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
           AS ids_md5
  FROM documents WHERE lang <> 'fr' AND n_chars < 300 GROUP BY lang
)
SELECT * FROM ins UNION ALL SELECT * FROM d1 UNION ALL SELECT * FROM d2
""",
    description="Iceberg CHANGELOG scan (the Delta CDF twin): diffing "
    "snapshot states yields row-level changes — data files new in the "
    "later snapshot surface as inserts, and positions newly masked by "
    "deletion vectors surface as deletes via per-file bitmap DIFF + "
    "(file, position) semi-join fetch. Three windows over a v3 table: "
    "empty->s1 (all rows insert), s1->s2 (the French DV delete), "
    "s2->s3 (a second superseding DV delete of short non-French docs — "
    "the diff must EXCLUDE positions already masked at s2, exactly the "
    "one-DV-per-file supersede rule). Rewrite snapshots raise by name: "
    "compaction is not churn. Scale: state diff is manifests + Puffin "
    "blobs; the row fetch touches only changed files.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_iceberg_changelog(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_changelog_{sfx}"
    docs = t(spark, sf_dir, "documents")
    s1, s2 = IC.write_iceberg_v3_dv_fixture(spark, docs, root)
    s3, _ = IC.append_dv_delete(spark, root, F.col("n_chars") < 300)

    def _agg(df: DataFrame, phase: int) -> DataFrame:
        return (
            df.groupBy("_change_type", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list("doc_id")),
                            lambda d: d.cast("string"),
                        ),
                        ",",
                    )
                ).alias("ids_md5"),
            )
            .select(
                "_change_type", F.lit(phase).alias("phase"), "lang",
                "n_rows", "ids_md5",
            )
        )

    c1 = _agg(IC.read_iceberg_changelog(spark, root, None, s1), 1)
    c2 = _agg(IC.read_iceberg_changelog(spark, root, s1, s2), 2)
    c3 = _agg(IC.read_iceberg_changelog(spark, root, s2, s3), 3)
    return c1.unionByName(c2).unionByName(c3)


@register(
    "pipeline_delta_check_constraints",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       TRUE AS violation_blocked,
       CAST(1 AS BIGINT) AS n_constraints
FROM documents GROUP BY lang
""",
    description="Delta CHECK CONSTRAINTS (writer feature "
    "checkConstraints): adding a constraint lands the predicate in "
    "delta.constraints.* configuration and upgrades the protocol with "
    "the feature named; from then on every append validates BEFORE "
    "writing a byte. The even docs land pre-constraint, the odds land "
    "post-constraint (all valid), and a deliberately corrupted batch "
    "(negated n_chars) is REJECTED with the constraint named — the "
    "audit column certifies the block, and the read-back per-lang "
    "aggregate equals exactly the two valid batches. Scale: "
    "enforcement is one map-side filter per constraint on the batch "
    "being appended, never a table scan.",
    tags=("pipeline", "storage"),
)
def pipeline_delta_check_constraints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_check_{sfx}"
    shutil.rmtree(root, ignore_errors=True)
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    app = f"check_{sfx}"
    DL.append_batch_to_delta(spark, root, evens, app_id=app, batch_id=0)
    DL.add_check_constraint(root, "chars_positive", "n_chars > 0")
    DL.append_batch_to_delta(spark, root, odds, app_id=app, batch_id=1)
    blocked = False
    try:
        DL.append_batch_to_delta(
            spark,
            root,
            odds.withColumn("n_chars", -F.col("n_chars")),
            app_id=app,
            batch_id=2,
        )
    except ValueError as e:
        blocked = "chars_positive" in str(e)
    conf = DL._replay(root)[2]["configuration"]
    n_constraints = sum(
        1 for k in conf if k.startswith("delta.constraints.")
    )
    return DL.read_delta(spark, root).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.lit(blocked).alias("violation_blocked"),
        F.lit(n_constraints).cast("bigint").alias("n_constraints"),
    )


@register(
    "pipeline_uniform_reverse",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
a1 AS ({_AGG_SQL.format(extra="'iceberg' AS reader,", extra_grp="1,", src="live")}),
a2 AS ({_AGG_SQL.format(extra="'delta' AS reader,", extra_grp="1,", src="live")})
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="UniForm REVERSE direction: an Iceberg table gains a "
    "generated Delta _delta_log (one v0 commit of protocol/metaData/"
    "add actions) over the SAME live parquet files — no data copied, "
    "completing bidirectional dual-format publication. Both protocol "
    "readers scan the directory independently and their per-lang "
    "counts, char sums and order-pinned content checksums must agree "
    "exactly. Snapshots with live delete files are refused by name "
    "(row masks have no Delta file-level equivalent). Scale: one "
    "manifest walk plus kilobytes of JSON.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_uniform_reverse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/uniform_rev_{sfx}"
    IC.write_iceberg_fixture(spark, t(spark, sf_dir, "documents"), root)
    IC.publish_delta_log_for_iceberg(root)
    via_iceberg = _snapshot_agg(IC.read_iceberg(spark, root)).select(
        F.lit("iceberg").alias("reader"), "*"
    )
    via_delta = _snapshot_agg(DL.read_delta(spark, root)).select(
        F.lit("delta").alias("reader"), "*"
    )
    return via_iceberg.unionByName(via_delta)


@register(
    "stream_delta_cdf_tail",
    oracle="""
WITH evens AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
odds AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
dels AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
b0 AS (
  SELECT 'insert' AS _change_type, 0 AS batch,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
           AS ids_md5
  FROM evens
),
b1 AS (
  SELECT 'insert', 1, CAST(COUNT(*) AS BIGINT),
         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
  FROM odds
),
b2 AS (
  SELECT 'delete', 2, CAST(COUNT(*) AS BIGINT),
         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
  FROM dels
)
SELECT * FROM b0 UNION ALL SELECT * FROM b1 UNION ALL SELECT * FROM b2
""",
    description="Streaming CDF TAIL: a downstream job consumes a Delta "
    "table's CHANGE FEED version by version — append commits surface "
    "as insert batches, and a deletion-vector commit surfaces as a "
    "delete batch derived from the bitmap diff (the CDF x DV "
    "composition, in the incremental shape consumers actually run). "
    "Three versions (even appends, odd appends, DV delete of "
    "doc_id % 5 = 0) each land as one batch whose counts and "
    "order-pinned id checksums replay from SQL. At 100 TB this is how "
    "a derived table stays in sync with row-level deletes without "
    "full-table diffs: per-version increments, bitmap-sized delete "
    "metadata.",
    tags=("streaming", "storage", "pipeline"),
)
def stream_delta_cdf_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_cdf_tail_{sfx}"
    shutil.rmtree(root, ignore_errors=True)
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    app = f"cdf_tail_{sfx}"
    DL.append_batch_to_delta(
        spark, root, docs.filter(F.col("doc_id") % 2 == 0),
        app_id=app, batch_id=0,
    )
    DL.append_batch_to_delta(
        spark, root, docs.filter(F.col("doc_id") % 2 == 1),
        app_id=app, batch_id=1,
    )
    DL.delete_where_with_dv(spark, root, F.col("doc_id") % 5 == 0)

    agg = None
    for i, v in enumerate(DL.list_commit_versions(root)):
        batch = DL.read_delta_changes(spark, root, v, v)
        part = (
            batch.groupBy("_change_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list("doc_id")),
                            lambda d: d.cast("string"),
                        ),
                        ",",
                    )
                ).alias("ids_md5"),
            )
            .select(
                "_change_type", F.lit(i).alias("batch"), "n_rows",
                "ids_md5",
            )
        )
        agg = part if agg is None else agg.unionByName(part)
    return agg


@register(
    "pipeline_delta_shallow_clone",
    oracle=f"""
WITH live AS ({_LIVE_SQL}),
cl AS (SELECT * FROM live WHERE doc_id % 5 <> 0),
a1 AS ({_AGG_SQL.format(extra="'source' AS tbl,", extra_grp="1,", src="live")}),
a2 AS ({_AGG_SQL.format(extra="'clone' AS tbl,", extra_grp="1,", src="cl")})
SELECT * FROM a1 UNION ALL SELECT * FROM a2
""",
    description="Delta SHALLOW CLONE: a new table whose v0 commit "
    "re-adds the source snapshot's live files BY ABSOLUTE PATH — zero "
    "bytes copied, pure metadata — after which the two logs evolve "
    "independently. A deletion-vector DELETE runs in the CLONE "
    "(doc_id % 5 = 0) and the source must stay byte-identical: "
    "per-lang counts, char sums and order-pinned content checksums of "
    "both tables certify isolation, the dev/test-snapshot contract "
    "teams rely on in production. Scale: clone cost is one log replay "
    "plus kilobytes of JSON regardless of table size.",
    tags=("pipeline", "storage", "scan"),
)
def pipeline_delta_shallow_clone(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    src = f"{_ROOT}/clone_src_{sfx}"
    dst = f"{_ROOT}/clone_dst_{sfx}"
    shutil.rmtree(dst, ignore_errors=True)
    DL.write_delta_fixture(spark, t(spark, sf_dir, "documents"), src)
    DL.clone_delta_shallow(src, dst)
    DL.delete_where_with_dv(spark, dst, F.col("doc_id") % 5 == 0)
    source = _snapshot_agg(DL.read_delta(spark, src)).select(
        F.lit("source").alias("tbl"), "*"
    )
    clone = _snapshot_agg(DL.read_delta(spark, dst)).select(
        F.lit("clone").alias("tbl"), "*"
    )
    return source.unionByName(clone)


@register(
    "pipeline_iceberg_orphan_files",
    oracle="""
WITH live AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h
  FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang, n_chars, md5(text)
  FROM documents WHERE lang = 'fr' AND n_chars >= 600
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5,
       CAST(2 AS BIGINT) AS n_orphans_removed
FROM live GROUP BY lang
""",
    description="Iceberg removeOrphanFiles: two stray files (a crashed "
    "write under data/, an abandoned manifest under metadata/) are "
    "planted next to a healthy table; the command deletes exactly the "
    "unreachable two — reachability walks every snapshot's manifest "
    "list, manifests, and entries INCLUDING deleted-status history "
    "references, so neither live nor time-travelable state is touched. "
    "The post-cleanup read must still match the generating SQL, with "
    "the orphan count as audit. Scale: reachability is a manifest "
    "walk; the filesystem scan is the same listing any janitor job "
    "pays.",
    tags=("pipeline", "storage"),
)
def pipeline_iceberg_orphan_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_orphan_{sfx}"
    IC.write_iceberg_fixture(spark, t(spark, sf_dir, "documents"), root)
    # plant orphans: a crashed data write and an abandoned manifest
    with open(os.path.join(root, "data", "orphan-write.parquet"), "wb") as f:
        f.write(b"PAR1garbage")
    with open(os.path.join(root, "metadata", "orphan-m.avro"), "wb") as f:
        f.write(b"Obj\x01garbage")
    removed = IC.remove_orphan_files(root)
    back = _snapshot_agg(IC.read_iceberg(spark, root))
    return back.select(
        "*", F.lit(len(removed)).cast("bigint").alias("n_orphans_removed")
    )


@register(
    "scan_delta_generated_partition",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       CAST(3 AS BIGINT) AS n_files_scanned,
       CAST(30 AS BIGINT) AS n_files_total
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <  TIMESTAMP '2024-01-13 00:00:00'
GROUP BY event_type
""",
    description="Delta GENERATED COLUMNS driving partition pruning: "
    "the events table lands partitioned by day, a generated column "
    "whose delta.generationExpression is CAST(ts AS DATE) (writer "
    "feature generatedColumns). A query filtering the RAW timestamp "
    "[Jan 10, Jan 13) derives the covering day set from the recorded "
    "expression and prunes 27 of 30 day files from the log alone — "
    "the generated-column rewrite production engines apply. "
    "Unsupported expressions raise by name rather than silently "
    "scanning everything. Per-type counts/sums over the 3 scanned "
    "days must match SQL exactly; file counts are the audit. Scale: "
    "the derivation is string metadata; the scan touches only "
    "matching partitions.",
    tags=("scan", "storage", "pipeline"),
)
def scan_delta_generated_partition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import datetime as dt

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/delta_gen_{sfx}"
    DL.write_delta_generated_partition_fixture(
        spark, t(spark, sf_dir, "events"), root
    )
    lo = dt.datetime(2024, 1, 10)
    hi = dt.datetime(2024, 1, 13)
    meta = DL._replay(root)[2]
    pfilter = DL.partition_filter_from_generated(meta, "ts", lo, hi)
    df, n_scanned, n_total = DL.read_delta_partition_pruned(
        spark, root, pfilter
    )
    return (
        df.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,10)"))
            .cast("double")
            .alias("sum_value"),
            F.lit(n_scanned).cast("bigint").alias("n_files_scanned"),
            F.lit(n_total).cast("bigint").alias("n_files_total"),
        )
    )


# ---------------------------------------------------------------------------
# Iceberg Puffin table statistics (NDV sketches planners consume)
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_DEN = float(16**15)


def _kmv_sql(keys_sql: str) -> str:
    return f"""
  SELECT CASE WHEN n_seen < {_KMV_K} THEN CAST(n_seen AS DOUBLE)
              ELSE ({_KMV_K} - 1) / (h_k / {_KMV_DEN!r}) END AS est,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM ({keys_sql})) AS exact_d
  FROM (
    SELECT v AS h_k, ROW_NUMBER() OVER (ORDER BY v) AS rn,
           COUNT(*) OVER () AS n_seen
    FROM (
      SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
             AS v
      FROM ({keys_sql})
    )
    QUALIFY rn = LEAST({_KMV_K}, n_seen)
  )
"""


@register(
    "storage_iceberg_puffin_stats",
    oracle=f"""
WITH live AS (
  SELECT doc_id, lang FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang FROM documents WHERE lang = 'fr' AND n_chars >= 600
),
c_lang AS ({_kmv_sql("SELECT DISTINCT lang AS k FROM live")}),
c_doc AS ({_kmv_sql("SELECT DISTINCT doc_id AS k FROM live")})
SELECT 'doc_id' AS column, exact_d AS exact_distinct,
       round(est, 4) AS ndv_est, TRUE AS blob_roundtrip FROM c_doc
UNION ALL
SELECT 'lang', exact_d, round(est, 4), TRUE FROM c_lang
""",
    description="Iceberg TABLE STATISTICS via Puffin: per-column KMV "
    "bottom-64 sketches land as blobs in a statistics file registered "
    "in the metadata's statistics list, each carrying the spec's ndv "
    "blob property — what a planner reads for join sizing without "
    "touching data. The seedless md5 hash makes the sketch "
    "deterministic, so the DuckDB oracle recomputes the IDENTICAL "
    "estimate (hash-match, stronger than an epsilon bound); the "
    "blob_roundtrip audit certifies the ndv re-derived from the blob "
    "BYTES equals the registered property. Scale: the sketch is "
    "bottom-k per column (TakeOrderedAndProject, no full shuffle), "
    "the file is kilobytes, and republishing is a no-op.",
    tags=("storage", "agg", "sketch"),
)
def storage_iceberg_puffin_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root, _, _ = _iceberg_fixture(spark, sf_dir)
    live = IC.read_iceberg(spark, root)

    def _h(col):
        return (
            F.conv(
                F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
            ).cast("long")
        )

    minima: dict[str, list[int]] = {}
    for col in ("doc_id", "lang"):
        rows = (
            live.select(col)
            .distinct()
            .select(_h(col).alias("v"))
            .orderBy("v")
            .limit(_KMV_K)
            .collect()
        )  # bottom-k scalars, bounded by k
        minima[col] = [r.v for r in rows]
    IC.publish_puffin_statistics(root, minima, _KMV_K)
    stats = {s["column"]: s for s in IC.read_table_statistics(root, _KMV_K)}

    exact = live.agg(
        F.countDistinct("doc_id").cast("bigint").alias("d_doc"),
        F.countDistinct("lang").cast("bigint").alias("d_lang"),
    )
    rows_out = []
    for col, dcol in (("doc_id", "d_doc"), ("lang", "d_lang")):
        s = stats[col]
        roundtrip = int(round(s["ndv_from_blob"])) == s["ndv_property"]
        rows_out.append((col, dcol, s["ndv_from_blob"], roundtrip))
    return exact.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(col).alias("column"),
                        F.col(dcol).alias("exact_distinct"),
                        F.round(F.lit(est), 4).alias("ndv_est"),
                        F.lit(rt).alias("blob_roundtrip"),
                    )
                    for col, dcol, est, rt in rows_out
                ]
            )
        ).alias("s")
    ).select("s.*")


@register(
    "storage_iceberg_partition_stats",
    oracle="""
WITH langs AS (SELECT DISTINCT lang FROM documents),
live AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang, n_chars FROM documents
  WHERE lang = 'fr' AND n_chars >= 600
),
cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM live GROUP BY lang)
SELECT '{"lang": "' || l.lang || '"}' AS partition,
       CAST(1 AS BIGINT) AS data_file_count,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS record_count
FROM langs l LEFT JOIN cnt ON l.lang = cnt.lang
""",
    description="Iceberg PARTITION STATISTICS file (the spec's "
    "partition-statistics metadata list): per-partition data-file and "
    "record counts aggregate from the manifests into one parquet "
    "row per partition, registered in a new metadata version — what "
    "planners read for per-partition sizing without walking manifests. "
    "The fixture's manifest-recorded record counts are REAL, so every "
    "partition's row replays from the documents table (fr reflects the "
    "quality rewrite). Republishing the same snapshot is a no-op. "
    "Scale: the file is one row per partition, kilobytes at any table "
    "size.",
    tags=("storage", "scan"),
)
def storage_iceberg_partition_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root, _, _ = _iceberg_fixture(spark, sf_dir)
    IC.publish_partition_statistics(root)
    return IC.read_partition_statistics(spark, root).select(
        "partition", "data_file_count", "record_count"
    )
