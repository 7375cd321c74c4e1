"""Hundred-seventy-first wave: Iceberg FORMAT V3 — deletion vectors in
Puffin files.

Format v3 replaces v2's positional-delete PARQUET files with DELETION
VECTORS: per-data-file roaring bitmaps stored as ``deletion-vector-v1``
blobs inside Puffin files, addressed straight from the delete manifest
entry (referenced_data_file + content_offset/content_size_in_bytes — no
footer read on the hot path). The bitmap body is the same 64-bit
RoaringBitmapArray serialization Delta uses, so the engine shares one
clean-room codec across both formats (operators/deltalog.py). This wave
commits a DV DELETE of the French rows against a v3 table and certifies
the resolved read; the v2 resolvers are simultaneously certified to
REFUSE the v3 table by format-version name instead of silently
resurrecting the deleted rows.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import iceberg as IB
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm171")


@register(
    "scan_iceberg_v3_dv",
    oracle="""
WITH kept AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE lang <> 'fr'
),
audit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dv_deleted
  FROM documents WHERE lang = 'fr'
)
SELECT kept.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS ids_md5,
       audit.n_dv_deleted
FROM kept CROSS JOIN audit
GROUP BY kept.lang, audit.n_dv_deleted
""",
    description="Iceberg FORMAT V3 deletion vectors: the French rows are "
    "deleted by committing ONE Puffin file holding their positional "
    "roaring bitmap (deletion-vector-v1 blob), referenced by a content=1 "
    "delete manifest — zero data files rewritten, kilobytes committed. "
    "read_iceberg_v3 decodes the bitmap driver-side (metadata-scale, "
    "bounded by DV cardinality) and applies it as one distributed "
    "anti-join on the scan's (file, row_index) identity. Per-lang counts "
    "+ a doc_id checksum certify exactly the DV positions vanished; the "
    "audit column carries the DV cardinality. The v2 resolvers refuse "
    "this table by format-version NAME (tests) — never silent "
    "resurrection. Codec shared with the Delta DV path "
    "(operators/deltalog.py roaring/z85).",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_v3_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_v3_{sfx}"
    docs = t(spark, sf_dir, "documents")
    s1, s2 = IB.write_iceberg_v3_dv_fixture(spark, docs, root)
    # audit: the DV's recorded cardinality, straight from the Puffin
    # footer descriptor (metadata-scale)
    foot = IB._puffin_footer(f"{root}/data/dv-1.puffin")
    n_dv = int(foot["blobs"][0]["properties"]["cardinality"])
    back = IB.read_iceberg_v3(spark, root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            )
        ).alias("ids_md5"),
        F.lit(n_dv).cast("bigint").alias("n_dv_deleted"),
    )


@register(
    "pipeline_iceberg_dv_delete",
    oracle="""
WITH kept AS (
  SELECT doc_id, lang, n_chars FROM documents
  WHERE lang <> 'fr' AND n_chars >= 300
),
audit AS (
  SELECT CAST(COUNT(*) FILTER (WHERE lang <> 'fr' AND n_chars < 300)
              AS BIGINT) AS n_second_delete
  FROM documents
)
SELECT kept.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS ids_md5,
       audit.n_second_delete
FROM kept CROSS JOIN audit
GROUP BY kept.lang, audit.n_second_delete
""",
    description="Iceberg v3 DV WRITE path, chained: the fixture's DV "
    "kills the French rows, then append_dv_delete commits a SECOND "
    "deletion-vector snapshot for the short (< 300 chars) survivors — "
    "each data file ends with ONE superseding Puffin bitmap holding the "
    "union of its deleted positions (the spec's one-DV-per-data-file "
    "rule), zero data files rewritten across both deletes, positions "
    "computed over LIVE rows only (the already-DV-deleted fr rows are "
    "never re-recorded — certified by the audit column). The open-v3 "
    "twin of the Delta delete_where_with_dv path, sharing its roaring "
    "codec.",
    tags=("scan", "storage", "pipeline"),
)
def pipeline_iceberg_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_dvw_{sfx}"
    docs = t(spark, sf_dir, "documents")
    IB.write_iceberg_v3_dv_fixture(spark, docs, root)
    _, n_second = IB.append_dv_delete(spark, root, F.col("n_chars") < 300)
    back = IB.read_iceberg_v3(spark, root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            )
        ).alias("ids_md5"),
        F.lit(n_second).cast("bigint").alias("n_second_delete"),
    )


@register(
    "scan_iceberg_v3_row_lineage",
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
    description="Iceberg v3 ROW LINEAGE: every row carries a durable "
    "_row_id = its data file's first_row_id (manifest metadata, "
    "assigned from the table's next-row-id counter at commit) plus its "
    "row position — snapshot 1 adds the even doc_ids at row-id 0.., "
    "snapshot 2 fast-appends the odds starting at next-row-id. The id "
    "materializes map-side from the scan's row_index against a "
    "broadcast file->first_row_id map (manifest-scale) — no shuffle, "
    "no user key, the identity CDC/audit joins need at 100 TB. Oracle "
    "replays the assignment as per-batch ROW_NUMBERs in doc_id order.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_v3_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_v3_lineage_{sfx}"
    docs = t(spark, sf_dir, "documents")
    IB.write_iceberg_v3_lineage_fixture(spark, docs, root)
    return IB.read_iceberg_v3_lineage(spark, root).select(
        "doc_id", "lang", F.col("n_chars").cast("long"), F.col("_row_id")
    )


@register(
    "scan_iceberg_branch_tag",
    oracle="""
WITH v0 AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h FROM documents
),
live AS (
  SELECT doc_id, lang, n_chars, md5(text) AS content_h
  FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang, n_chars, md5(text)
  FROM documents WHERE lang = 'fr' AND n_chars >= 600
),
a0 AS (
  SELECT 'audit-v0' AS ref, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5
  FROM v0 GROUP BY lang
),
a1 AS (
  SELECT 'main' AS ref, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         md5(string_agg(content_h, '' ORDER BY doc_id)) AS content_md5
  FROM live GROUP BY lang
)
SELECT * FROM a0 UNION ALL SELECT * FROM a1
""",
    description="Iceberg REFS — time travel by NAME: the append "
    "snapshot is pinned under the tag 'audit-v0' (pure-metadata "
    "set_ref commit), the movable 'main' branch resolves to the "
    "current rewrite snapshot, and both read side by side through "
    "read_iceberg_ref. Tagged snapshots are EXPIRY-PINNED: "
    "expire_snapshots(keep_last=1) retains the tagged snapshot's files "
    "(asserted in-plan — the audit read still works after expiry), the "
    "spec's ref-aware retention and the metadata half of the "
    "write-audit-publish pattern.",
    tags=("scan", "storage", "pipeline"),
)
def scan_iceberg_branch_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_refs_{sfx}"
    docs = t(spark, sf_dir, "documents")
    s1, s2 = IB.write_iceberg_fixture(spark, docs, root)
    IB.set_ref(root, "audit-v0", s1, ref_type="tag")
    # tagged snapshots survive expiry: keep_last=1 would retain only the
    # current snapshot, but the tag pins s1's files too
    IB.expire_snapshots(root, keep_last=1)
    assert IB.resolve_ref(root, "audit-v0") == s1

    def _agg(df: DataFrame, ref: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
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
        ).select(F.lit(ref).alias("ref"), "*")

    tagged = _agg(IB.read_iceberg_ref(spark, root, "audit-v0"), "audit-v0")
    main = _agg(IB.read_iceberg_ref(spark, root, "main"), "main")
    return tagged.unionByName(main)


@register(
    "pipeline_iceberg_pos_to_dv",
    oracle="""
WITH live AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE lang <> 'fr'
  UNION ALL
  SELECT doc_id, lang, n_chars FROM documents
  WHERE lang = 'fr' AND n_chars >= 600
),
kept AS (SELECT * FROM live WHERE doc_id % 5 <> 0),
audit AS (
  SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 5 = 0) AS BIGINT)
           AS n_converted_positions
  FROM live
)
SELECT kept.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
         AS ids_md5,
       audit.n_converted_positions
FROM kept CROSS JOIN audit
GROUP BY kept.lang, audit.n_converted_positions
""",
    description="Iceberg maintenance: REWRITE POSITIONAL DELETES TO "
    "DELETION VECTORS — the v2->v3 migration path. A v2 positional "
    "DELETE (doc_id % 5 = 0 over the live rows) lands as a "
    "(file_path, pos) parquet delete file; the rewrite action folds "
    "every position into one roaring bitmap per data file inside a "
    "single Puffin file, drops the delete manifests, re-references the "
    "data manifests untouched, and bumps format-version to 3 — zero "
    "data files rewritten, and v2 resolvers now correctly REFUSE the "
    "table while read_iceberg_v3 serves the identical answer (the "
    "oracle certifies content equality with the pre-migration v2 "
    "resolution).",
    tags=("scan", "storage", "pipeline"),
)
def pipeline_iceberg_pos_to_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{_ROOT}/iceberg_pos2dv_{sfx}"
    docs = t(spark, sf_dir, "documents")
    IB.write_iceberg_fixture(spark, docs, root)
    _, n_del = IB.append_positional_delete(
        spark, root, F.col("doc_id") % 5 == 0
    )
    _, n_files, n_pos = IB.rewrite_position_deletes_to_dvs(spark, root)
    assert n_pos == n_del, "conversion lost positions"
    back = IB.read_iceberg_v3(spark, root)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            )
        ).alias("ids_md5"),
        F.lit(n_pos).cast("bigint").alias("n_converted_positions"),
    )
