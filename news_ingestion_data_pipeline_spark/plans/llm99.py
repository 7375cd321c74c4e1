"""Ninety-ninth wave: merge-on-read position deletes, column-level data
diff, and longest-streak mining.

  * storage_merge_on_read_deletes — the OTHER delete strategy: the
    registry's snapshot tables delete copy-on-write (rewrite the files);
    Iceberg/Delta deletion-vectors instead write a tiny (file, position)
    delete file and apply it AT READ TIME.  Emulated natively: base
    parquet files with deterministic row order, a position-delete file,
    and a scan that anti-joins on (_metadata.file_path,
    _metadata.row_index) — Spark's real file-position metadata columns,
    the exact mechanism position deletes need.  At 100 TB this is the
    difference between deleting 0.1% of rows by rewriting 100 TB and
    writing a few MB of positions.
  * pipeline_column_level_diff — the data-diff audit: given two table
    versions, per-COLUMN changed-cell counts over common keys plus
    added/removed row counts — one full-outer join, all comparisons
    map-side, unpivoted to a per-column report.
  * window_longest_streak — per-user longest consecutive run of the
    same event type (gaps-and-islands on the per-user sequence), the
    engagement-streak feature. Total (len DESC, type ASC) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm99")


@register(
    "storage_merge_on_read_deletes",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST((SELECT COUNT(*) FROM documents WHERE doc_id % 7 = 3) AS BIGINT)
         AS n_deleted
FROM documents
WHERE doc_id % 7 <> 3
GROUP BY lang
ORDER BY lang
""",
    description="Merge-on-read position deletes (the deletion-vector "
    "strategy, vs the snapshot tables' copy-on-write): the corpus is "
    "laid out as 4 id-ordered base files; a position-delete file "
    "stores only (file_name, row_position) pairs for the victims "
    "(doc_id % 7 = 3), WITHOUT touching the base files; the scan "
    "applies them by anti-joining Spark's real file-position metadata "
    "(_metadata.file_path, _metadata.row_index) against the delete "
    "file. The oracle pins the surviving per-lang fingerprints AND the "
    "delete count, so a position mapping that was off by one row or "
    "one file hash-fails. At 100 TB deleting 0.1% of rows costs a "
    "few MB of positions plus a broadcast anti-join at read time — "
    "not a table rewrite; compaction later folds the deletes in.",
    tags=("storage", "pipeline", "scan"),
)
def storage_merge_on_read_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import hashlib
    import os
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"{_ROOT}/mor_base_{sfx}"
    dels = f"{_ROOT}/mor_dels_{sfx}"
    for p in (base, dels):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(base)

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    # 4 id-ordered base files (deterministic row positions: sorted write)
    for k in range(4):
        tmp = f"{base}/_tmp{k}"
        docs.filter(F.col("doc_id") % 4 == k).orderBy("doc_id").coalesce(
            1
        ).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{base}/{k:02d}.parquet")
        shutil.rmtree(tmp)

    # position-delete file: (file_name, pos) of rows with doc_id % 7 = 3,
    # positions derived from the SAME layout rule (rank within residue
    # class by doc_id) — never from re-reading the data
    w = Window.partitionBy(F.col("doc_id") % 4).orderBy("doc_id")
    (
        docs.withColumn("pos", F.row_number().over(w) - 1)
        .filter(F.col("doc_id") % 7 == 3)
        .select(
            F.format_string("%02d.parquet", (F.col("doc_id") % 4).cast("int"))
            .alias("file_name"),
            F.col("pos").cast("bigint").alias("pos"),
        )
        .write.parquet(dels)
    )

    scanned = spark.read.parquet(base).select(
        "doc_id",
        "lang",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "file_name"
        ),
        F.col("_metadata.row_index").alias("pos"),
    )
    delete_df = spark.read.parquet(dels)
    n_deleted = delete_df.count()
    live = scanned.join(
        F.broadcast(delete_df), ["file_name", "pos"], "left_anti"
    )
    return (
        live.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .withColumn("n_deleted", F.lit(n_deleted).cast("bigint"))
        
    )


@register(
    "pipeline_column_level_diff",
    oracle="""
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang,
         CASE WHEN doc_id % 13 = 0 THEN n_chars + 10 ELSE n_chars END
           AS n_chars,
         source
  FROM documents WHERE doc_id % 17 <> 5
), common AS (
  SELECT a.lang AS l1, b.lang AS l2, a.n_chars AS c1, b.n_chars AS c2,
         a.source AS s1, b.source AS s2
  FROM documents a JOIN v2 b USING (doc_id)
), counts AS (
  SELECT
    SUM(CASE WHEN l1 IS DISTINCT FROM l2 THEN 1 ELSE 0 END) AS lang_chg,
    SUM(CASE WHEN c1 IS DISTINCT FROM c2 THEN 1 ELSE 0 END) AS chars_chg,
    SUM(CASE WHEN s1 IS DISTINCT FROM s2 THEN 1 ELSE 0 END) AS src_chg,
    COUNT(*) AS n_common
  FROM common
), removed AS (
  SELECT COUNT(*) AS n FROM documents
  WHERE doc_id NOT IN (SELECT doc_id FROM v2)
)
SELECT col, CAST(n_changed AS BIGINT) AS n_changed,
       CAST((SELECT n_common FROM counts) AS BIGINT) AS n_common_rows,
       CAST((SELECT n FROM removed) AS BIGINT) AS n_removed_rows,
       CAST(0 AS BIGINT) AS n_added_rows
FROM (
  SELECT 'lang' AS col, lang_chg AS n_changed FROM counts
  UNION ALL SELECT 'n_chars', chars_chg FROM counts
  UNION ALL SELECT 'source', src_chg FROM counts
)
ORDER BY col
""",
    description="Column-level data diff — the audit a data-diff tool "
    "produces between two table versions (here v2 = documents with "
    "lang rewritten for id%11=0, n_chars shifted for id%13=0, and "
    "id%17=5 rows deleted): per COLUMN, the changed-cell count over "
    "common keys (null-safe IS DISTINCT FROM semantics), plus "
    "common/removed/added row counts on every row for context. One "
    "full-outer-join-shaped pass (expressed as inner + anti "
    "aggregates); every comparison is a map-side expression and the "
    "per-column report is a 3-row unpivot of ONE aggregate row — at "
    "100 TB the diff costs one co-partitioned join, not one pass per "
    "column.",
    tags=("pipeline", "scan"),
)
def pipeline_column_level_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    v2 = d.filter(F.col("doc_id") % 17 != 5).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, "xx")
        .otherwise(F.col("lang"))
        .alias("lang"),
        F.when(F.col("doc_id") % 13 == 0, F.col("n_chars") + 10)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
        "source",
    )
    joined = d.alias("a").join(v2.alias("b"), "doc_id", "full_outer")
    agg = joined.agg(
        F.sum(
            (
                ~F.col("a.lang").eqNullSafe(F.col("b.lang"))
                & F.col("a.doc_id").isNotNull()
                & F.col("b.doc_id").isNotNull()
            ).cast("bigint")
        ).alias("lang_chg"),
        F.sum(
            (
                ~F.col("a.n_chars").eqNullSafe(F.col("b.n_chars"))
                & F.col("a.doc_id").isNotNull()
                & F.col("b.doc_id").isNotNull()
            ).cast("bigint")
        ).alias("chars_chg"),
        F.sum(
            (
                ~F.col("a.source").eqNullSafe(F.col("b.source"))
                & F.col("a.doc_id").isNotNull()
                & F.col("b.doc_id").isNotNull()
            ).cast("bigint")
        ).alias("src_chg"),
        F.sum(
            (F.col("a.doc_id").isNotNull() & F.col("b.doc_id").isNotNull())
            .cast("bigint")
        ).alias("n_common"),
        F.sum(
            (F.col("a.doc_id").isNotNull() & F.col("b.doc_id").isNull())
            .cast("bigint")
        ).alias("n_removed"),
        F.sum(
            (F.col("a.doc_id").isNull() & F.col("b.doc_id").isNotNull())
            .cast("bigint")
        ).alias("n_added"),
    )
    unpivoted = agg.selectExpr(
        "stack(3, 'lang', lang_chg, 'n_chars', chars_chg,"
        " 'source', src_chg) AS (col, n_changed)",
        "n_common AS n_common_rows",
        "n_removed AS n_removed_rows",
        "n_added AS n_added_rows",
    )
    return unpivoted


@register(
    "window_longest_streak",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rnt
  FROM events
), runs AS (
  SELECT user_id, event_type, COUNT(*) AS run_len
  FROM seq GROUP BY user_id, event_type, rn - rnt
), best AS (
  SELECT user_id, event_type, run_len,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY run_len DESC, event_type) AS pick
  FROM runs
)
SELECT b.user_id,
       b.event_type AS streak_type,
       CAST(b.run_len AS BIGINT) AS streak_len,
       CAST(n.n AS BIGINT) AS n_events
FROM best b
JOIN (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id) n
  USING (user_id)
WHERE b.pick = 1
ORDER BY b.user_id
""",
    description="Longest same-type streak per user — the engagement-"
    "streak feature: gaps-and-islands over each user's (ts, event_id)-"
    "ordered sequence (rn - rn_by_type constant within a run), run "
    "lengths per island, then the per-user max under total (length "
    "DESC, type ASC) order. Two window passes over the SAME per-user "
    "sort plus hash aggregates — at 100 TB this parallelizes by user "
    "and no state crosses one user's rows.",
    tags=("window", "events"),
)
def window_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wut = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(wu) - F.row_number().over(wut)).alias("island"),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    best = runs.withColumn(
        "pick",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("run_len").desc(), "event_type"
            )
        ),
    ).filter(F.col("pick") == 1)
    totals = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        best.join(totals, "user_id")
        .select(
            "user_id",
            F.col("event_type").alias("streak_type"),
            F.col("run_len").cast("bigint").alias("streak_len"),
            F.col("n").cast("bigint").alias("n_events"),
        )
        
    )
