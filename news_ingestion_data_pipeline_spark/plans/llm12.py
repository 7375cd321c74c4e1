"""Twelfth wave: corpus novelty measurement, VWAP rollups, and the
binaryFile ingestion source (multimodal ingest from real files on
disk) — each with a DuckDB oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.llm import _SQL_SHINGLES
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root


@register(
    "text_novelty_ratio",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, {SQL_NORM.format(col='text')} AS s FROM documents
), sh AS (
  SELECT doc_id, unnest({_SQL_SHINGLES.format(s='s')}) AS h FROM norm
), first_seen AS (
  SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h
)
SELECT sh.doc_id,
       COUNT(*) AS n_shingles,
       CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS novelty
FROM sh JOIN first_seen f ON sh.h = f.h
GROUP BY sh.doc_id
ORDER BY sh.doc_id
""",
    description="Corpus novelty ratio — the diversity meter a "
    "training-data curator watches while ingesting: per document, the "
    "share of its 5-gram shingles whose FIRST corpus occurrence (min "
    "doc_id, the deterministic stand-in for arrival order) is this "
    "document. Near-zero novelty = the document is assembled from "
    "already-seen text (boilerplate, quotes, dups) even when no single "
    "source passes a pairwise dedup threshold — the aggregate complement "
    "of the pairwise minhash/containment family, computed WITHOUT any "
    "pairwise join: one shingle explode, one min-aggregate (the "
    "first-occurrence index), one map-side join back. Linear in corpus "
    "size, same shingle hashing as every other dedup op.",
    tags=("llm", "text", "dedup"),
)
def text_novelty_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX
    from news_ingestion_data_pipeline_spark.tables import spread

    hashed = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    sh = (
        spread(t(spark, sf_dir, "documents"))
        .select("doc_id", F.explode(hashed).alias("h"))
        .localCheckpoint()  # two consumers (first-seen index + join back)
    )
    first_seen = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    joined = sh.join(first_seen, "h")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") * 1.0 / F.col("n_shingles"), 6).alias(
                "novelty"
            ),
        )
        
    )


@register(
    "lineitem_vwap_weekly",
    oracle="""
SELECT strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
            AS DOUBLE) AS total_qty,
       round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE)
             / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                    AS DOUBLE), 6) AS vwap
FROM lineitem
GROUP BY date_trunc('week', l_shipdate)
ORDER BY week
""",
    description="Volume-weighted average price per ISO week — the "
    "canonical finance/commerce rollup: sum(price x qty)/sum(qty) from "
    "exact DECIMAL power sums (the engine's money-sum contract), one "
    "IEEE division at the end, so the weekly VWAP is partition-order "
    "deterministic. Both engines truncate to the same ISO Monday. One "
    "map-side-partial aggregate keyed on the truncated week — the "
    "always-on dashboard query shape.",
    tags=("agg", "timeseries"),
)
def lineitem_vwap_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(18,2)"
    pq_sum = F.sum(
        F.col("l_extendedprice").cast(dec) * F.col("l_quantity").cast(dec)
    ).cast("double")
    q_sum = F.sum(F.col("l_quantity").cast(dec)).cast("double")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("week", "l_shipdate").alias("wk"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            q_sum.alias("total_qty"),
            F.round(pq_sum / q_sum, 6).alias("vwap"),
        )
        .select(
            F.date_format("wk", "yyyy-MM-dd").alias("week"),
            "n_items",
            "total_qty",
            "vwap",
        )
        
    )


@register(
    "scan_binary_files_media",
    oracle=OSQL.multimodal_image_features_oracle().replace(
        "FROM documents\n)", "FROM documents WHERE doc_id < 50\n)"
    ),
    description="Multimodal ingest from REAL files on disk: BMP images "
    "are written out as individual .bmp files and read back through "
    "Spark's binaryFile source (path, length, content) — the production "
    "entry point for image/audio corpora, where media arrives as object-"
    "store blobs, not rows. media_id is recovered from the file path "
    "(regexp_extract), the binary column feeds the same pure-numpy real "
    "decoder, and the features hash-match the closed-form codec-replay "
    "oracle — certifying the whole file->binary-column->decode->feature "
    "chain. At 100 TB this source partitions by file with predicate "
    "pushdown on path/length; decode parallelism = file count.",
    tags=("scan", "multimodal", "storage"),
)
def scan_binary_files_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    import numpy as np

    from news_ingestion_data_pipeline_spark.operators import codecs
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    outdir = (
        scratch_root("llm12") + "/bmp_files_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    shutil.rmtree(outdir, ignore_errors=True)
    os.makedirs(outdir, exist_ok=True)
    ids = [
        r["doc_id"]
        # driver-ok: ≤50 fixture doc ids (doc_id < 50 filter)
        for r in t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id")
        .collect()
    ]
    for did in ids:
        h, w = mm._real_image_dims(did)
        img = mm._real_image(did, w, h)
        with open(os.path.join(outdir, f"doc_{did:06d}.bmp"), "wb") as f:
            f.write(codecs.encode_bmp(np.asarray(img)))

    files = spark.read.format("binaryFile").load(outdir)
    media = files.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bmp", 1)
        .cast("long")
        .alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
        F.expr(
            "named_struct('width', CAST(NULL AS INT), 'height', "
            "CAST(NULL AS INT), 'channels', CAST(NULL AS INT), "
            "'sample_rate', CAST(NULL AS INT), 'duration_ms', "
            "CAST(NULL AS INT), 'codec', 'bmp')"
        ).alias("meta"),
    ).repartition(8, "media_id")
    return mm.extract_image_features(media, decoder="real")
