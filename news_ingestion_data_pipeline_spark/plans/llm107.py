"""Hundred-seventh wave: chunked-blob reassembly and curriculum shards.

  * multimodal_chunked_blob_reassembly — the >row-size-limit blob
    shape: a payload too big for one row ships as (blob_id, chunk_no,
    bytes) rows; the reader reassembles per blob (sorted binary
    concat) and verifies the md5 against the manifest hash.  Here the
    chunks are cut from the documents' UTF-8 payloads (16 bytes each)
    so the oracle recomputes every hash closed-form; the mechanism —
    chunk rows, ordered concat, end-to-end checksum — is exactly how
    multi-GB media objects move through a row-oriented pipeline.
  * curation_curriculum_shards — curriculum training order: rank the
    corpus by difficulty (length as the proxy) with the two-pass
    distributed ranking helper (operators/ranking.py — never a global
    sort) and cut exact ANSI NTILE shards; per-shard difficulty stats
    must step monotonically, which the oracle's window-ntile
    construction pins bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_CHUNK = 16


@register(
    "multimodal_chunked_blob_reassembly",
    oracle=f"""
WITH blobs AS (
  SELECT doc_id, text, encode(text) AS payload FROM documents
), chunks AS (
  SELECT doc_id,
         CAST(ceil(octet_length(payload) * 1.0 / {_CHUNK}) AS BIGINT)
           AS n_chunks,
         octet_length(payload) AS n_bytes,
         md5(text) AS blob_md5
  FROM blobs
)
SELECT doc_id,
       n_chunks,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       blob_md5 AS reassembled_md5,
       TRUE AS checksum_ok
FROM chunks
ORDER BY doc_id
""",
    description="Chunked-blob reassembly — how objects bigger than a "
    "row limit move through a row-oriented pipeline: each document's "
    "UTF-8 payload is SPLIT into 16-byte (blob_id, chunk_no, bytes) "
    "rows, then reassembled per blob by sorted binary concatenation "
    "(collect the chunk structs, array_sort on chunk_no, fold-concat "
    "the bytes — all JVM HOFs) and checksummed end to end: the md5 of "
    "the reassembled bytes must equal the manifest md5 computed "
    "BEFORE chunking, and the oracle recomputes both closed-form. A "
    "dropped, duplicated, or reordered chunk fails the hash. At "
    "100 TB chunk rows shuffle by blob_id only when reassembly is "
    "actually demanded; the checksum rides along for free.",
    tags=("multimodal", "storage", "llm"),
)
def multimodal_chunked_blob_reassembly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    n_chunks = F.ceil(F.octet_length("payload") / F.lit(_CHUNK)).cast(
        "bigint"
    )
    chunked = d.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("manifest_md5"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.col("payload").substr(
                    (i * _CHUNK + 1).cast("int"), F.lit(_CHUNK)
                ),
            )
        ).alias("chunk_no", "bytes"),
    )
    reassembled = (
        chunked.groupBy("doc_id", "n_bytes", "manifest_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_no", "bytes"))
                    ),
                    lambda s: s["bytes"],
                ),
                F.lit(b""),
                lambda acc, x: F.concat(acc, x),
            ).alias("blob"),
        )
    )
    return reassembled.select(
        "doc_id",
        "n_chunks",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        F.md5("blob").alias("reassembled_md5"),
        (F.md5("blob") == F.col("manifest_md5")).alias("checksum_ok"),
    )


@register(
    "curation_curriculum_shards",
    oracle="""
WITH ranked AS (
  SELECT doc_id, n_chars,
         NTILE(8) OVER (ORDER BY n_chars, doc_id) AS shard
  FROM documents
)
SELECT CAST(shard AS INT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_difficulty,
       CAST(MAX(n_chars) AS BIGINT) AS max_difficulty,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM ranked
GROUP BY shard
ORDER BY shard
""",
    description="Curriculum training shards — easy-to-hard data "
    "ordering: rank the corpus by difficulty proxy (n_chars, doc_id "
    "tiebreak) using the two-pass distributed ranking helper "
    "(operators/ranking.py: per-bucket local rank + broadcast prefix "
    "offsets — never a single-partition sort) and cut exact ANSI "
    "NTILE(8) shards arithmetically from (global rank, total count). "
    "Per-shard difficulty ranges must tile monotonically — shard k's "
    "max <= shard k+1's min — which the oracle's window-NTILE pins "
    "bit-identically. The curriculum loader then feeds shards in "
    "order; at 100 TB the ranking is the proven two-pass shape and "
    "sharding is pure arithmetic.",
    tags=("curation", "llm", "sampling"),
)
def curation_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import ranking as RK

    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    total = d.count()
    bucket = F.coalesce((F.col("n_chars") / 32).cast("bigint"), F.lit(-1))
    ranked = RK.distributed_row_number(
        d, [F.col("n_chars"), F.col("doc_id")], bucket, out="rn"
    )
    shard = RK.ntile_from_rank(F.col("rn"), F.lit(total), 8)
    return (
        ranked.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_difficulty"),
            F.max("n_chars").cast("bigint").alias("max_difficulty"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        
    )
