"""Hundred-forty-ninth wave: content-defined chunking dedup.

Fixed-size chunking breaks on INSERTION — one added word shifts every
later boundary and nothing dedups.  Content-defined chunking (CDC, the
rsync/ssdeep/storage-dedup trick) cuts where a ROLLING HASH hits a
pattern (h % 32 == 0), so boundaries re-synchronize right after any
edit and shared content keeps deduping.  This wave runs CDC over the
normalized documents with the registry's 8-char polynomial rolling
hash, fingerprints every chunk, and measures cross-document chunk
sharing — the byte-level dedup complement to the token-level span
dedup family.

  * dedup_cdc_chunks — per doc: chunk count, chunks shared with >= 1
    other doc, shared-character coverage, and the integer milli dedup
    ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import normalize_text
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MOD = 2147483647
_MASK = 32  # boundary when window hash % 32 == 0 → ~32-char chunks
_POLY = [623063367, 336663071, 168429323, 67503107, 16974593, 66049, 257, 1]

_HASH_SQL = " + ".join(
    f"codes[j + {i}] * {c}" for i, c in enumerate(_POLY)
)


@register(
    "dedup_cdc_chunks",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, {SQL_NORM.format(col='text')} AS s FROM documents
),
coded AS (
  SELECT doc_id, s, length(s) AS L,
         list_transform(range(1, length(s) + 1),
           i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT)) AS codes
  FROM norm
),
bounds AS (
  SELECT doc_id, s, L,
         CASE WHEN L < 8 THEN CAST([] AS BIGINT[])
              ELSE list_filter(range(1, L - 6),
                     j -> ({_HASH_SQL}) % {_MOD} % {_MASK} = 0)
         END AS raw_b
  FROM coded
),
cuts AS (
  SELECT doc_id, s, L,
         list_prepend(CAST(0 AS BIGINT),
           list_append(list_transform(raw_b, j -> j + 7), CAST(L AS BIGINT)))
           AS cpts
  FROM bounds
),
chunks AS (
  SELECT doc_id, L,
         unnest(list_filter(
           list_transform(range(1, len(cpts)),
             i -> CASE WHEN cpts[i + 1] > cpts[i]
                       THEN substr(s, CAST(cpts[i] + 1 AS INT),
                                   CAST(cpts[i + 1] - cpts[i] AS INT))
                  END),
           c -> c IS NOT NULL)) AS chunk
  FROM cuts
),
hashed AS (
  SELECT doc_id, L, md5(chunk) AS ch, length(chunk) AS clen FROM chunks
),
shared AS (
  SELECT ch FROM hashed GROUP BY ch HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT h.doc_id,
         MAX(h.L) AS total_chars,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN s.ch IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared,
         CAST(SUM(CASE WHEN s.ch IS NOT NULL THEN h.clen ELSE 0 END)
              AS BIGINT) AS shared_chars
  FROM hashed h LEFT JOIN shared s ON s.ch = h.ch
  GROUP BY h.doc_id
)
SELECT doc_id,
       CAST(total_chars AS BIGINT) AS total_chars,
       n_chunks, n_shared, shared_chars,
       CASE WHEN total_chars > 0
            THEN (1000 * shared_chars) // total_chars ELSE 0 END
         AS dedup_ratio_milli
FROM per_doc
ORDER BY doc_id
""",
    description="Content-defined chunking dedup (the rsync/storage-dedup "
    "primitive): the 8-char polynomial rolling hash cuts a chunk boundary "
    f"wherever h % {_MASK} == 0 — boundaries re-synchronize after any "
    "insertion, so edited near-duplicates keep sharing chunks where "
    "fixed-width chunking loses everything downstream of the edit. "
    "Chunks are md5-fingerprinted, shared = appearing in >= 2 documents, "
    "and each doc reports chunk counts, shared-character coverage and "
    "the integer milli dedup ratio. All integer/hash arithmetic, oracle-"
    "replayed boundary for boundary. Scale: chunking is a per-row "
    "expression; the only corpus-wide shuffle carries (16-byte chunk "
    "hash, doc_id) — the dedup-storage index shape.",
    tags=("dedup", "text", "llm"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    poly = _POLY

    # spread: the rolling-hash boundary scan is the suite's heaviest
    # per-row expression chain — serialized to ONE task by a single-row-
    # group parquet fixture without it (7.3 s -> parallel at sf0.1)
    docs = spread(t(spark, sf_dir, "documents")).select(
        "doc_id", normalize_text(F.col("text")).alias("s")
    )
    coded = docs.select(
        "doc_id",
        "s",
        F.length("s").alias("L"),
        F.transform(
            F.sequence(F.lit(1), F.length("s")),
            lambda i: F.ascii(F.col("s").substr(i, F.lit(1))).cast("bigint"),
        ).alias("codes"),
    )

    def whash(j):
        expr = None
        for i, c in enumerate(poly):
            term = F.element_at("codes", (j + i).cast("int")) * c
            expr = term if expr is None else expr + term
        return expr % _MOD

    bounds = coded.select(
        "doc_id",
        "s",
        "L",
        F.when(
            F.col("L") < 8, F.array().cast("array<bigint>")
        )
        .otherwise(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.col("L") - 7, F.lit(1))),
                lambda j: whash(j) % _MASK == 0,
            ).cast("array<bigint>")
        )
        .alias("raw_b"),
    )
    cuts = bounds.select(
        "doc_id",
        "s",
        "L",
        F.concat(
            F.array(F.lit(0).cast("bigint")),
            F.transform("raw_b", lambda j: j + 7),
            F.array(F.col("L").cast("bigint")),
        ).alias("cpts"),
    )
    chunks = cuts.select(
        "doc_id",
        "L",
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.size("cpts") - 1),
                    lambda i: F.when(
                        F.element_at("cpts", (i + 1).cast("int"))
                        > F.element_at("cpts", i.cast("int")),
                        F.col("s").substr(
                            (
                                F.element_at("cpts", i.cast("int")) + 1
                            ).cast("int"),
                            (
                                F.element_at("cpts", (i + 1).cast("int"))
                                - F.element_at("cpts", i.cast("int"))
                            ).cast("int"),
                        ),
                    ),
                ),
                lambda c: c.isNotNull(),
            )
        ).alias("chunk"),
    )
    hashed = chunks.select(
        "doc_id", "L", F.md5("chunk").alias("ch"), F.length("chunk").alias("clen")
    )
    shared = (
        hashed.groupBy("ch")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("ch", F.lit(1).alias("is_shared"))
    )
    per_doc = (
        hashed.join(shared, "ch", "left")
        .groupBy("doc_id")
        .agg(
            F.max("L").cast("bigint").alias("total_chars"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.coalesce("is_shared", F.lit(0))).cast("bigint").alias(
                "n_shared"
            ),
            F.sum(
                F.when(F.col("is_shared").isNotNull(), F.col("clen")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("shared_chars"),
        )
    )
    return per_doc.select(
        "doc_id",
        "total_chars",
        "n_chunks",
        "n_shared",
        "shared_chars",
        F.when(
            F.col("total_chars") > 0,
            F.expr("CAST((1000 * shared_chars) div total_chars AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("dedup_ratio_milli"),
    )
