"""Hundred-thirtieth wave: crypto-shredding (GDPR erasure at scale).

Deleting a user from 100 TB of immutable parquet is a rewrite of every
file that mentions them — unless the data was encrypted per-subject and
"erasure" is just deleting the subject's KEY (crypto-shredding, the
standard right-to-be-forgotten design for append-only lakes).  This
wave implements the full cycle as pure engine expressions:

  * encrypt: text → hex, XOR'd 4-byte-chunk-wise against a keystream
    derived as md5(subject_key || chunk_no) — deterministic, so the
    oracle replays byte-for-byte;
  * shred: the key table row for source='web' is deleted;
  * read path: subjects with a live key decrypt to the original text
    (round-trip md5-certified); shredded subjects yield ciphertext
    only — provably unreadable without any data-file rewrite.

  pipeline_crypto_shred — per doc: erased flag, recovered-text md5
  (ciphertext md5 for shredded rows), and a round-trip flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SHRED = "src7"  # the subject whose key is deleted


@register(
    "pipeline_crypto_shred",
    oracle=f"""
WITH keys AS (
  SELECT source, md5('key-' || source) AS subject_key
  FROM (SELECT DISTINCT source FROM documents)
  WHERE source <> '{_SHRED}'
),
hx AS (
  SELECT doc_id, source, text,
         hex(encode(text)) AS h,
         (length(hex(encode(text))) + 7) // 8 AS n_chunks
  FROM documents
),
enc AS (
  SELECT doc_id, source, text, n_chunks,
         string_agg(
           printf('%08x',
             xor(CAST('0x' || substr(h || repeat('0', 8), (c.i - 1) * 8 + 1, 8)
                      AS BIGINT),
                 CAST('0x' || substr(md5('key-' || source || '-' || c.i), 1, 8)
                      AS BIGINT))),
           '' ORDER BY c.i) AS cipher
  FROM hx, LATERAL (SELECT unnest(range(1, n_chunks + 1)) AS i) c
  GROUP BY doc_id, source, text, n_chunks
),
dec AS (
  SELECT e.doc_id, e.source, e.text, e.n_chunks, e.cipher,
         k.subject_key IS NOT NULL AS has_key,
         CASE WHEN k.subject_key IS NOT NULL THEN (
           SELECT string_agg(
             printf('%08x',
               xor(CAST('0x' || substr(e.cipher, (j.i - 1) * 8 + 1, 8)
                        AS BIGINT),
                   CAST('0x' || substr(md5('key-' || e.source || '-' || j.i),
                                        1, 8) AS BIGINT))),
             '' ORDER BY j.i)
           FROM (SELECT unnest(range(1, e.n_chunks + 1)) AS i) j
         ) END AS rec_hex
  FROM enc e LEFT JOIN keys k ON k.source = e.source
)
SELECT doc_id,
       CAST(NOT has_key AS BOOLEAN) AS erased,
       CASE WHEN has_key
            THEN md5(substr(rec_hex, 1, length(hex(encode(text)))))
            ELSE md5(cipher) END AS recovered_md5,
       CAST(CASE WHEN has_key
                 THEN substr(rec_hex, 1, length(hex(encode(text))))
                      = lower(hex(encode(text)))
                 ELSE FALSE END AS BOOLEAN) AS roundtrip_ok
FROM dec
ORDER BY doc_id
""",
    description="Crypto-shredding — GDPR erasure without rewriting a "
    "single data file: every document's text is encrypted 4-byte-chunk-"
    "wise (hex form XOR a keystream md5(subject_key, chunk_no)); erasure "
    f"of subject '{_SHRED}' = deleting its row from the KEY table. Live "
    "subjects decrypt round-trip-exact (md5 + equality certified); "
    "shredded subjects' reads yield ciphertext only. The md5 keystream "
    "stands in for AES-CTR (same XOR-stream shape) so both engines "
    "replay the bytes exactly — Spark-side AES (aes_encrypt) has no "
    "DuckDB twin to certify against. Scale: encrypt/decrypt are pure "
    "per-row expressions (zero shuffles beyond the key-table broadcast); "
    "the key table is subjects-sized — THE point: the 100 TB payload is "
    "immutable, compliance touches kilobytes.",
    tags=("pipeline", "privacy", "storage"),
)
def pipeline_crypto_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread: two md5 keystream passes per doc are the suite's heaviest
    # scalar chain — don't let a one-row-group scan serialize them
    docs = spread(t(spark, sf_dir, "documents"))
    keys = (
        docs.select("source")
        .distinct()
        .filter(F.col("source") != _SHRED)
        .select(
            "source", F.md5(F.concat(F.lit("key-"), F.col("source"))).alias("subject_key")
        )
    )
    hx = docs.select(
        "doc_id",
        "source",
        "text",
        F.hex(F.encode("text", "utf-8")).alias("h"),
    ).select(
        "doc_id",
        "source",
        "text",
        "h",
        ((F.length("h") + 7) / 8).cast("int").alias("n_chunks"),
    )

    def chunk_arr(hex_col):
        # hex string -> array<bigint> of its 8-hex-char chunk values
        return F.transform(
            F.sequence(F.lit(1), F.col("n_chunks")),
            lambda i: F.conv(
                F.substring(
                    F.concat(hex_col, F.repeat(F.lit("0"), 8)),
                    (i - 1) * 8 + 1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
        )

    def xor_hex(chunks_col, ks_col):
        # zip payload chunks against the keystream, re-render as hex
        return F.array_join(
            F.zip_with(
                chunks_col,
                ks_col,
                lambda a, b: F.lpad(F.lower(F.hex(a.bitwiseXOR(b))), 8, "0"),
            ),
            "",
        )

    key_prefix = F.concat(F.lit("key-"), F.col("source"))
    # The md5 keystream is the expensive part — derive it ONCE per row as
    # an array column and XOR it against both the payload (encrypt) and
    # the cipher (decrypt). Because `__ks` is non-cheap and referenced
    # twice downstream, CollapseProject keeps the producing projection
    # separate, so the md5 pass runs once instead of once per direction.
    staged = hx.select(
        "doc_id",
        "source",
        "text",
        "n_chunks",
        F.length("h").alias("h_len"),
        chunk_arr(F.lower(F.col("h"))).alias("__pch"),
        F.transform(
            F.sequence(F.lit(1), F.col("n_chunks")),
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws("-", key_prefix, i)), 1, 8),
                16,
                10,
            ).cast("bigint"),
        ).alias("__ks"),
    )
    enc = staged.select(
        "doc_id",
        "source",
        "text",
        "n_chunks",
        "h_len",
        "__ks",
        xor_hex(F.col("__pch"), F.col("__ks")).alias("cipher"),
    )
    dec = enc.join(F.broadcast(keys), "source", "left").select(
        "doc_id",
        "text",
        "n_chunks",
        "cipher",
        "h_len",
        F.col("subject_key").isNotNull().alias("has_key"),
        F.when(
            F.col("subject_key").isNotNull(),
            xor_hex(chunk_arr(F.col("cipher")), F.col("__ks")),
        ).alias("rec_hex"),
    )
    orig_hex = F.lower(F.hex(F.encode("text", "utf-8")))
    rec_trim = F.col("rec_hex").substr(F.lit(1), F.col("h_len"))
    return dec.select(
        "doc_id",
        (~F.col("has_key")).alias("erased"),
        F.when(F.col("has_key"), F.md5(rec_trim))
        .otherwise(F.md5("cipher"))
        .alias("recovered_md5"),
        F.when(F.col("has_key"), rec_trim == orig_hex)
        .otherwise(F.lit(False))
        .alias("roundtrip_ok"),
    )
