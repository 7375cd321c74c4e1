"""Hundred-twenty-second wave: binary sign-quantized ANN and per-doc
drop provenance.

  * sim_binary_sign_topk — the most aggressive embedding compression
    that still retrieves: sign-quantize the 64-d vector into ONE
    BIGINT (bit i = v_i > 0), rank neighbors by popcount Hamming
    distance.  256 bytes → 8 bytes per vector, distance = one XOR +
    one bit_count — the memory/bandwidth trick binary-embedding
    retrieval systems ship.  Exact integer arithmetic end to end.
  * curation_drop_provenance — the lineage answer to "WHY was this
    document dropped": every doc gets its first-failing gate (empty →
    too-short → junk-ratio → exact-duplicate → kept), so corpus drops
    are auditable per row, not just counted per stage
    (curation_filter_funnel is the aggregate sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.functions.text import token_count
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_K = 5
_NQ = 10


@register(
    "sim_binary_sign_topk",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sig AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(1, 65),
           i -> CASE WHEN v[i] > 0 THEN [1::BIGINT, 2::BIGINT, 4::BIGINT, 8::BIGINT, 16::BIGINT, 32::BIGINT, 64::BIGINT, 128::BIGINT, 256::BIGINT, 512::BIGINT, 1024::BIGINT, 2048::BIGINT, 4096::BIGINT, 8192::BIGINT, 16384::BIGINT, 32768::BIGINT, 65536::BIGINT, 131072::BIGINT, 262144::BIGINT, 524288::BIGINT, 1048576::BIGINT, 2097152::BIGINT, 4194304::BIGINT, 8388608::BIGINT, 16777216::BIGINT, 33554432::BIGINT, 67108864::BIGINT, 134217728::BIGINT, 268435456::BIGINT, 536870912::BIGINT, 1073741824::BIGINT, 2147483648::BIGINT, 4294967296::BIGINT, 8589934592::BIGINT, 17179869184::BIGINT, 34359738368::BIGINT, 68719476736::BIGINT, 137438953472::BIGINT, 274877906944::BIGINT, 549755813888::BIGINT, 1099511627776::BIGINT, 2199023255552::BIGINT, 4398046511104::BIGINT, 8796093022208::BIGINT, 17592186044416::BIGINT, 35184372088832::BIGINT, 70368744177664::BIGINT, 140737488355328::BIGINT, 281474976710656::BIGINT, 562949953421312::BIGINT, 1125899906842624::BIGINT, 2251799813685248::BIGINT, 4503599627370496::BIGINT, 9007199254740992::BIGINT, 18014398509481984::BIGINT, 36028797018963968::BIGINT, 72057594037927936::BIGINT, 144115188075855872::BIGINT, 288230376151711744::BIGINT, 576460752303423488::BIGINT, 1152921504606846976::BIGINT, 2305843009213693952::BIGINT, 4611686018427387904::BIGINT, (-9223372036854775807::BIGINT - 1)][i]
                     ELSE 0::BIGINT END)) AS BIGINT) AS s
  FROM e
),
q AS (SELECT vec_id AS qid, s AS qs FROM sig WHERE vec_id < {_NQ}),
d AS (
  SELECT q.qid, sig.vec_id AS nid,
         bit_count(xor(q.qs, sig.s)) AS hamming
  FROM q JOIN sig ON sig.vec_id <> q.qid
),
ranked AS (
  SELECT qid, nid, hamming,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hamming, nid) AS rn
  FROM d
)
SELECT qid, CAST(rn AS BIGINT) AS rank,
       nid, CAST(hamming AS BIGINT) AS hamming
FROM ranked WHERE rn <= {_K}
ORDER BY qid, rank
""",
    description="Binary sign-quantized retrieval: each 64-d embedding "
    "collapses to ONE BIGINT signature (bit i = dimension i positive), "
    "neighbors ranked by popcount Hamming distance — XOR + bit_count per "
    "comparison, the 32x memory compression binary-embedding systems "
    "deploy when the float vectors no longer fit the serving tier. "
    "Distances are exact integers with total (distance, id) tie order, "
    "so every of the 10 queries' top-5 is oracle-certified. Scale shape: "
    "signatures build in one map pass; the scan is a broadcast of 10 "
    "8-byte keys against the signature column — at 100 TB this is the "
    "first-stage filter before exact float re-ranking "
    "(sim_cosine_topk is the re-rank sibling).",
    tags=("similarity",),
)
def sim_binary_sign_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # bit i's value as a literal table (bit 63 = signed min-long, the
    # two's-complement sign bit — shiftleft needs a Python-int amount, a
    # Column won't do)
    pows = F.array(
        *[F.lit(1 << k).cast("bigint") for k in range(63)],
        F.lit(-(1 << 63)).cast("bigint"),
    )
    sig = e.select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(64)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.when(
                F.element_at("v", i.cast("int")) > 0,
                F.element_at(pows, i.cast("int")),
            ).otherwise(F.lit(0).cast("bigint")),
        ).alias("s"),
    ).localCheckpoint()  # probed by both the query and corpus sides
    q = sig.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("s").alias("qs")
    )
    d = (
        F.broadcast(q)
        .crossJoin(sig)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.bit_count(
                F.col("qs").bitwiseXOR(F.col("s"))
            ).cast("bigint").alias("hamming"),
        )
    )
    w = Window.partitionBy("qid").orderBy("hamming", "nid")
    return (
        d.select(
            "qid",
            F.row_number().over(w).cast("bigint").alias("rank"),
            "nid",
            "hamming",
        )
        .filter(F.col("rank") <= _K)
        
    )


_MIN_TOKENS = 10
_MAX_DIGIT_RATIO = 0.3


@register(
    "curation_drop_provenance",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         {SQL_NORM.format(col='text')} AS norm,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              _t -> _t <> '')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           / GREATEST(length(text), 1) AS digit_ratio
  FROM documents
),
dup AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
  FROM base
)
SELECT b.doc_id,
       CASE WHEN b.norm = '' THEN 'empty'
            WHEN b.n_tokens < {_MIN_TOKENS} THEN 'too_short'
            WHEN b.digit_ratio > {_MAX_DIGIT_RATIO} THEN 'junk_digits'
            WHEN d.rn > 1 THEN 'exact_duplicate'
            ELSE 'kept' END AS verdict,
       b.n_tokens
FROM base b JOIN dup d USING (doc_id)
ORDER BY doc_id
""",
    description="Per-document drop provenance: every doc is labeled with "
    "its FIRST failing curation gate (empty → too-short → junk digit "
    "ratio → exact duplicate → kept), so a corpus audit can answer 'why "
    "is doc X missing' row-by-row instead of stage-by-stage "
    "(curation_filter_funnel keeps the aggregate view; this is its "
    "lineage inverse). Gate order is pinned — a doc failing several "
    "gates reports the earliest, matching how a short-circuit filter "
    "chain actually executes. One normalization pass feeds all gates "
    "plus the min-id duplicate window; nothing is scanned twice.",
    tags=("curation", "quality"),
)
def curation_drop_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions.text import (
        normalize_text,
    )

    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm"),
        token_count(F.col("text")).alias("n_tokens"),
        (
            F.size(F.expr("regexp_extract_all(text, '[0-9]', 0)")).cast(
                "double"
            )
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("digit_ratio"),
    )
    dup = base.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy(F.md5("norm")).orderBy("doc_id"))
        .alias("rn"),
    )
    return (
        base.join(dup, "doc_id")
        .select(
            "doc_id",
            F.when(F.col("norm") == "", "empty")
            .when(F.col("n_tokens") < _MIN_TOKENS, "too_short")
            .when(F.col("digit_ratio") > _MAX_DIGIT_RATIO, "junk_digits")
            .when(F.col("rn") > 1, "exact_duplicate")
            .otherwise("kept")
            .alias("verdict"),
            "n_tokens",
        )
        
    )
