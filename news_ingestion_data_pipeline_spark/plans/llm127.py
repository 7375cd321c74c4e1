"""Hundred-twenty-seventh wave: T5-style span corruption.

Denoising LM training data (T5/UL2/BART) is built by masking random
SPANS of tokens, not independent tokens — and span starts must not
overlap running spans, which makes the masking decision SEQUENTIAL
(a position inside an active span cannot start a new one).  RNG-free
version: the start decision and span length derive from md5 of
(doc_id, position), the overlap rule runs as a per-doc fold, and the
oracle replays the identical hash arithmetic — so the exact mask
layout every trainer would see is cross-engine certified.

  * text_span_corruption — per doc: token count, span count, masked
    token count, masked-rate in milli, and the first span's start
    position.  ~12% start rate with 1-3 token spans targets the
    canonical ~15% corruption budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import tokens
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_START_PCT = 12  # md5 % 100 < 12 → span starts here (if not inside one)

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), _t -> _t <> '')"
)


@register(
    "text_span_corruption",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, len({_SQL_TOKS}) AS n_tokens FROM documents
),
hs AS (
  SELECT doc_id, n_tokens,
         list_transform(range(1, n_tokens + 1), i ->
           [CAST('0x' || substr(md5(doc_id || '-' || i), 1, 4) AS BIGINT)
              % 100,
            CAST('0x' || substr(md5(doc_id || '~' || i), 1, 4) AS BIGINT)
              % 3]) AS hx
  FROM tk
),
folded AS (
  SELECT doc_id, n_tokens,
    -- state [n_masked, n_spans, remaining, first_start, pos]
    list_reduce(
      list_prepend(
        [CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(-1 AS BIGINT), CAST(0 AS BIGINT)],
        hx),
      (acc, x) -> CASE
        WHEN acc[3] > 0 THEN
          [acc[1] + 1, acc[2], acc[3] - 1, acc[4], acc[5] + 1]
        WHEN x[1] < {_START_PCT} THEN
          [acc[1] + 1, acc[2] + 1, x[2],
           CASE WHEN acc[4] = -1 THEN acc[5] + 1 ELSE acc[4] END,
           acc[5] + 1]
        ELSE [acc[1], acc[2], CAST(0 AS BIGINT), acc[4], acc[5] + 1] END
    ) AS st
  FROM hs
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(st[1] AS BIGINT) AS n_masked,
       CAST(st[2] AS BIGINT) AS n_spans,
       CASE WHEN n_tokens > 0
            THEN (1000 * st[1]) // n_tokens ELSE NULL END AS mask_rate_milli,
       CAST(st[4] AS BIGINT) AS first_span_start
FROM folded
ORDER BY doc_id
""",
    description="T5-style span corruption layout, RNG-free: position i "
    f"starts a masked span iff md5(doc_id,i) mod 100 < {_START_PCT} AND "
    "no span is running (the sequential no-overlap rule that forces a "
    "fold — a position inside an active span cannot start one), span "
    "length 1-3 from a second hash. Per-doc certificates: masked count, "
    "span count, integer milli mask-rate, first span start — the exact "
    "layout a denoising trainer would apply, replayed hash-for-hash by "
    "the oracle. All BIGINT state under the cross-engine fold contract. "
    "Scale shape: one map pass (hashes + fold are per-row expressions), "
    "zero shuffles beyond the scan; the masked TEXT itself never needs "
    "to cross a stage boundary.",
    tags=("text", "llm", "curation"),
)
def text_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    docs = spread(t(spark, sf_dir, "documents")).select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    hx = docs.select(
        "doc_id",
        "n_tokens",
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens")),
            lambda i: F.array(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("-", F.col("doc_id"), i)), 1, 4
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 100,
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("~", F.col("doc_id"), i)), 1, 4
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 3,
            ),
        ).alias("hx"),
    )

    def step(acc, x):
        n_masked = F.element_at(acc, 1)
        n_spans = F.element_at(acc, 2)
        remaining = F.element_at(acc, 3)
        first = F.element_at(acc, 4)
        pos = F.element_at(acc, 5)
        h_start = F.element_at(x, 1)
        h_len = F.element_at(x, 2)
        zero = F.lit(0).cast("bigint")
        return (
            F.when(
                remaining > 0,
                F.array(n_masked + 1, n_spans, remaining - 1, first, pos + 1),
            )
            .when(
                h_start < _START_PCT,
                F.array(
                    n_masked + 1,
                    n_spans + 1,
                    h_len,
                    F.when(first == -1, pos + 1).otherwise(first),
                    pos + 1,
                ),
            )
            .otherwise(F.array(n_masked, n_spans, zero, first, pos + 1))
        )

    init = F.array(
        F.lit(0).cast("bigint"),
        F.lit(0).cast("bigint"),
        F.lit(0).cast("bigint"),
        F.lit(-1).cast("bigint"),
        F.lit(0).cast("bigint"),
    )
    folded = hx.select(
        "doc_id",
        "n_tokens",
        F.aggregate("hx", init, step).alias("st"),
    )
    return folded.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.element_at("st", 1).alias("n_masked"),
        F.element_at("st", 2).alias("n_spans"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                "CAST((1000 * element_at(st, 1)) div n_tokens AS BIGINT)"
            ),
        ).alias("mask_rate_milli"),
        F.element_at("st", 4).alias("first_span_start"),
    )
