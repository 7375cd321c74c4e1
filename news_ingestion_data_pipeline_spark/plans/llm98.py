"""Ninety-eighth wave: deterministic image augmentation through the real
codec path.

Training-time augmentation is the one multimodal stage between decode
and batching the registry didn't cover: horizontal flip and
center-crop variants, produced INSIDE the Arrow mapInPandas decode
stage so no full-resolution pixels ever cross a shuffle — each variant
ships only its dims and an 8×8 verification crop.  The oracle
regenerates the augmented pixels closed-form with the transformed
indices (flip: x' = w−1−x; crop: offset (h/4, w/4)), so a transposed
axis, off-by-one crop offset, or channel swap hash-fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "multimodal_augment_variants",
    oracle="""
WITH d AS (
  SELECT doc_id, 64 + (doc_id % 3) * 8 AS h, 64 + (doc_id % 4) * 8 AS w
  FROM documents ORDER BY doc_id LIMIT 200
), kk AS (
  SELECT doc_id, h, w, unnest(range(0, 192)) AS k FROM d
), fvals AS (
  SELECT doc_id, h, w, k,
         (3 * doc_id + (k % 3) + (k // 24) * w + (w - 1 - ((k % 24) // 3)))
           % 256 AS v
  FROM kk
), cvals AS (
  SELECT doc_id, h, w, k,
         (3 * doc_id + (k % 3) + ((k // 24) + (h // 4)) * w
          + (((k % 24) // 3) + (w // 4))) % 256 AS v
  FROM kk
), f AS (
  SELECT doc_id AS media_id, 'flip' AS aug,
         CAST(h AS INT) AS out_h, CAST(w AS INT) AS out_w,
         md5(string_agg(printf('%02x', v), '' ORDER BY k)) AS crop_md5,
         CAST(SUM(v) AS BIGINT) AS crop_sum
  FROM fvals GROUP BY doc_id, h, w
), c AS (
  SELECT doc_id AS media_id, 'crop' AS aug,
         CAST(h // 2 AS INT) AS out_h, CAST(w // 2 AS INT) AS out_w,
         md5(string_agg(printf('%02x', v), '' ORDER BY k)) AS crop_md5,
         CAST(SUM(v) AS BIGINT) AS crop_sum
  FROM cvals GROUP BY doc_id, h, w
)
SELECT * FROM (SELECT * FROM f UNION ALL SELECT * FROM c)
ORDER BY media_id, aug
""",
    description="Deterministic image augmentation through the REAL "
    "decode path (operators/multimodal.augment_images): BMP payloads "
    "decode via the pure-numpy parser, then horizontal-flip and "
    "center-crop-half variants are cut as numpy views INSIDE the same "
    "Arrow mapInPandas stage — only each variant's dims and 8x8 "
    "verification crop leave the executor, never full-resolution "
    "pixels. The oracle regenerates the augmented bytes closed-form "
    "with transformed indices (flip x' = w-1-x, crop offset (h/4, "
    "w/4)), md5- and sum-checked, so a transposed axis, off-by-one "
    "offset, or channel swap fails. At 100 TB augmentation multiplies "
    "rows, not shuffle bytes — the decode+transform stays data-local "
    "and batching consumes the variants downstream.",
    tags=("multimodal", "llm"),
)
def multimodal_augment_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = mm.synthesize_media_real(docs, kind="image").repartition(
        8, "media_id"
    )
    aug = mm.augment_images(media, decoder="real")
    hx = F.lower(F.hex("crop_payload"))
    crop_sum = F.aggregate(
        F.sequence(F.lit(0), F.lit(191)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.conv(F.substr(hx, i * 2 + 1, F.lit(2)), 16, 10).cast("bigint"),
    )
    return aug.select(
        "media_id",
        "aug",
        "out_h",
        "out_w",
        F.md5(hx).alias("crop_md5"),
        crop_sum.alias("crop_sum"),
    )


def _bpe_compression_oracle() -> str:
    from news_ingestion_data_pipeline_spark.plans.llm96 import (
        _APPLY_CTE,
        _ITERS,
        _PAIRS_CTE,
        _WORDS_CTE,
    )

    ctes = [_WORDS_CTE]
    for k in range(_ITERS):
        ctes.append(_PAIRS_CTE.format(k=k))
        ctes.append(_APPLY_CTE.format(k=k, k1=k + 1))
    return (
        "WITH "
        + ",".join(ctes)
        + rf""",
lang_words AS (
  SELECT lang, w, COUNT(*) AS freq FROM (
    SELECT lang,
           unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                    '\s+'),
                  _t -> _t <> '')) AS w
    FROM documents WHERE length(trim(text)) > 0)
  GROUP BY lang, w
), wsyms AS (
  SELECT w,
         len(list_filter(string_split(st, chr(1)), x -> x <> '')) AS n_syms
  FROM state{_ITERS}
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
       CAST(SUM(freq) AS BIGINT) AS total_words,
       CAST(SUM(freq * length(w)) AS BIGINT) AS total_chars,
       CAST(SUM(freq * n_syms) AS BIGINT) AS total_tokens,
       round(CAST(SUM(freq * length(w)) AS DOUBLE)
             / SUM(freq * n_syms), 6) AS chars_per_token
FROM lang_words JOIN wsyms USING (w)
GROUP BY lang
ORDER BY lang"""
    )


@register(
    "curation_bpe_compression_eval",
    oracle=_bpe_compression_oracle(),
    description="Tokenizer compression eval per language — the fairness "
    "metric a multilingual corpus report leads with (a tokenizer "
    "trained on skewed data spends more tokens per character on the "
    "under-represented languages): run the 3-iteration BPE trainer "
    "(llm96's bpe_train, same driver-controlled loop), tokenize the "
    "vocab with the learned merges (the final symbol states ARE the "
    "tokenization), then join per-(lang, word) frequencies against "
    "per-word token counts and report chars-per-token by language. "
    "The corpus is touched twice total (global word counts + per-lang "
    "word counts, both hash-aggregates); everything else is "
    "vocabulary-sized. All-integer sums; one final IEEE division.",
    tags=("curation", "text", "tokenizer", "llm"),
)
def curation_bpe_compression_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX
    from news_ingestion_data_pipeline_spark.plans.llm96 import (
        _syms_col,
        bpe_train,
    )

    state, _merges = bpe_train(spark, sf_dir)
    wsyms = state.select("w", F.size(_syms_col()).alias("n_syms"))
    docs = t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    lang_words = (
        docs.select("lang", F.explode(TX.tokens(F.lower("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    joined = lang_words.join(wsyms, "w")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_words"),
            F.sum("freq").cast("bigint").alias("total_words"),
            F.sum(F.col("freq") * F.length("w"))
            .cast("bigint")
            .alias("total_chars"),
            F.sum(F.col("freq") * F.col("n_syms"))
            .cast("bigint")
            .alias("total_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.round(
                F.col("total_chars").cast("double") / F.col("total_tokens"), 6
            ),
        )
        
    )
