"""Hundred-fortieth wave: LLM-watermark detection.

Model-generated text is increasingly something a pretraining corpus
must FILTER OUT, and unigram ("green-list") watermarks are the
standard detectable signature: a keyed hash splits the vocabulary into
green/red halves and watermarked generations oversample green tokens.
Detection is a per-document binomial test — no model needed.

  * text_watermark_greenlist_detect — per doc: token count, green
    count under the md5 green-list (token green iff first hash nibble
    is even — RNG-free, key pinned), the one-sided z-score against the
    null p=1/2, and the flag at z > 2.  On this human-ish synthetic
    corpus flags land near the false-positive rate BY CONSTRUCTION;
    what the oracle certifies is the exact green accounting and the
    decision boundary, token for token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import tokens
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_KEY = "wmkey7"

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), _t -> _t <> '')"
)


@register(
    "text_watermark_greenlist_detect",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
flags AS (
  SELECT doc_id,
         CASE WHEN CAST('0x' || substr(md5('{_KEY}-' || term), 1, 1)
                        AS BIGINT) % 2 = 0
              THEN 1 ELSE 0 END AS green
  FROM tk
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(green) AS BIGINT) AS n_green
  FROM flags GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.n_green, 0) AS n_green,
       CASE WHEN p.n_tokens IS NULL THEN NULL
            ELSE round((p.n_green - p.n_tokens / 2.0)
                       / sqrt(p.n_tokens / 4.0), 6) END AS z_green,
       CAST(CASE WHEN p.n_tokens IS NULL THEN FALSE
                 ELSE round((p.n_green - p.n_tokens / 2.0)
                            / sqrt(p.n_tokens / 4.0), 6) > 2.0
            END AS BOOLEAN) AS flagged_watermarked
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""",
    description="Unigram (green-list) LLM-watermark detection — the "
    "filter a pretraining corpus runs to keep model-generated text out "
    "of the next model's diet: a keyed md5 splits the vocabulary in "
    "half (token green iff first hash nibble even, key pinned), each "
    "document gets the one-sided binomial z = (g - n/2)/sqrt(n/4) "
    "against the un-watermarked null, flag at z > 2. No model in the "
    "loop — detection is pure counting, which is the point of unigram "
    "watermarks. The corpus here is un-watermarked, so flags sit at the "
    "~2% false-positive rate (asserted in tests); the oracle certifies "
    "the exact green accounting and decision boundary per token. One "
    "explode + one per-doc aggregate; the green test is a map-side "
    "expression.",
    tags=("text", "llm", "curation", "stats"),
)
def text_watermark_greenlist_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    docs = spread(t(spark, sf_dir, "documents"))
    flags = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{_KEY}-"), F.col("term"))), 1, 1
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0
        )
        .cast("int")
        .alias("green"),
    )
    per_doc = flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("green").cast("bigint").alias("n_green"),
    )
    z = F.round(
        (F.col("n_green") - F.col("n_tokens") / 2.0)
        / F.sqrt(F.col("n_tokens") / 4.0),
        6,
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias(
                "n_tokens"
            ),
            F.coalesce("n_green", F.lit(0)).cast("bigint").alias("n_green"),
            F.when(F.col("n_tokens").isNotNull(), z).alias("z_green"),
            F.when(F.col("n_tokens").isNotNull(), z > 2.0)
            .otherwise(F.lit(False))
            .alias("flagged_watermarked"),
        )
        
    )
