"""Hundred-sixty-first wave: MIPS-to-cosine reduction and soft
deduplication.

  * sim_mips_topk — maximum-inner-product search with the
    Neyshabur-Srebro (2015) order-preserving reduction: augment every
    candidate with sqrt(M^2 - |x|^2) (M = max corpus norm) and pad the
    query with 0; cosine order over the augmented vectors equals
    inner-product order over the originals. The query returns the
    per-probe top-10 by raw dot alongside the transformed cosine, so
    the oracle certifies both the MIPS answer and the reduction's
    rank equivalence.
  * curation_soft_dedup_weights — soft deduplication: instead of
    DROPPING near-duplicates, every document is downweighted by
    1/(1 + near-dup degree) (degree = #docs with 5-gram Jaccard >=
    0.5, the dedup_ngram_jaccard pair table) and the corpus reports
    effective token mass. The keep-everything/downweight-duplicates
    recipe used when duplicates carry signal (quality ~ replication)
    but must not dominate the sampling distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.llm import _SQL_TOKENS
from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t

_MQ_N = 5
_MQ_TOP = 10


@register(
    "sim_mips_topk",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), m AS (
  SELECT MAX(sqrt(list_dot_product(v, v))) AS mx FROM e
), scored AS (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(a.v, q.v), 6) AS dot,
         round(list_dot_product(a.v, q.v) /
               (m.mx * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_t
  FROM e a CROSS JOIN e q CROSS JOIN m
  WHERE q.vec_id < {_MQ_N} AND a.vec_id <> q.vec_id
)
SELECT query_id, neighbor_id, dot, cos_t, CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY dot DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= {_MQ_TOP}
""",
    description="Maximum-inner-product search (the retrieval objective "
    "of dot-product-trained embedding models, where cosine top-k is "
    "WRONG because long vectors legitimately score higher) with the "
    "Neyshabur-Srebro order-preserving reduction made visible: each "
    "top-10 row carries both the raw dot and the augmented-space cosine "
    "dot/(M*|q|) — rank by either is identical since the augmentation "
    "sqrt(M^2-|x|^2) gives every candidate norm M, which is what lets "
    "MIPS reuse ANY cosine-ANN index (the registry's LSH/IVF/PQ paths) "
    "unchanged at 100 TB: one extra dimension, no new index structure. "
    "Probe set = 5 fixed queries, brute-force exact here (the ANN "
    "variants are the scale path).",
    tags=("llm", "similarity"),
)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.tables import spread

    emb = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # bcast-ok: 1-row max-norm frame
    m = F.broadcast(emb.agg(F.max(V.norm(F.col("v"))).alias("mx")))
    qs = emb.filter(F.col("vec_id") < _MQ_N).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dot = V.dot(F.col("v"), F.col("qv"))
    # bcast-ok: qs is the fixed 5-query probe set
    scored = (
        emb.crossJoin(F.broadcast(qs))
        .crossJoin(m)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot, 6).alias("dot"),
            F.round(
                dot / (F.col("mx") * V.norm(F.col("qv"))), 6
            ).alias("cos_t"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _MQ_TOP)
        .select(
            "query_id",
            "neighbor_id",
            "dot",
            "cos_t",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


_SD_ORACLE_PAIRS = REGISTRY["dedup_ngram_jaccard"].oracle


@register(
    "curation_soft_dedup_weights",
    oracle=f"""
WITH pairs AS ({_SD_ORACLE_PAIRS}),
deg AS (
  SELECT id, COUNT(*) AS n_near FROM (
    SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs
  ) GROUP BY id
), toks AS (
  SELECT doc_id, len({_SQL_TOKENS.format(col='text')}) AS n_tokens
  FROM documents
)
SELECT t.doc_id,
       CAST(COALESCE(d.n_near, 0) AS BIGINT) AS n_near,
       round(1.0 / (1 + COALESCE(d.n_near, 0)), 6) AS weight,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       round(t.n_tokens * (1.0 / (1 + COALESCE(d.n_near, 0))), 6)
         AS eff_tokens
FROM toks t LEFT JOIN deg d ON d.id = t.doc_id
""",
    description="Soft deduplication: near-duplicates are DOWNWEIGHTED "
    "instead of dropped — each document's sampling weight is "
    "1/(1 + near-dup degree) over the 5-gram-Jaccard >= 0.5 pair table "
    "(the same blocked inverted-index join as dedup_ngram_jaccard), and "
    "effective token mass = n_tokens x weight. The keep-everything "
    "recipe for corpora where replication correlates with quality but "
    "must not dominate the training distribution; a training sampler "
    "consumes the weight column directly. Shape: pair table -> degree "
    "hash-agg -> one left join back to the corpus — the weights pass "
    "costs one aggregate more than detection itself.",
    tags=("curation", "dedup", "llm"),
)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.plans.llm import (
        ngram_jaccard_pairs_cached,
    )

    pairs = ngram_jaccard_pairs_cached(spark, sf_dir)
    deg = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    weight = F.lit(1.0) / (1 + F.coalesce(F.col("n_near"), F.lit(0)))
    return docs.join(deg, docs.doc_id == deg.id, "left").select(
        "doc_id",
        F.coalesce(F.col("n_near"), F.lit(0)).cast("bigint").alias("n_near"),
        F.round(weight, 6).alias("weight"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("n_tokens") * weight, 6).alias("eff_tokens"),
    )
