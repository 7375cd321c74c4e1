"""Seventy-sixth wave: BM25 scoring and reciprocal-rank fusion.

text_bm25_scoring is THE lexical retrieval function (the Robertson/
Sparck-Jones weighting every search engine defaults to) — tf saturation
and length normalization on top of idf, which text_tfidf_top_terms lacks.
sim_reciprocal_rank_fusion is the standard hybrid-retrieval combiner:
two rankers' result lists merge by summed 1/(k + rank), robust to
incomparable score scales — composed here from two registered rankers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20
# fixed query terms: frequent fixture vocabulary so the query matches
_BM25_QUERY = ["spark", "stream", "join", "window"]


@register(
    "text_bm25_scoring",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(trim(lower(text)), ' ')) AS w
  FROM documents WHERE length(trim(text)) > 0
), doclen AS (
  SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id
), avgdl AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
         COUNT(*) AS n_docs
  FROM doclen
), tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tok
  WHERE w IN ({", ".join(f"'{q}'" for q in _BM25_QUERY)})
  GROUP BY doc_id, w
), df AS (
  SELECT w, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY w
), scored AS (
  SELECT t.doc_id,
         SUM(CAST(round(ln((a.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0), 9)
                  AS DECIMAL(18,9))
             * CAST(round(t.tf * ({_BM25_K1!r} + 1.0)
                          / (t.tf + {_BM25_K1!r}
                             * (1.0 - {_BM25_B!r}
                                + {_BM25_B!r} * l.dl / a.avgdl)), 9)
                    AS DECIMAL(18,9))) AS score_dec,
         COUNT(*) AS n_terms_matched
  FROM tf t
  JOIN doclen l USING (doc_id)
  JOIN df d USING (w)
  CROSS JOIN avgdl a
  GROUP BY t.doc_id
)
SELECT doc_id,
       round(CAST(CAST(score_dec AS VARCHAR) AS DOUBLE), 6) AS bm25,
       CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
       rnk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score_dec DESC, doc_id) AS rnk
  FROM scored
) WHERE rnk <= {_BM25_TOP}
ORDER BY rnk
""",
    description=f"BM25 document scoring for the fixed query "
    f"{_BM25_QUERY}: Robertson idf ln((N−df+0.5)/(df+0.5)+1) x the "
    f"tf-saturation/length-normalization kernel (k1={_BM25_K1}, "
    f"b={_BM25_B}), top-{_BM25_TOP} by (score, id) — THE lexical "
    "retrieval function, whose tf saturation and doc-length "
    "normalization are exactly what text_tfidf_top_terms' raw tf·idf "
    "lacks (a 10x-repeated term shouldn't score 10x; long docs "
    "shouldn't win by volume). Per-term factors are evaluated on "
    "bounded domains (idf per TERM, the kernel per (doc, term) pair), "
    "rounded to 9 dp and summed as DECIMAL so per-doc scores are "
    "partition-order-independent. Shape: tf filters to query terms "
    "BEFORE aggregating (the posting-list shape — at 100 TB this is "
    "an inverted-index lookup, never a corpus scan per query), doc "
    "lengths and idf broadcast.",
    tags=("text", "llm", "retrieval"),
)
def text_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(F.split(F.trim(F.lower("text")), " ")).alias("w"))
    )
    doclen = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    avgdl = doclen.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        tok.filter(F.col("w").isin(_BM25_QUERY))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
        9,
    ).cast("decimal(18,9)")
    kernel = F.round(
        F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        9,
    ).cast("decimal(18,9)")
    scored = (
        tf.join(doclen, "doc_id")
        .join(F.broadcast(df), "w")
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(
            F.sum(idf * kernel).alias("score_dec"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )
    w_rank = Window.orderBy(F.col("score_dec").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= _BM25_TOP)
        .select(
            "doc_id",
            F.round(F.col("score_dec").cast("double"), 6).alias("bm25"),
            F.col("n_terms_matched").cast("bigint").alias("n_terms_matched"),
            "rnk",
        )
        
    )


_RRF_K = 60


def _rrf_oracle() -> str:
    full = REGISTRY["sim_cosine_topk"].oracle
    pfx_cos = (
        "round(list_dot_product(a.p, q.p) / (sqrt(list_dot_product(a.p, a.p))"
        " * sqrt(list_dot_product(q.p, q.p))), 6)"
    )
    return f"""
WITH full_topk AS (SELECT query_id, neighbor_id, rank FROM ({full})),
c AS (
  SELECT vec_id, (embedding::DOUBLE[])[1:16] AS p FROM embeddings
), q AS (SELECT * FROM c WHERE vec_id < 10),
pfx_topk AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {pfx_cos} DESC, a.vec_id) AS rank
    FROM c a CROSS JOIN q WHERE a.vec_id != q.vec_id
  ) WHERE rank <= 5
), unioned AS (
  SELECT query_id, neighbor_id, rank FROM full_topk
  UNION ALL
  SELECT query_id, neighbor_id, rank FROM pfx_topk
), fused AS (
  SELECT query_id, neighbor_id,
         CAST(SUM(CAST(round(1.0 / ({_RRF_K} + rank), 9) AS DECIMAL(12,9)))
              AS DECIMAL(12,9)) AS rrf_dec,
         COUNT(*) AS n_lists
  FROM unioned GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id,
       round(CAST(CAST(rrf_dec AS VARCHAR) AS DOUBLE), 6) AS rrf_score,
       CAST(n_lists AS BIGINT) AS n_lists,
       fused_rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_dec DESC, neighbor_id) AS fused_rank
  FROM fused
) WHERE fused_rank <= 5
ORDER BY query_id, fused_rank
"""


@register(
    "sim_reciprocal_rank_fusion",
    oracle=_rrf_oracle(),
    description=f"Reciprocal-rank fusion (k={_RRF_K}) of two registered "
    "rankers — the full-dimension exact top-5 (sim_cosine_topk) and the "
    "16-dim Matryoshka-prefix top-5 (sim_prefix_dim_recall's truncated "
    "path) — per query: RRF(d) = Σ_lists 1/(k + rank_list(d)), the "
    "hybrid-retrieval combiner that needs NO score calibration (ranks, "
    "not scores, so a cosine list and a BM25 list fuse just as well — "
    "which is why RRF is the default hybrid in every vector+lexical "
    "stack). Documents on both lists (n_lists = 2) get the boost that "
    "makes fusion beat either list alone. The 1/(k+rank) terms are "
    "exact at 9 dp and sum as DECIMAL; ties break (score, id). Shape: "
    "the two top-k lists are tiny; fusion is one hash-aggregate over "
    "their union and a per-query rank.",
    tags=("llm", "similarity", "retrieval"),
)
def sim_reciprocal_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = t(spark, sf_dir, "embeddings")
    pfx = emb.select(
        "vec_id",
        F.col("embedding").alias("embedding_full"),
        F.slice(F.col("embedding"), 1, 16).alias("embedding_pfx"),
    )
    q_full = pfx.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding_full").alias("query_vec")
    )
    q_pfx = pfx.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding_pfx").alias("query_vec")
    )
    full = SIM.brute_force_topk(
        pfx.select("vec_id", F.col("embedding_full").alias("embedding")), q_full, k=5
    ).select("query_id", "neighbor_id", "rank")
    trunc = SIM.brute_force_topk(
        pfx.select("vec_id", F.col("embedding_pfx").alias("embedding")), q_pfx, k=5
    ).select("query_id", "neighbor_id", "rank")
    unioned = full.unionByName(trunc)
    fused = unioned.groupBy("query_id", "neighbor_id").agg(
        F.sum(
            F.round(F.lit(1.0) / (_RRF_K + F.col("rank")), 9).cast("decimal(12,9)")
        ).alias("rrf_dec"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_dec").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("rrf_dec").cast("double"), 6).alias("rrf_score"),
            F.col("n_lists").cast("bigint").alias("n_lists"),
            "fused_rank",
        )
        
    )
