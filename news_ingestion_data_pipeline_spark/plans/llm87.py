"""Eighty-seventh wave: NDCG ranking evaluation.

sim_ndcg_eval scores the exact cosine top-5 ranking with NDCG@5 against
label-match relevance — THE graded ranking metric, completing the
retrieval-eval family (recall@k = set overlap, kNN accuracy = majority
vote; NDCG weighs WHERE on the list the right answers sit).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t
from news_ingestion_data_pipeline_spark.tables import local_df

_NDCG_K = 5
# discount 1/log2(rank+1), frozen literals per rank
_DISCOUNTS = [round(1.0 / math.log2(r + 1), 9) for r in range(1, _NDCG_K + 1)]


def _ndcg_oracle() -> str:
    exact = REGISTRY["sim_cosine_topk"].oracle
    disc_rows = ", ".join(
        f"({r + 1}, CAST({d!r} AS DOUBLE))" for r, d in enumerate(_DISCOUNTS)
    )
    return f"""
WITH topk AS (SELECT query_id, neighbor_id, rank FROM ({exact})),
lab AS (SELECT vec_id, label FROM embeddings),
disc AS (SELECT * FROM (VALUES {disc_rows}) AS v(rank, w)),
judged AS (
  SELECT t.query_id, t.rank, d.w,
         CAST(nl.label = ql.label AS INT) AS rel
  FROM topk t
  JOIN lab nl ON nl.vec_id = t.neighbor_id
  JOIN lab ql ON ql.vec_id = t.query_id
  JOIN disc d ON d.rank = t.rank
), dcg AS (
  SELECT query_id,
         CAST(CAST(SUM(CAST(round(rel * w, 9) AS DECIMAL(14,9))) AS VARCHAR)
              AS DOUBLE) AS dcg,
         SUM(rel) AS n_rel
  FROM judged GROUP BY query_id
), ideal AS (
  SELECT query_id,
         CAST(CAST(SUM(CAST(round(CASE WHEN d.rank <= g.n_rel THEN d.w
                                       ELSE 0.0 END, 9)
                            AS DECIMAL(14,9))) AS VARCHAR) AS DOUBLE) AS idcg
  FROM dcg g CROSS JOIN disc d
  GROUP BY query_id
)
SELECT d.query_id,
       CAST(d.n_rel AS BIGINT) AS n_relevant_in_topk,
       round(d.dcg, 6) AS dcg,
       round(i.idcg, 6) AS idcg,
       CASE WHEN i.idcg = 0 THEN 0.0
            ELSE round(d.dcg / i.idcg, 6) END AS ndcg
FROM dcg d JOIN ideal i USING (query_id)
ORDER BY d.query_id
"""


@register(
    "sim_ndcg_eval",
    oracle=_ndcg_oracle(),
    description=f"NDCG@{_NDCG_K} of the exact cosine top-{_NDCG_K} "
    "ranking (sim_cosine_topk's registered construction, reused) with "
    "label-match relevance: DCG = Σ rel/log2(rank+1) against the ideal "
    "ordering of the same relevant count — THE graded ranking metric, "
    "which unlike recall@k (sim_lsh_recall_eval / "
    "sim_prefix_dim_recall, position-blind) and kNN accuracy "
    "(sim_knn_classify, vote-based) rewards putting relevant items "
    "FIRST; queries whose top-k holds no same-label neighbor score 0 "
    "by convention. Discount weights are compile-time literals per "
    "rank (no log at runtime), rel·w terms round-9 into DECIMAL sums. "
    "Shape: the top-k list is tiny; labels broadcast onto it; the "
    "ideal DCG needs only each query's relevant COUNT — no second "
    "sort.",
    tags=("llm", "similarity", "eval", "retrieval"),
)
def sim_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    topk = SIM.brute_force_topk(emb, queries, k=_NDCG_K).select(
        "query_id", "neighbor_id", "rank"
    )
    lab = emb.select("vec_id", "label")
    disc = local_df(
        emb.sparkSession, [(r + 1, float(d)) for r, d in enumerate(_DISCOUNTS)], "rank INT, w DOUBLE"
    )
    judged = (
        topk.join(
            F.broadcast(lab.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel"))),
            "neighbor_id",
        )
        .join(
            F.broadcast(lab.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))),
            "query_id",
        )
        .join(F.broadcast(disc), "rank")
        .select(
            "query_id",
            "rank",
            "w",
            (F.col("nlabel") == F.col("qlabel")).cast("int").alias("rel"),
        )
    )
    dcg = judged.groupBy("query_id").agg(
        F.sum(F.round(F.col("rel") * F.col("w"), 9).cast("decimal(14,9)"))
        .cast("double")
        .alias("dcg"),
        F.sum("rel").alias("n_rel"),
    )
    ideal = (
        dcg.crossJoin(F.broadcast(disc))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.round(
                    F.when(F.col("rank") <= F.col("n_rel"), F.col("w")).otherwise(
                        0.0
                    ),
                    9,
                ).cast("decimal(14,9)")
            )
            .cast("double")
            .alias("idcg")
        )
    )
    return (
        dcg.join(ideal, "query_id")
        .select(
            "query_id",
            F.col("n_rel").cast("bigint").alias("n_relevant_in_topk"),
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.when(F.col("idcg") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("dcg") / F.col("idcg"), 6))
            .alias("ndcg"),
        )
        
    )
