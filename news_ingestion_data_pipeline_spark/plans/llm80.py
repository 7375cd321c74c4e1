"""Eightieth wave: triplet-margin violation evaluation.

sim_triplet_violations closes the embedding-quality eval family (kNN
accuracy = sim_knn_classify, cluster purity, silhouette) with the
metric-learning view: for each anchor, is its nearest SAME-label
neighbor closer than its nearest OTHER-label neighbor by the margin? —
the quantity triplet-loss training drives to zero, measured here
directly on the embedding table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_TV_MOD = 37      # anchors: vec_id % 37 == 0
_TV_MARGIN = 0.05

_SQL_COS = (
    "round(list_dot_product(a.v, q.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 6)"
)


@register(
    "sim_triplet_violations",
    oracle=f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT * FROM c WHERE vec_id % {_TV_MOD} = 0),
scored AS (
  SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
         a.vec_id AS other_id, a.label AS other_label,
         {_SQL_COS} AS cos_sim
  FROM c a CROSS JOIN q WHERE a.vec_id != q.vec_id
), best AS (
  SELECT anchor_id, anchor_label,
         MAX(CASE WHEN other_label = anchor_label THEN cos_sim END) AS pos_sim,
         MAX(CASE WHEN other_label != anchor_label THEN cos_sim END) AS neg_sim
  FROM scored GROUP BY anchor_id, anchor_label
)
SELECT anchor_id, anchor_label,
       pos_sim, neg_sim,
       round(pos_sim - neg_sim, 6) AS sim_margin,
       CAST(pos_sim < neg_sim + {_TV_MARGIN!r} AS BOOLEAN) AS violated
FROM best
WHERE pos_sim IS NOT NULL AND neg_sim IS NOT NULL
ORDER BY anchor_id
""",
    description=f"Triplet-margin violation eval (margin {_TV_MARGIN}): "
    "for every anchor (vec_id % "
    f"{_TV_MOD} = 0), the best same-label cosine (hardest positive "
    "criterion satisfied trivially — we take the NEAREST positive) "
    "against the best other-label cosine (the hardest negative, "
    "sim_hard_negatives' mining rule), and whether the pair violates "
    "pos ≥ neg + margin — the quantity triplet/contrastive training "
    "drives to zero, so the violation rate IS the metric-learning "
    "readout of embedding quality, complementing sim_knn_classify "
    "(task accuracy), sim_cluster_purity (external validity) and "
    "sim_silhouette_score (internal validity). Shape: anchors "
    "broadcast over one corpus scan, per-anchor conditional-max "
    "aggregate — map-side, no corpus shuffle; rounded-6 cosines make "
    "the margin comparison deterministic cross-engine.",
    tags=("llm", "similarity", "eval"),
)
def sim_triplet_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.tables import spread

    emb = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    # bcast-ok: anchors are this query's fixed probe set (1/_TV_MOD sample);
    # beyond broadcast size the block-GEMM tiling (SIM.gemm_cos_pairs /
    # gemm_topk) is the documented scale path for anchor-vs-corpus scoring.
    anchors = F.broadcast(
        emb.filter(F.col("vec_id") % _TV_MOD == 0).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("v").alias("qv"),
            F.col("label").alias("anchor_label"),
        )
    )
    cos = F.round(
        V.dot(F.col("v"), F.col("qv"))
        / (V.norm(F.col("v")) * V.norm(F.col("qv"))),
        6,
    )
    scored = (
        emb.crossJoin(anchors)
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("label").alias("other_label"),
            cos.alias("cos_sim"),
        )
    )
    best = scored.groupBy("anchor_id", "anchor_label").agg(
        F.max(
            F.when(F.col("other_label") == F.col("anchor_label"), F.col("cos_sim"))
        ).alias("pos_sim"),
        F.max(
            F.when(F.col("other_label") != F.col("anchor_label"), F.col("cos_sim"))
        ).alias("neg_sim"),
    )
    return (
        best.filter(F.col("pos_sim").isNotNull() & F.col("neg_sim").isNotNull())
        .select(
            "anchor_id",
            "anchor_label",
            "pos_sim",
            "neg_sim",
            F.round(F.col("pos_sim") - F.col("neg_sim"), 6).alias("sim_margin"),
            (F.col("pos_sim") < F.col("neg_sim") + _TV_MARGIN).alias("violated"),
        )
        
    )
