"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline; a cross join that Spark
    executes as broadcast-nested-loop when the query side is small (it
    always is: k query vectors vs N corpus vectors). Corpus side streams;
    memory is O(queries). The per-partition TakeOrdered keeps only k rows.
  * LSH-bucketed top-k — sign-of-hyperplane signature as the bucket key;
    candidates share a bucket (optionally with multi-probe via hamming-1
    neighbor buckets). At 100 TB the equi-join on bucket replaces the cross
    join: shuffle O(N), candidate set per query ~N/2^bits.

Deterministic: hyperplanes are seeded constants baked into the plan.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import vectors as V


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes (frozen at plan-build time)."""
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, neighbor_id, cos_sim, rank) — rank 1..k, ties broken
    by neighbor_id (deterministic). Self-matches (same id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("query_vec"),
            V.norm(F.col(query_vec_col)).alias("q_norm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("vec"), F.col("query_vec"), F.col("c_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k: candidates = corpus vectors sharing the
    query's hyperplane-sign bucket; exact cosine re-rank within candidates.

    Recall/cost dial = n_planes (more planes → smaller buckets → cheaper,
    lower recall). The scale path: equi-join on bucket instead of cross
    join. Output schema matches brute_force_topk.
    """
    planes = make_hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("c_norm"),
        V.hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("query_vec"),
            V.norm(F.col(query_vec_col)).alias("q_norm"),
            V.hyperplane_signature(F.col(query_vec_col), planes).alias("bucket"),
        )
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("vec"), F.col("query_vec"), F.col("c_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer of ``n_cells``
    centroids partitions the corpus into cells; each query probes its
    ``n_probe`` nearest cells and re-ranks exactly within them.

    The quantizer is deterministic: centroids are the corpus vectors with
    ``id < n_cells`` (seed vectors, zero k-means iterations), so both
    engines derive the identical partition. Assignment = argmax cosine with
    centroid-id tie-break.

    Scale shape: at 100 TB the assignment pass is a one-off materialization
    (cell becomes a partition column of the stored table); queries then
    touch only ``n_probe/n_cells`` of the data via partition pruning — the
    cross join in this one-shot form exists only because the fixture isn't
    pre-partitioned. Candidate search is an equi-join on ``cell`` exactly
    like the LSH path.
    """
    cent = F.broadcast(
        corpus.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cvec"),
            V.norm(F.col(vec_col)).alias("cent_norm"),
        )
    )

    def rank_cells(df: DataFrame, idc: str, vecc: str, normc: str) -> DataFrame:
        scored = df.crossJoin(cent).select(
            df["*"],
            F.col("cent_id"),
            F.round(
                V.cosine_from_norms(
                    F.col(vecc), F.col("cvec"), F.col(normc), F.col("cent_norm")
                ),
                6,
            ).alias("cell_sim"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("cell_sim").desc(), F.col("cent_id"))
        return scored.withColumn("cell_rn", F.row_number().over(w))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("c_norm"),
    )
    assign = (
        rank_cells(c, "neighbor_id", "vec", "c_norm")
        .filter(F.col("cell_rn") == 1)
        .select("neighbor_id", "vec", "c_norm", F.col("cent_id").alias("cell"))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("query_vec"),
        V.norm(F.col(query_vec_col)).alias("q_norm"),
    )
    probes = F.broadcast(
        rank_cells(q, "query_id", "query_vec", "q_norm")
        .filter(F.col("cell_rn") <= n_probe)
        .select("query_id", "query_vec", "q_norm", F.col("cent_id").alias("cell"))
    )
    scored = (
        assign.join(probes, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("vec"), F.col("query_vec"), F.col("c_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
