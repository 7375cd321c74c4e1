"""Thirty-fifth wave: DBSCAN density clustering over the embedding
table — core/border/noise classification plus connected-component
cluster labels, fully deterministic and oracle-checked via an unrolled
materialized-CTE min-label propagation (the graph_kcore_peel /
graph_label_propagation precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm2 import _sqdist_sql
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_EPS2 = 1.40  # squared-L2 neighborhood radius
_MINPTS = 4  # neighborhood size (incl. self) for core status
_CC_ROUNDS = 12  # min-label unroll depth; convergence asserted in tests


def _dbscan_oracle() -> str:
    ctes = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""adj AS MATERIALIZED (
  SELECT a.vec_id AS u, b.vec_id AS w
  FROM e a JOIN e b ON a.vec_id <> b.vec_id
  WHERE {_sqdist_sql('a.v', 'b.v', 64)} <= {_EPS2}
)""",
        f"""core AS MATERIALIZED (
  SELECT e.vec_id FROM e
  LEFT JOIN (SELECT u, COUNT(*) AS nb FROM adj GROUP BY u) d
    ON d.u = e.vec_id
  WHERE COALESCE(d.nb, 0) + 1 >= {_MINPTS}
)""",
        """cadj AS MATERIALIZED (
  SELECT adj.u, adj.w FROM adj
  JOIN core c1 ON c1.vec_id = adj.u
  JOIN core c2 ON c2.vec_id = adj.w
)""",
        "l0 AS MATERIALIZED (SELECT vec_id AS u, vec_id AS lbl FROM core)",
    ]
    for r in range(1, _CC_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""l{r} AS MATERIALIZED (
  SELECT l.u, LEAST(l.lbl, COALESCE(MIN(n.lbl), l.lbl)) AS lbl
  FROM l{p} l
  LEFT JOIN cadj ON cadj.u = l.u
  LEFT JOIN l{p} n ON n.u = cadj.w
  GROUP BY l.u, l.lbl
)"""
        )
    return f"""
WITH {','.join(ctes)},
final AS (SELECT u, lbl FROM l{_CC_ROUNDS}),
border AS (
  SELECT adj.u AS vec_id, MIN(f.lbl) AS lbl
  FROM adj
  JOIN final f ON f.u = adj.w
  WHERE adj.u NOT IN (SELECT vec_id FROM core)
  GROUP BY adj.u
)
SELECT u AS vec_id, 'core' AS role, CAST(lbl AS BIGINT) AS cluster
FROM final
UNION ALL
SELECT vec_id, 'border' AS role, CAST(lbl AS BIGINT) AS cluster FROM border
UNION ALL
SELECT e.vec_id, 'noise' AS role, CAST(NULL AS BIGINT) AS cluster
FROM e
WHERE e.vec_id NOT IN (SELECT u FROM final)
  AND e.vec_id NOT IN (SELECT vec_id FROM border)
ORDER BY vec_id
"""


@register(
    "sim_dbscan",
    oracle=_dbscan_oracle(),
    description=f"DBSCAN density clustering over the embedding column "
    f"(eps^2 = {_EPS2} squared-L2, minPts = {_MINPTS}): points with a "
    "dense neighborhood are CORES, cores reachable through overlapping "
    "neighborhoods merge into one cluster (connected components of the "
    "core graph, labeled by min-vec_id min-label propagation — "
    "deterministic, tie-free), non-cores adjacent to a core are BORDER "
    "points adopting their smallest core neighbor's cluster, and the "
    "rest is NOISE — the outlier set no centroid method gives you. "
    "Neighborhoods here are the exact all-pairs verification baseline "
    "(the embedding table is vocabulary-sized); at 100 TB candidate "
    "pairs come from the hyperplane/LSH bucketing already proven in "
    "dedup_embedding_neardup and sim_lsh_buckets, and the component "
    "loop is the same pointer-jumping shape as dedup_connected_clusters "
    "(O(log diameter) rounds, checkpoint-truncated lineage). Spark side "
    f"runs min-label to the fixpoint capped at {_CC_ROUNDS} rounds with "
    "an early exit at zero label movement — result-identical to the "
    "oracle's fixed unroll once converged (asserted by tests).",
    tags=("llm", "similarity", "iterative", "graph"),
)
def sim_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators.similarity import (
        gemm_eps_pairs,
    )
    from news_ingestion_data_pipeline_spark.tables import spread

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # epsilon-neighborhood pairs via the Arrow/numpy GEMM stage (see
    # gemm_eps_pairs: the per-pair Catalyst evaluation is interpreted
    # inside the BNLJ condition — measured 29-122 s at sf0.1 vs ~1 s
    # vectorized; fixtures' nearest boundary margin 1.2e-6 >> ulp noise)
    # Derive the GEMM tiling from the corpus size instead of the static
    # default: B = ceil(n / 65536) keeps each tile <= 64k vectors (two
    # 64-dim float64 tiles ~= 64 MB/task) while B*(B+1)/2 groups grow
    # with n, so the same plan spreads over any executor count at scale.
    n_vecs = e.count()
    blocks = max(8, -(-n_vecs // 65536))
    adj = gemm_eps_pairs(spread(e), _EPS2, n_blocks=blocks).localCheckpoint()
    e = e.select("vec_id")
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("nb"))
    core = (
        e.join(deg, e["vec_id"] == deg["u"], "left")
        .where(F.coalesce(F.col("nb"), F.lit(0)) + 1 >= _MINPTS)
        .select("vec_id")
        .localCheckpoint()
    )
    cadj = (
        adj.join(core.withColumnRenamed("vec_id", "cu"), F.col("u") == F.col("cu"))
        .join(core.withColumnRenamed("vec_id", "cw"), F.col("w") == F.col("cw"))
        .select("u", "w")
        .localCheckpoint()
    )
    labels = core.select(F.col("vec_id").alias("u"), F.col("vec_id").alias("lbl"))
    # label sum decreases monotonically; unchanged sum == fixpoint. The
    # probe RIDES the round's checkpoint job as an Observation (bigint
    # sum — order-insensitive and exact), so each round is ONE job
    # instead of checkpoint + a separate agg/collect probe.
    prev_sum = None
    for _ in range(_CC_ROUNDS):
        nb_min = (
            cadj.join(
                labels.select(F.col("u").alias("w"), F.col("lbl").alias("nlbl")),
                "w",
            )
            .groupBy("u")
            .agg(F.min("nlbl").alias("nmin"))
        )
        # pointer jump: also chase lbl -> lbl(lbl), halving convergence
        # rounds vs plain neighbor-min (same fixpoint, so the oracle's
        # plain unroll still matches once both converge)
        jump = labels.select(
            F.col("u").alias("ju"), F.col("lbl").alias("jlbl")
        )
        obs = Observation()
        labels = (
            labels.join(nb_min, "u", "left")
            .join(jump, F.col("lbl") == F.col("ju"), "left")
            .select(
                "u",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("nmin"), F.col("lbl")),
                    F.coalesce(F.col("jlbl"), F.col("lbl")),
                ).alias("lbl"),
            )
            .observe(obs, F.sum("lbl").alias("s"))
            .localCheckpoint()
        )
        s = obs.get["s"]
        if s == prev_sum:
            break
        prev_sum = s
    cores_out = labels.select(
        F.col("u").alias("vec_id"),
        F.lit("core").alias("role"),
        F.col("lbl").cast("bigint").alias("cluster"),
    )
    border = (
        adj.join(core.withColumnRenamed("vec_id", "cu"), F.col("u") == F.col("cu"), "left_anti")
        .join(
            labels.select(F.col("u").alias("w"), F.col("lbl").alias("nlbl")), "w"
        )
        .groupBy("u")
        .agg(F.min("nlbl").alias("lbl"))
        .select(
            F.col("u").alias("vec_id"),
            F.lit("border").alias("role"),
            F.col("lbl").cast("bigint").alias("cluster"),
        )
    )
    assigned = cores_out.unionByName(border)
    noise = (
        e.select("vec_id")
        .join(assigned.select("vec_id"), "vec_id", "left_anti")
        .select(
            "vec_id",
            F.lit("noise").alias("role"),
            F.lit(None).cast("bigint").alias("cluster"),
        )
    )
    return assigned.unionByName(noise)
