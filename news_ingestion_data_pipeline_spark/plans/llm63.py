"""Sixty-third wave: degree assortativity and clustering silhouette.

graph_assortativity adds the mixing-pattern statistic to the graph family
(do hubs link to hubs?); sim_silhouette_score closes the clustering loop —
assignment (sim_kmeans_assign), update (sim_kmeans_update), external
validity (sim_cluster_purity) and now internal validity, the metric you
have when no labels exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.llm26 import _copresence_edges
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "graph_assortativity",
    oracle=f"""
WITH {EDGES_SQL},
und AS (
  SELECT u AS a, v AS b FROM edges
  UNION ALL SELECT v AS a, u AS b FROM edges
), deg AS (
  SELECT a AS node, COUNT(*) AS d FROM und GROUP BY a
), ends AS (
  SELECT da.d AS j, db.d AS k
  FROM und e JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
), m AS (
  SELECT COUNT(*) AS m,
         SUM(j) AS sj, SUM(k) AS sk,
         SUM(j * k) AS sjk,
         SUM(j * j) AS sjj, SUM(k * k) AS skk
  FROM ends
)
SELECT CAST(m AS BIGINT) AS n_directed_ends,
       CASE WHEN (CAST(m AS DOUBLE) * sjj - CAST(sj AS DOUBLE) * sj)
                 * (CAST(m AS DOUBLE) * skk - CAST(sk AS DOUBLE) * sk) = 0
            THEN NULL
            ELSE round((CAST(m AS DOUBLE) * sjk - CAST(sj AS DOUBLE) * sk)
                       / sqrt((CAST(m AS DOUBLE) * sjj - CAST(sj AS DOUBLE) * sj)
                              * (CAST(m AS DOUBLE) * skk - CAST(sk AS DOUBLE) * sk)),
                       6) END AS assortativity
FROM m
""",
    description="Degree assortativity of the shared co-presence graph "
    "(Newman 2002): the Pearson correlation of endpoint degrees over "
    "the doubled edge list — positive means hubs attach to hubs "
    "(social-network mixing), negative means hub-and-spoke "
    "(infrastructure mixing); the one-number structural diagnostic "
    "that, next to graph_clustering_coeff and graph_modularity, tells "
    "you which generative regime a graph is in before you pick "
    "algorithms for it. Every moment is an exact INTEGER sum over "
    "edge endpoints (degrees are integers), so the statistic is one "
    "deterministic IEEE expression at the end. Shape: one degree "
    "aggregate, one broadcast join of degrees onto edges, one 1-row "
    "moment frame — no iteration, no sort.",
    tags=("graph", "events", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copresence_edges(spark, sf_dir).localCheckpoint()
    und = edges.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        edges.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    ends = (
        und.join(
            F.broadcast(deg.select(F.col("node").alias("na"), F.col("d").alias("j"))),
            F.col("a") == F.col("na"),
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("nb"), F.col("d").alias("k"))),
            F.col("b") == F.col("nb"),
        )
        .select("j", "k")
    )
    m = ends.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("j").alias("sj"),
        F.sum("k").alias("sk"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum(F.col("j") * F.col("j")).alias("sjj"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
    )
    md = F.col("m").cast("double")
    num = md * F.col("sjk") - F.col("sj").cast("double") * F.col("sk")
    den2 = (md * F.col("sjj") - F.col("sj").cast("double") * F.col("sj")) * (
        md * F.col("skk") - F.col("sk").cast("double") * F.col("sk")
    )
    # regular graphs (constant degree) have zero degree variance: r is
    # undefined there — report NULL, mirrored in the oracle
    return m.select(
        F.col("m").cast("bigint").alias("n_directed_ends"),
        F.when(den2 != 0, F.round(num / F.sqrt(den2), 6)).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Silhouette score of the k-means assignment
# ---------------------------------------------------------------------------

_SIL_K = 8


def _sqd_sql(a: str, b: str, dim: int = 64) -> str:
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, dim + 1)
    )


@register(
    "sim_silhouette_score",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {_SIL_K}),
assigned AS (
  SELECT vec_id, v, cent_id FROM (
    SELECT e.vec_id, e.v, cent.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sqd_sql('e.v', 'cent.cv')}, cent.cent_id)
             AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
), pair_sums AS (
  SELECT a.vec_id, a.cent_id AS own, b.cent_id AS other,
         SUM(CAST(round(sqrt({_sqd_sql('a.v', 'b.v')}), 9) AS DECIMAL(16,9)))
           AS sd,
         COUNT(*) AS n
  FROM assigned a JOIN assigned b ON a.vec_id != b.vec_id
  GROUP BY a.vec_id, a.cent_id, b.cent_id
), ab AS (
  SELECT vec_id, own,
         MIN(CASE WHEN other = own
                  THEN CAST(CAST(sd AS VARCHAR) AS DOUBLE) / n END) AS a_i,
         MIN(CASE WHEN other != own
                  THEN CAST(CAST(sd AS VARCHAR) AS DOUBLE) / n END) AS b_i
  FROM pair_sums GROUP BY vec_id, own
), sil AS (
  SELECT vec_id, own,
         CAST(round(CASE WHEN a_i IS NULL THEN 0.0
              ELSE (b_i - a_i) / GREATEST(a_i, b_i) END, 9) AS DECIMAL(12,9))
           AS s
  FROM ab
)
SELECT own AS cent_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       round(CAST(CAST(SUM(s) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
         AS mean_silhouette,
       round(MIN(CAST(s AS DOUBLE)), 6) AS min_silhouette
FROM sil GROUP BY own ORDER BY own
""",
    description="Silhouette score of the k-means partition "
    "(sim_kmeans_assign's exact assignment): per point the classic "
    "s = (b − a)/max(a, b) with a = mean distance to own-cluster "
    "peers and b = the best other cluster's mean distance, summarized "
    "per cluster — INTERNAL clustering validity, the metric that "
    "works when no labels exist (sim_cluster_purity needs labels; a "
    "low-silhouette cluster is one the IVF index should split). "
    "Distances are rounded to 9 dp and folded through DECIMAL sums "
    "so per-(point, cluster) means are partition-order-independent; "
    "singleton clusters get s = 0 by convention. Shape: the pairwise "
    "stage aggregates straight to (point, cluster) partial sums — "
    "k rows per point, not n — so the shuffle after the self-join "
    "carries O(n·k), and at 100 TB the same statistic is computed "
    "against per-cluster centroids/sums (simplified silhouette) "
    "without the quadratic stage.",
    tags=("llm", "similarity", "eval"),
)
def sim_silhouette_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    e = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("vec_id") < _SIL_K).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    d = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cent_id", "v", d.alias("d"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d", "cent_id")).alias("m"), F.first("v").alias("v"))
        .select("vec_id", F.col("m.cent_id").alias("cent_id"), "v")
        .localCheckpoint()
    )
    a, b = assigned.alias("a"), F.broadcast(assigned.alias("b"))
    pd = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ),
        9,
    ).cast("decimal(16,9)")
    pair_sums = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .groupBy(
            F.col("a.vec_id").alias("vec_id"),
            F.col("a.cent_id").alias("own"),
            F.col("b.cent_id").alias("other"),
        )
        .agg(F.sum(pd).alias("sd"), F.count(F.lit(1)).alias("n"))
    )
    mean_d = F.col("sd").cast("double") / F.col("n")
    ab = pair_sums.groupBy("vec_id", "own").agg(
        F.min(F.when(F.col("other") == F.col("own"), mean_d)).alias("a_i"),
        F.min(F.when(F.col("other") != F.col("own"), mean_d)).alias("b_i"),
    )
    s = (
        F.when(F.col("a_i").isNull(), F.lit(0.0))
        .otherwise(
            (F.col("b_i") - F.col("a_i")) / F.greatest(F.col("a_i"), F.col("b_i"))
        )
    )
    sil = ab.select(
        "own", F.round(s, 9).cast("decimal(12,9)").alias("s")
    )
    return (
        sil.groupBy(F.col("own").alias("cent_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(
                F.sum("s").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_silhouette"),
            F.round(F.min(F.col("s").cast("double")), 6).alias("min_silhouette"),
        )
        
    )
