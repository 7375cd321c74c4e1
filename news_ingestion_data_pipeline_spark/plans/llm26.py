"""Twenty-sixth wave: per-node clustering coefficient on the shared
co-presence graph, cluster-quality metrics (purity of the seeded k-means
partition against ground-truth labels), and the cume_dist/percent_rank
pair that completes the window-function surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.llm2 import _sqdist_sql
from news_ingestion_data_pipeline_spark.plans.registry import register, t


def _copresence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared co-presence graph (same construction as
    graph_triangle_count / graph_link_prediction): users seen in the same
    (event_type, 10-min bucket) at least twice, buckets capped at 30
    users so one viral bucket can't go quadratic."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 600000000").alias("bkt"),
        "user_id",
    )
    presence = ev.distinct()
    sized = (
        presence.groupBy("event_type", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= 30)
        .select("event_type", "bkt")
    )
    p = presence.join(sized, ["event_type", "bkt"])
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("u", "v")
    )


@register(
    "graph_clustering_coeff",
    oracle=f"""
WITH {EDGES_SQL},
und AS (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
), deg AS (
  SELECT u, COUNT(*) AS d FROM und GROUP BY u
), wedges AS (
  SELECT a.u AS center, a.v AS x, b.v AS y
  FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
), tri AS (
  SELECT w.center, COUNT(*) AS n_tri
  FROM wedges w JOIN edges e ON e.u = w.x AND e.v = w.y
  GROUP BY w.center
)
SELECT deg.u AS user_id,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(COALESCE(tri.n_tri, 0) AS BIGINT) AS triangles,
       round(2.0 * COALESCE(tri.n_tri, 0) / (deg.d * (deg.d - 1)), 6)
         AS clustering_coeff
FROM deg LEFT JOIN tri ON tri.center = deg.u
WHERE deg.d >= 2
ORDER BY user_id
""",
    description="Local clustering coefficient per node — the fraction of "
    "a user's neighbor pairs that are themselves connected, cc(u) = "
    "2*tri(u) / (d(u)*(d(u)-1)) — over the same skew-capped co-presence "
    "graph as graph_triangle_count. Triangles per NODE (not just the "
    "global count): enumerate each node's neighbor pairs with one "
    "self-join of the symmetrized edge list on the center (the wedge "
    "join, O(sum deg^2) bounded by the bucket cap), then close each "
    "wedge with an equi-join against the canonical u<v edge list. Both "
    "joins are hash equi-joins; degrees are one aggregate; no iteration. "
    "At 100 TB the wedge join's skew bound is the bucket cap — the same "
    "guard that makes the triangle count tractable.",
    tags=("graph", "events"),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pinned: the co-presence pair join feeds deg, BOTH wedge sides and
    # the triangle-closing probe — unpinned, the presence + pair-join
    # pipeline replayed once per consumer
    edges = _copresence_edges(spark, sf_dir).localCheckpoint()
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wa, wb = und.alias("wa"), und.alias("wb")
    wedges = wa.join(
        wb,
        (F.col("wa.u") == F.col("wb.u")) & (F.col("wa.v") < F.col("wb.v")),
    ).select(
        F.col("wa.u").alias("center"),
        F.col("wa.v").alias("x"),
        F.col("wb.v").alias("y"),
    )
    tri = (
        wedges.join(
            edges, (F.col("x") == F.col("u")) & (F.col("y") == F.col("v"))
        )
        .groupBy("center")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    return (
        deg.join(tri, deg["u"] == tri["center"], "left")
        .where(F.col("d") >= 2)
        .select(
            deg["u"].alias("user_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("bigint").alias("triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering_coeff"),
        )
        
    )


@register(
    "sim_cluster_purity",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
dists AS (
  SELECT e.vec_id, e.label, cent.cent_id,
         {_sqdist_sql('e.v', 'cent.cv', 64)} AS d
  FROM e CROSS JOIN cent
), assigned AS (
  SELECT vec_id, label, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
  FROM dists
), contingency AS (
  SELECT cent_id, label, COUNT(*) AS cnt
  FROM assigned WHERE rn = 1
  GROUP BY cent_id, label
), best AS (
  SELECT cent_id, label, cnt,
         SUM(cnt) OVER (PARTITION BY cent_id) AS n_assigned,
         ROW_NUMBER() OVER (PARTITION BY cent_id
                            ORDER BY cnt DESC, label) AS rk
  FROM contingency
)
SELECT cent_id,
       CAST(n_assigned AS BIGINT) AS n_assigned,
       CAST(label AS INT) AS majority_label,
       CAST(cnt AS BIGINT) AS n_majority,
       round(CAST(cnt AS DOUBLE) / n_assigned, 6) AS cluster_purity
FROM best WHERE rk = 1
ORDER BY cent_id
""",
    description="Cluster-quality audit: assign every embedding to its "
    "nearest of the 8 seeded centroids (identical deterministic "
    "assignment as sim_kmeans_assign — broadcast centroids, IEEE-ordered "
    "fold distance, (d, id) tie order) and score each cluster's PURITY "
    "against the ground-truth label column: majority label, its count, "
    "and majority/total. The contingency table is one hash aggregate on "
    "(cluster, label) — k x |labels| rows regardless of corpus size — so "
    "the quality audit costs one map-side-combinable pass over the "
    "assignments; this is how you validate an IVF partition or a "
    "semantic-dedup clustering before trusting it at 100 TB.",
    tags=("llm", "similarity", "stats"),
)
def sim_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    d = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "cent_id", d.alias("d")
    )
    assigned = dists.groupBy("vec_id", "label").agg(
        F.min(F.struct("d", "cent_id")).alias("m")
    )
    contingency = assigned.groupBy(
        F.col("m.cent_id").alias("cent_id"), "label"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wsum = Window.partitionBy("cent_id")
    wrk = Window.partitionBy("cent_id").orderBy(F.desc("cnt"), "label")
    best = contingency.select(
        "cent_id",
        "label",
        "cnt",
        F.sum("cnt").over(wsum).alias("n_assigned"),
        F.row_number().over(wrk).alias("rk"),
    )
    return (
        best.where(F.col("rk") == 1)
        .select(
            "cent_id",
            F.col("n_assigned").cast("bigint").alias("n_assigned"),
            F.col("label").cast("int").alias("majority_label"),
            F.col("cnt").cast("bigint").alias("n_majority"),
            F.round(F.col("cnt").cast("double") / F.col("n_assigned"), 6).alias(
                "cluster_purity"
            ),
        )
        
    )


@register(
    "window_cume_percent",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_quantity,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd
  FROM lineitem
  WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
)
SELECT DISTINCT l_returnflag,
       CAST(l_quantity AS DOUBLE) AS quantity,
       round(pr, 6) AS pct_rank,
       round(cd, 6) AS cume_dist
FROM ranked
ORDER BY l_returnflag, quantity
""",
    description="percent_rank + cume_dist — the two normalized-rank "
    "window functions (rank-1)/(n-1) and |rows <= current|/n — per "
    "return flag over lineitem quantity, collapsed to one row per "
    "distinct (flag, quantity) since ties share both values by "
    "definition. Completes the ranking-function surface next to "
    "rank/dense_rank/ntile (window_rank_dense, window_ntile_percent). "
    "One partitioned sort; the DISTINCT collapse is a hash aggregate on "
    "an already-partitioned stream, and at 100 TB the quantity domain "
    "(1..50) keeps the output constant-sized.",
    tags=("window",),
)
def window_cume_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
        .distinct()
        
    )
