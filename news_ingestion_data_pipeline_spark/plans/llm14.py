"""Fourteenth wave: multi-source BFS shortest-hop distances — the
last classic graph primitive (beside PageRank, connected components,
triangles, and link prediction): driver-iterated frontier expansion
with a WITH RECURSIVE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MAX_HOPS = 4


@register(
    "graph_bfs_distances",
    oracle=f"""
WITH RECURSIVE {EDGES_SQL},
und AS (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
), seeds AS (
  SELECT DISTINCT u FROM und WHERE u % 50 = 0
), walk(u, d) AS (
  SELECT u, 0 FROM seeds
  UNION
  SELECT e.v, w.d + 1
  FROM walk w JOIN und e ON e.u = w.u
  WHERE w.d < {_MAX_HOPS}
)
SELECT u AS user_id, MIN(d) AS dist
FROM walk GROUP BY u
ORDER BY user_id
""",
    description="Multi-source BFS over the co-presence graph: hop "
    "distance from the seed set (user_id % 50 == 0) out to "
    f"{_MAX_HOPS} hops — the reachability/latency primitive behind "
    "influence radius, blast-radius, and 'how far is every node from "
    "the trusted core' questions. Execution is the engine's iterative "
    "pattern (like connected components): a driver loop expands the "
    "frontier one layer per round — frontier JOIN edges, anti-join "
    "visited, localCheckpoint to truncate lineage — so rounds = graph "
    "diameter (capped), shuffles are frontier-sized, and the visited "
    "set only grows. The oracle is a WITH RECURSIVE walk capped at the "
    "same depth, collapsed by MIN(dist); layered BFS makes the result "
    "loop-order independent, so both derivations agree exactly.",
    tags=("graph", "events", "iterative"),
)
def graph_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    edges = (
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
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()  # probed once per BFS round

    visited = (
        und.select("u")
        .distinct()
        .filter(F.col("u") % 50 == 0)
        .select(F.col("u").alias("user_id"), F.lit(0).alias("dist"))
        .localCheckpoint()
    )
    frontier = visited
    for hop in range(1, _MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier.user_id == und.u)
            .select(F.col("v").alias("user_id"))
            .distinct()
            .join(visited, "user_id", "left_anti")
            .select("user_id", F.lit(hop).alias("dist"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited
