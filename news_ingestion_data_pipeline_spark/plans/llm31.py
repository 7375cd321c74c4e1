"""Thirty-first wave: k-core decomposition by iterative peeling over
the shared co-presence graph — the classic iterative-subgraph operator
(community cores, spam-ring detection, graph sparsification). The
oracle is an unrolled CTE chain generated term-for-term from the same
peel rule, the precedent set by graph_pagerank_transitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.llm26 import _copresence_edges
from news_ingestion_data_pipeline_spark.plans.registry import register

_K = 2  # peel threshold: the 2-core (nodes on at least one cycle)
_ROUNDS = 8  # fixed unroll depth; convergence asserted in tests


def _kcore_oracle() -> str:
    # every round CTE is MATERIALIZED: each e{{r}} is referenced three
    # times by round r+1, so without materialization the inlined tree
    # grows 3^rounds and DuckDB re-opens the parquet exponentially often
    ctes = [
        "e0 AS MATERIALIZED (SELECT u, v FROM edges)",
    ]
    for r in range(1, _ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""d{r} AS MATERIALIZED (
  SELECT u, COUNT(*) AS deg FROM (
    SELECT u, v FROM e{p} UNION ALL SELECT v, u FROM e{p}
  ) GROUP BY u HAVING COUNT(*) >= {_K}
), e{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{p} e
  JOIN d{r} a ON a.u = e.u
  JOIN d{r} b ON b.u = e.v
)"""
        )
    return f"""
WITH {EDGES_SQL},
{','.join(ctes)}
SELECT u AS user_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM (SELECT u, v FROM e{_ROUNDS} UNION ALL SELECT v, u FROM e{_ROUNDS})
GROUP BY u
ORDER BY user_id
"""


@register(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    description=f"{_K}-core decomposition by synchronous peeling: "
    f"repeatedly drop every node whose degree in the surviving subgraph "
    f"is < {_K}, keeping only edges whose BOTH endpoints survive — "
    f"{_ROUNDS} fixed rounds (the operator contract; convergence at "
    "this depth is asserted by tests, and the fixed unroll is what "
    "makes the oracle expressible as a generated CTE chain, the "
    "graph_pagerank_transitions precedent). Output is each surviving "
    "node with its final core degree — the 2-core is exactly the nodes "
    "lying on a cycle, the backbone communities form around. Physical "
    "shape per round: one degree hash-aggregate + two semi-join-shaped "
    "hash joins back onto the edge list; lineage is truncated with "
    "localCheckpoint every few rounds exactly like "
    "dedup_connected_clusters' pointer-jumping loop, so the plan depth "
    "stays bounded at 100 TB.",
    tags=("graph", "events", "iterative"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the (expensive) edge construction ONCE — every peel
    # round references the previous round twice, so without truncation
    # the wedge self-join would be recomputed O(rounds) times
    e = _copresence_edges(spark, sf_dir).localCheckpoint()
    n_edges = e.count()
    for r in range(1, _ROUNDS + 1):
        und = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        alive = (
            und.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= _K)
            .select("u")
        )
        e = (
            e.join(alive.withColumnRenamed("u", "au"), F.col("u") == F.col("au"))
            .drop("au")
            .join(alive.withColumnRenamed("u", "bv"), F.col("v") == F.col("bv"))
            .drop("bv")
        )
        # truncate lineage each round (the frame shrinks monotonically)
        # and stop at the fixpoint: a round that removes no edge makes
        # every later round a no-op, so the early exit is result-
        # identical to the full unroll the oracle runs
        e = e.localCheckpoint()
        n_now = e.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return (
        und.groupBy(F.col("u").alias("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        
    )
