"""Hundred-forty-second wave: Wilcoxon signed-rank and harmonic
centrality.

  * agg_wilcoxon_signed_rank — the paired-samples test the family was
    missing (MWU is unpaired, McNemar is paired-binary): per customer,
    the URGENT-vs-LOW mean order-value difference; zero diffs drop,
    |diffs| get average ranks (ties → (first+last)/2, exact in .5
    steps), W+ = rank sum over positive diffs, plus the normal
    approximation z.  Every rank is integer window arithmetic and the
    .5 tie-ranks live in DECIMAL(18,1), so W+ is bit-exact.
  * graph_harmonic_centrality — closeness that tolerates disconnected
    graphs: sum of 1000 div d over nodes within 4 hops of each seed
    (integer milli-contributions, so the score is BIGINT-exact),
    computed from the BFS machinery's layered expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_wilcoxon_signed_rank",
    oracle="""
WITH per AS (
  SELECT o_custkey,
         SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS su,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS nu,
         SUM(CASE WHEN o_orderpriority = '5-LOW'
                  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS sl,
         SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS nl
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY o_custkey
),
diffs AS (
  SELECT o_custkey,
         CAST(CAST(su AS VARCHAR) AS DOUBLE) / nu
           - CAST(CAST(sl AS VARCHAR) AS DOUBLE) / nl AS d
  FROM per WHERE nu > 0 AND nl > 0
),
nz AS (SELECT o_custkey, d, abs(d) AS ad FROM diffs WHERE d <> 0),
ranked AS (
  SELECT o_custkey, d, ad,
         RANK() OVER (ORDER BY ad) AS rlo,
         COUNT(*) OVER (PARTITION BY ad) AS nties,
         RANK() OVER (ORDER BY ad) AS rfirst
  FROM nz
),
avgr AS (
  SELECT o_custkey, d,
         CAST(rfirst + (nties - 1) / 2.0 AS DECIMAL(18,1)) AS r
  FROM ranked
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(CAST(SUM(CASE WHEN d > 0 THEN r
                            ELSE CAST(0 AS DECIMAL(18,1)) END) AS VARCHAR)
              AS DOUBLE) AS w_plus
  FROM avgr
)
SELECT n_pairs, w_plus,
       (w_plus - n_pairs * (n_pairs + 1) / 4.0)
         / sqrt(n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) / 24.0) AS z
FROM s
""",
    description="Wilcoxon signed-rank test on paired per-customer means "
    "(URGENT vs LOW order value, customers with both): zero differences "
    "drop, |differences| take AVERAGE ranks computed exactly as "
    "first_rank + (ties-1)/2 — a .5-step rational held in DECIMAL(18,1), "
    "never a float — W+ sums the positive-side ranks in decimal, and the "
    "normal-approximation z uses the closed-form null moments. The "
    "paired continuous test MWU (unpaired) and McNemar (paired binary) "
    "don't cover. Per-customer means divide exact decimal sums once; "
    "the rank stage is the distributed tie-averaged rank MAP "
    "(operators/ranking.py: |d|-range buckets + broadcast prefix "
    "offsets) folded against the per-|d| sign counts — ranks never "
    "materialize per row and nothing single-partition-sorts.",
    tags=("agg", "stats"),
)
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = F.col("o_orderpriority") == "1-URGENT"
    per = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(urgent, F.col("o_totalprice").cast("decimal(18,2)"))
            ).alias("su"),
            F.sum(F.when(urgent, 1).otherwise(0)).alias("nu"),
            F.sum(
                F.when(~urgent, F.col("o_totalprice").cast("decimal(18,2)"))
            ).alias("sl"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("nl"),
        )
    )
    diffs = per.filter((F.col("nu") > 0) & (F.col("nl") > 0)).select(
        (
            F.col("su").cast("double") / F.col("nu")
            - F.col("sl").cast("double") / F.col("nl")
        ).alias("d")
    )
    nz = diffs.filter(F.col("d") != 0).select("d", F.abs("d").alias("ad"))
    env = nz.agg(F.min("ad").alias("alo"), F.max("ad").alias("ahi"))
    rmap = RK.distributed_avg_rank(
        nz.crossJoin(F.broadcast(env)),
        "ad",
        RK.range_bucket(F.col("ad"), F.col("alo"), F.col("ahi")),
        out="r",
    )
    h = nz.groupBy("ad").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.count(F.when(F.col("d") > 0, 1)).alias("c_pos"),
    )
    s = h.join(rmap, "ad").agg(
        F.coalesce(F.sum("c_all"), F.lit(0)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("c_pos") * F.col("r")).cast("double").alias("w_plus"),
    )
    n = F.col("n_pairs")
    return s.select(
        "n_pairs",
        "w_plus",
        (
            (F.col("w_plus") - n * (n + 1) / 4.0)
            / F.sqrt(n * (n + 1) * (2 * n + 1) / 24.0)
        ).alias("z"),
    )


_MAX_HOPS = 4


def _harmonic_oracle() -> str:
    return f"""WITH RECURSIVE {EDGES_SQL},
und AS (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
), seeds AS (
  SELECT DISTINCT u FROM und WHERE u % 50 = 0
), walk(seed, node, d) AS (
  SELECT u, u, 0 FROM seeds
  UNION
  SELECT w.seed, e.v, w.d + 1
  FROM walk w JOIN und e ON e.u = w.node
  WHERE w.d < {_MAX_HOPS}
),
dist AS (
  SELECT seed, node, MIN(d) AS d FROM walk GROUP BY seed, node
)
SELECT seed AS user_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       CAST(SUM(CASE WHEN d > 0 THEN 1000 // d ELSE 0 END) AS BIGINT)
         AS harmonic_milli
FROM dist
GROUP BY seed
ORDER BY user_id
"""


@register(
    "graph_harmonic_centrality",
    oracle=_harmonic_oracle(),
    description="Harmonic centrality (4-hop bounded) for the seed set "
    "(user_id % 50 == 0) over the co-presence graph: sum over reached "
    "nodes of 1000 div hop-distance — integer milli-contributions, so "
    "the score is BIGINT-exact and disconnected nodes contribute zero "
    "instead of breaking the mean (the flaw plain closeness has). "
    "Execution is per-seed layered BFS carried as (seed, node) state in "
    "one frontier loop — the multi-source generalization of "
    "graph_bfs_distances, state O(seeds × reached), each round one "
    "join + one min-aggregate with localCheckpoint truncation. The "
    "oracle is the recursive-walk replay collapsed by MIN(d).",
    tags=("graph", "events", "iterative"),
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 600000000").alias(
            "bkt"
        ),
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
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("u", "v")
    )
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()

    visited = (
        und.select("u")
        .distinct()
        .filter(F.col("u") % 50 == 0)
        .select(
            F.col("u").alias("seed"),
            F.col("u").alias("node"),
            F.lit(0).alias("d"),
        )
        .localCheckpoint()
    )
    frontier = visited
    for hop in range(1, _MAX_HOPS + 1):
        nxt = (
            frontier.join(und, frontier.node == und.u)
            .select("seed", F.col("v").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(hop).alias("d"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # no re-checkpoint: visited is a UNION of already-pinned per-hop
        # frontiers (narrow op over ExistingRDDs) — re-materializing the
        # whole visited set every hop copied O(reached) rows per hop and
        # paid one extra query submission per hop (r11 profile: 47 jobs)
        visited = visited.unionByName(nxt)
        frontier = nxt
    return (
        visited.groupBy(F.col("seed").alias("user_id"))
        .agg(
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
            F.sum(
                F.when(F.col("d") > 0, F.expr("1000 div d")).otherwise(0)
            )
            .cast("bigint")
            .alias("harmonic_milli"),
        )
        
    )
