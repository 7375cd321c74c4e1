"""Forty-ninth wave: physical-layout planning + community quality.

storage_partition_stats is the table-layout planner's core query — before
choosing a partition column for a 100 TB table you measure, per candidate
key, how many partitions it creates and how skewed they are (one hot
partition = one straggler executor).  graph_modularity closes the community
loop the graph waves opened: given a node partition, score it with Newman
modularity — the standard objective communities are judged by.

Reference parity note: the reference (~645 LoC scrape-ETL) has no layout
or graph stage; these extend the LLM-pipeline / analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.llm26 import _copresence_edges
from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# Partition-layout skew report
# ---------------------------------------------------------------------------

_PART_CANDIDATES_SQL = {
    "day(ts)": "strftime(ts, '%Y-%m-%d')",
    "event_type": "event_type",
    "user_id%256": "CAST(user_id % 256 AS VARCHAR)",
}


def _part_stats_sql(name: str, key_expr: str) -> str:
    return f"""
SELECT '{name}' AS candidate,
       CAST(COUNT(*) AS BIGINT) AS n_partitions,
       CAST(SUM(rows) AS BIGINT) AS total_rows,
       CAST(MAX(rows) AS BIGINT) AS max_rows,
       CAST(MIN(rows) AS BIGINT) AS min_rows,
       round(CAST(MAX(rows) AS DOUBLE)
             / (CAST(SUM(rows) AS DOUBLE) / COUNT(*)), 6) AS skew_ratio,
       round(sqrt(CAST(SUM(rows * rows) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(rows) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(rows) AS DOUBLE) / COUNT(*)))
             / (CAST(SUM(rows) AS DOUBLE) / COUNT(*)), 6) AS cv
FROM (SELECT {key_expr} AS k, COUNT(*) AS rows FROM events GROUP BY 1)"""


@register(
    "storage_partition_stats",
    oracle=" UNION ALL ".join(
        _part_stats_sql(n, e) for n, e in _PART_CANDIDATES_SQL.items()
    )
    + " ORDER BY candidate",
    description="Partition-layout planner: for each candidate partition "
    "key (event day, event type, a 256-way user-id bucket) report the "
    "partition count and the row-distribution shape — max/mean skew ratio "
    "and coefficient of variation from exact integer sums. This is the "
    "query you run BEFORE writing a 100 TB table: a key with few, huge, "
    "or skewed partitions (skew_ratio >> 1) turns every downstream scan "
    "into a straggler problem, while too many tiny partitions drown the "
    "driver in file metadata (the sibling failure storage_compact_small_"
    "files measures). Physical shape: one hash-aggregate per candidate "
    "(each a single shuffle of pre-combined partial counts) over a "
    "shared scan, then a 3-row union — cost is one pass regardless of "
    "candidate count.",
    tags=("storage", "layout", "agg"),
)
def storage_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    candidates = {
        "day(ts)": F.date_format("ts", "yyyy-MM-dd"),
        "event_type": F.col("event_type"),
        "user_id%256": (F.col("user_id") % 256).cast("string"),
    }
    outs = []
    for name, key in candidates.items():
        rows = ev.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("rows"))
        n = F.count(F.lit(1))
        total = F.sum("rows")
        mean = total.cast("double") / n
        var = (
            F.sum(F.col("rows") * F.col("rows")).cast("double") / n
            - mean * mean
        )
        outs.append(
            rows.agg(
                F.lit(name).alias("candidate"),
                n.cast("bigint").alias("n_partitions"),
                total.cast("bigint").alias("total_rows"),
                F.max("rows").cast("bigint").alias("max_rows"),
                F.min("rows").cast("bigint").alias("min_rows"),
                F.round(F.max("rows").cast("double") / mean, 6).alias("skew_ratio"),
                F.round(F.sqrt(var) / mean, 6).alias("cv"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Newman modularity of a community partition
# ---------------------------------------------------------------------------


@register(
    "graph_modularity",
    oracle=f"""
WITH {EDGES_SQL},
comm AS (
  SELECT user_id, event_type AS community FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM events GROUP BY user_id, event_type
  ) WHERE rn = 1
), m AS (SELECT COUNT(*) AS m FROM edges),
und AS (
  SELECT u AS node, v AS other FROM edges
  UNION ALL SELECT v AS node, u AS other FROM edges
), deg AS (
  SELECT node, COUNT(*) AS deg FROM und GROUP BY node
), node_comm AS (
  SELECT d.node, d.deg, c.community FROM deg d JOIN comm c ON c.user_id = d.node
), comm_deg AS (
  SELECT community, COUNT(*) AS n_nodes, SUM(deg) AS degree_sum
  FROM node_comm GROUP BY community
), internal AS (
  SELECT cu.community, COUNT(*) AS internal_edges
  FROM edges e
  JOIN comm cu ON cu.user_id = e.u
  JOIN comm cv ON cv.user_id = e.v
  WHERE cu.community = cv.community
  GROUP BY cu.community
)
SELECT cd.community,
       CAST(cd.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(i.internal_edges, 0) AS BIGINT) AS internal_edges,
       CAST(cd.degree_sum AS BIGINT) AS degree_sum,
       round(CAST(COALESCE(i.internal_edges, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
             - (CAST(cd.degree_sum AS DOUBLE) / CAST(2 * m.m AS DOUBLE))
               * (CAST(cd.degree_sum AS DOUBLE) / CAST(2 * m.m AS DOUBLE)), 6)
         AS q_contrib
FROM comm_deg cd
LEFT JOIN internal i ON i.community = cd.community
CROSS JOIN m
ORDER BY cd.community
""",
    description="Newman modularity of a community partition over the "
    "shared co-presence graph (same edge construction as graph_triangle_"
    "count / graph_kcore_peel): communities here are each user's modal "
    "event type ((count desc, type) total order — deterministic), and "
    "each community reports its size, internal edge count, degree mass "
    "and modularity contribution L_c/m − (D_c/2m)²; summing q_contrib "
    "gives the partition's Q, the objective label propagation and "
    "Louvain optimize. Everything until the final division is exact "
    "integer arithmetic, so the oracle certifies every edge "
    "classification. Physical shape: two broadcast-size hash joins of "
    "the edge list against the (node → community) map, one degree "
    "aggregate — at 100 TB the community map is the small side "
    "(|nodes| << |edges|) and ships to the edge partitions, never the "
    "reverse.",
    tags=("graph", "events"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copresence_edges(spark, sf_dir).localCheckpoint()
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type")
    )
    # pinned: the modal-event-type map is broadcast THREE times (degree
    # join + both internal-edge sides) — unpinned, each broadcast build
    # re-ran the events aggregate + rank window
    comm = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("community"))
        .localCheckpoint()
    )
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    und = edges.select(F.col("u").alias("node")).unionAll(
        edges.select(F.col("v").alias("node"))
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    node_comm = deg.join(
        F.broadcast(comm.withColumnRenamed("user_id", "node")), "node"
    )
    comm_deg = node_comm.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("deg").alias("degree_sum")
    )
    cu = comm.select(F.col("user_id").alias("u"), F.col("community").alias("cu"))
    cv = comm.select(F.col("user_id").alias("v"), F.col("community").alias("cv"))
    internal = (
        edges.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    ie = F.coalesce(F.col("internal_edges"), F.lit(0))
    dd = F.col("degree_sum").cast("double") / (F.lit(2) * F.col("m")).cast("double")
    return (
        comm_deg.join(internal, "community", "left_outer")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            ie.cast("bigint").alias("internal_edges"),
            F.col("degree_sum").cast("bigint").alias("degree_sum"),
            F.round(
                ie.cast("double") / F.col("m").cast("double") - dd * dd, 6
            ).alias("q_contrib"),
        )
        
    )
