"""Thirty-third wave: label-propagation community detection (the
synchronous LPA variant with a total tie order, unrolled into a
materialized-CTE oracle like graph_kcore_peel) and the SQL PIVOT clause
through the literal SQL front-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm13 import EDGES_SQL
from news_ingestion_data_pipeline_spark.plans.llm26 import _copresence_edges
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_LPA_ROUNDS = 4


def _lpa_oracle() -> str:
    ctes = [
        """und AS MATERIALIZED (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
), nodes AS MATERIALIZED (
  SELECT DISTINCT u FROM und
), l0 AS MATERIALIZED (
  SELECT u, u AS lbl FROM nodes
)"""
    ]
    for r in range(1, _LPA_ROUNDS + 1):
        p = r - 1
        ctes.append(
            f"""c{r} AS MATERIALIZED (
  SELECT e.u, l.lbl, COUNT(*) AS c
  FROM und e JOIN l{p} l ON l.u = e.v
  GROUP BY e.u, l.lbl
), p{r} AS MATERIALIZED (
  SELECT u, lbl,
         ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rk
  FROM c{r}
), l{r} AS MATERIALIZED (
  SELECT n.u, COALESCE(p.lbl, n.u) AS lbl
  FROM nodes n LEFT JOIN (SELECT u, lbl FROM p{r} WHERE rk = 1) p
    ON p.u = n.u
)"""
        )
    return f"""
WITH {EDGES_SQL},
{','.join(ctes)}
SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_members
FROM l{_LPA_ROUNDS}
GROUP BY lbl
HAVING COUNT(*) >= 2
ORDER BY n_members DESC, community
"""


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle(),
    description="Community detection by synchronous label propagation "
    "over the shared co-presence graph: every node starts as its own "
    "label; each round, every node adopts the most frequent label among "
    f"its neighbors (ties broken by smallest label — a TOTAL order, so "
    "the notoriously nondeterministic LPA becomes exactly reproducible "
    f"and oracle-checkable), {_LPA_ROUNDS} fixed synchronous rounds. "
    "Output is the >=2-member community size histogram. Per round: one "
    "hash join of the edge list against the label map (shuffle on the "
    "neighbor key), one (node, label) count aggregate, one argmax "
    "window partitioned by node — all hash-partitioned by node id, no "
    "global sort; lineage truncated per round via localCheckpoint like "
    "dedup_connected_clusters. The fixed unroll is what the generated "
    "materialized-CTE oracle mirrors (graph_kcore_peel precedent).",
    tags=("graph", "events", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copresence_edges(spark, sf_dir).localCheckpoint()
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    nodes = und.select("u").distinct().localCheckpoint()
    labels = nodes.select("u", F.col("u").alias("lbl"))
    # Per-round lineage break: although each round's label map is consumed
    # exactly once by the next round, the fully unrolled 4-round plan is
    # slower than the checkpointed form (r11 tried the unroll: min-of-3
    # went 2.44 -> 3.78 s and the query ran FASTER on 8 cores than 32 —
    # optimizer/AQE replanning over the deeply nested plan dominates, and
    # more cores schedule more tiny stages). The per-round checkpoint keeps
    # every round a small plan over ExistingRDDs.
    for r in range(1, _LPA_ROUNDS + 1):
        nb = und.join(
            labels.withColumnRenamed("u", "nu"), F.col("v") == F.col("nu")
        ).select("u", "lbl")
        # (An explicit repartition("u") here to share one exchange between
        # the two aggregates was measured at 3.61 s vs 3.31 s without: it
        # ships raw nb rows where the aggregate's own exchange ships
        # map-side partial counts.)
        counts = nb.groupBy("u", "lbl").agg(F.count(F.lit(1)).alias("c"))
        # argmax with (count desc, label asc) total tie order, as a
        # max-struct aggregate (no window needed)
        pick = counts.groupBy("u").agg(
            F.max(
                F.struct(F.col("c").alias("c"), (-F.col("lbl")).alias("neg"))
            ).alias("m")
        ).select("u", (-F.col("m.neg")).alias("new_lbl"))
        # The oracle's LEFT JOIN against nodes is an identity here: und is
        # symmetric and labels always covers every node, so every und row
        # finds a neighbor label and pick's key domain IS nodes — the
        # coalesce can never fire. Skipping the join saves one join +
        # exchange per round (rows identical by construction).
        labels = pick.select("u", F.col("new_lbl").alias("lbl"))
        if r < _LPA_ROUNDS:
            # Last round flows straight into the histogram aggregate (no
            # consumer needs the final map twice), so its checkpoint is
            # skipped. A 2-round super-round cadence was also measured:
            # 4.58 s vs 3.49 s per-round in the same r12 quiet window.
            labels = labels.localCheckpoint()
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
        .where(F.col("n_members") >= 2)
        
    )


@register(
    "sql_pivot_clause",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS VARCHAR) AS DOUBLE) AS urgent,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS VARCHAR) AS DOUBLE) AS high,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS VARCHAR) AS DOUBLE) AS medium,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS VARCHAR) AS DOUBLE) AS notspec,
       CAST(CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS VARCHAR) AS DOUBLE) AS low
FROM orders
GROUP BY 1
ORDER BY order_year
""",
    description="The SQL PIVOT clause through the literal spark.sql "
    "front-end (the ANSI-adjacent syntax users migrate in with), "
    "rotating order priority onto columns with decimal-exact sums per "
    "year — same rotation as agg_pivot but exercised as SQL text, "
    "proving the front-end parses PIVOT ... FOR ... IN with aliased "
    "literal values. Catalyst rewrites PIVOT into the identical "
    "conditional-aggregate plan the oracle states explicitly (one hash "
    "aggregate, no join), so the syntax costs nothing at 100 TB.",
    tags=("sql", "agg"),
)
def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT year(o_orderdate) AS order_year,
                 o_orderpriority,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price
          FROM orders_pv
        )
        PIVOT (
          CAST(CAST(SUM(price) AS STRING) AS DOUBLE)
          FOR o_orderpriority IN (
            '1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium,
            '4-NOT SPECIFIED' AS notspec, '5-LOW' AS low
          )
        )
        ORDER BY order_year
        """
    )
