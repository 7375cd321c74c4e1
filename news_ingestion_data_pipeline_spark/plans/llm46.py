"""Forty-sixth wave: apriori level 2 — frequent triples generated from
frequent pairs with the apriori candidate-pruning step, the part of the
algorithm orders_basket_association (level 1) doesn't show.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MIN2 = 2  # pair support for candidate generation
_MIN3 = 2  # triple support
_TOP = 20


@register(
    "orders_basket_triples",
    oracle=f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_orders AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n FROM basket
), pair AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y, COUNT(*) AS c
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MIN2}
), cand AS (
  -- apriori join: two frequent pairs sharing the first item ...
  SELECT p1.x, p1.y, p2.y AS z
  FROM pair p1 JOIN pair p2 ON p2.x = p1.x AND p2.y > p1.y
  -- ... pruned by the third sub-pair's frequency
  WHERE EXISTS (SELECT 1 FROM pair p3
                WHERE p3.x = p1.y AND p3.y = p2.y)
), tri AS (
  SELECT c.x, c.y, c.z, COUNT(*) AS n_orders_with_all
  FROM cand c
  JOIN basket a ON a.l_partkey = c.x
  JOIN basket b ON b.l_orderkey = a.l_orderkey AND b.l_partkey = c.y
  JOIN basket d ON d.l_orderkey = a.l_orderkey AND d.l_partkey = c.z
  GROUP BY c.x, c.y, c.z
  HAVING COUNT(*) >= {_MIN3}
)
SELECT x AS part_a, y AS part_b, z AS part_c,
       CAST(n_orders_with_all AS BIGINT) AS n_orders_with_all,
       round(CAST(n_orders_with_all AS DOUBLE) / n.n, 6) AS support
FROM tri CROSS JOIN n_orders n
ORDER BY n_orders_with_all DESC, part_a, part_b, part_c
LIMIT {_TOP}
""",
    description="Frequent triples by true apriori level 2: candidate "
    "(a,b,c) itemsets are generated ONLY by joining frequent pairs "
    "(a,b)x(a,c) and pruned unless the third sub-pair (b,c) is also "
    "frequent — the downward-closure step that keeps level-k candidate "
    "counts polynomial where a naive 3-way basket self-join explodes; "
    "the surviving candidates (a handful) are then counted exactly "
    "against the baskets. This is the iteration "
    "orders_basket_association (level 1) feeds; at 100 TB the "
    "candidate table stays broadcast-sized BECAUSE of the pruning, so "
    "each level costs one broadcast join over baskets. All counts "
    "integer-exact; support is one division.",
    tags=("agg", "events", "iterative"),
)
def orders_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    basket = (
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _MIN2)
        .select("x", "y")
    )
    p1, p2 = pair.alias("p1"), pair.alias("p2")
    cand = (
        p1.join(
            p2,
            (F.col("p2.x") == F.col("p1.x")) & (F.col("p2.y") > F.col("p1.y")),
        )
        .select(
            F.col("p1.x").alias("x"),
            F.col("p1.y").alias("y"),
            F.col("p2.y").alias("z"),
        )
        .join(
            pair.select(F.col("x").alias("y"), F.col("y").alias("z")),
            ["y", "z"],
            "left_semi",
        )
    )
    ba, bb, bd = basket.alias("ba"), basket.alias("bb"), basket.alias("bd")
    tri = (
        # bcast-ok: support-thresholded frequent-pair candidates (c >= MIN2
        # bounds the frame to the frequent-itemset lattice, not the corpus)
        F.broadcast(cand)
        .join(ba, F.col("ba.l_partkey") == F.col("x"))
        .join(
            bb,
            (F.col("bb.l_orderkey") == F.col("ba.l_orderkey"))
            & (F.col("bb.l_partkey") == F.col("y")),
        )
        .join(
            bd,
            (F.col("bd.l_orderkey") == F.col("ba.l_orderkey"))
            & (F.col("bd.l_partkey") == F.col("z")),
        )
        .groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).alias("n_orders_with_all"))
        .where(F.col("n_orders_with_all") >= _MIN3)
    )
    return (
        tri.crossJoin(F.broadcast(n_orders))
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            F.col("z").alias("part_c"),
            F.col("n_orders_with_all").cast("bigint").alias("n_orders_with_all"),
            F.round(
                F.col("n_orders_with_all").cast("double") / F.col("n"), 6
            ).alias("support"),
        )
        .orderBy(F.desc("n_orders_with_all"), "part_a", "part_b", "part_c")
        .limit(_TOP)
    )
