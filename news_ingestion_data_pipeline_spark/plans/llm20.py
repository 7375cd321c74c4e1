"""Twentieth wave: market-basket association rules — pairwise frequent
itemsets with support, confidence, and lift over orders-as-baskets —
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MIN_PAIR_ORDERS = 3


@register(
    "orders_basket_association",
    oracle=f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_orders AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n FROM basket
), item AS (
  SELECT l_partkey, COUNT(*) AS c FROM basket GROUP BY l_partkey
), pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS c_ab
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_MIN_PAIR_ORDERS}
)
SELECT p.part_a, p.part_b, p.c_ab AS n_both,
       round(CAST(p.c_ab AS DOUBLE) / n.n, 6) AS support,
       round(CAST(p.c_ab AS DOUBLE) / ia.c, 6) AS confidence_a_to_b,
       round(CAST(p.c_ab AS DOUBLE) * n.n / (ia.c * ib.c), 6) AS lift
FROM pair p
JOIN item ia ON ia.l_partkey = p.part_a
JOIN item ib ON ib.l_partkey = p.part_b
CROSS JOIN n_orders n
ORDER BY lift DESC, part_a, part_b
LIMIT 50
""",
    description="Market-basket association rules (the apriori first "
    "pass): treating each order as a basket of distinct parts, count "
    "pair co-occurrence via a per-basket self-join — fan-out bounded by "
    "basket size squared (~4-7 items per TPC-H-ish order), NOT corpus "
    "size, which is why pairwise counting scales where general itemset "
    "lattices don't — then support (share of baskets), directional "
    "confidence P(b|a), and lift (observed/expected under independence, "
    "the signal that survives popularity bias). A min-co-occurrence "
    "floor mirrors apriori's support pruning. All counts are integers "
    "until three final IEEE divisions; top-50 by (lift, pair) total "
    "order. At 100 TB: one (order) shuffle for the self-join, one "
    "(pair) aggregate, item counts broadcast back.",
    tags=("agg", "basket", "events"),
)
def orders_basket_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    basket = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint()  # three consumers
    )
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    item = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _MIN_PAIR_ORDERS)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    out = (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("c_ab").alias("n_both"),
            F.round(F.col("c_ab").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            F.round(F.col("c_ab").cast("double") / F.col("ca"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("lift"), "part_a", "part_b").limit(50)
