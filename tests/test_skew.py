"""Salted-join / salted-agg equivalence: the skew rewrites must be
row-for-row identical to their unsalted forms (operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import skew
from tests.conftest import SF_SMOKE


def _li(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


def _orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )


def test_salted_join_equals_plain_inner(spark):
    li, orders = _li(spark), _orders(spark)
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    salted = skew.salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        salt_from=["l_linenumber", "l_partkey"], n_salt=4,
    )
    assert salted.count() == plain.count()
    cols = ["l_orderkey", "l_linenumber", "o_orderpriority"]
    assert salted.select(cols).exceptAll(plain.select(cols)).count() == 0
    assert plain.select(cols).exceptAll(salted.select(cols)).count() == 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    li = _li(spark)
    # restrict the small side so some big-side rows are unmatched
    orders = _orders(spark).filter(F.col("o_orderkey") % 2 == 0)
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_outer")
    salted = skew.salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        salt_from=["l_linenumber", "l_partkey"], n_salt=4, how="left_outer",
    )
    assert salted.count() == plain.count()
    nulls_plain = plain.filter(F.col("o_orderpriority").isNull()).count()
    nulls_salted = salted.filter(F.col("o_orderpriority").isNull()).count()
    assert nulls_salted == nulls_plain > 0


def test_salt_is_deterministic_and_bounded(spark):
    li = _li(spark)
    s1 = skew.with_salt(li, ["l_linenumber", "l_partkey"], 8)
    s2 = skew.with_salt(li, ["l_linenumber", "l_partkey"], 8)
    rng = s1.agg(F.min("_salt"), F.max("_salt")).collect()[0]
    assert 0 <= rng[0] and rng[1] <= 7
    # identical input row → identical salt, run to run (bag equality:
    # (l_orderkey, l_linenumber) is NOT unique in this corpus, so compare
    # whole multisets rather than self-joining on a pseudo-key)
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "_salt"]
    assert s1.select(cols).exceptAll(s2.select(cols)).count() == 0
    assert s2.select(cols).exceptAll(s1.select(cols)).count() == 0
    # the salt actually spreads rows: every salt value occupied
    assert s1.select("_salt").distinct().count() == 8


def test_salted_agg_equals_plain(spark):
    li = _li(spark)
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    salted = skew.salted_sum_count(
        li,
        group_keys=["l_returnflag"],
        sum_cols={"sum_qty": F.col("l_quantity").cast("decimal(18,2)")},
        salt_from=["l_orderkey", "l_linenumber"],
        n_salt=4,
    ).collect()
    assert {(r.l_returnflag, r.sum_qty, r.n_rows) for r in plain} == {
        (r.l_returnflag, r.sum_qty, r.n_rows) for r in salted
    }


def test_connected_components_chain_star_pair(spark):
    """Chain 1-2-3-4-5 (diameter forces >1 round), star 10-(11,12,13),
    isolated pair 20-21: every node labels with its component's min id."""
    from news_ingestion_data_pipeline_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {(r.node, r.comp) for r in connected_components(edges).collect()}
    want = {(n, 1) for n in [1, 2, 3, 4, 5]}
    want |= {(n, 10) for n in [10, 11, 12, 13]}
    want |= {(20, 20), (21, 20)}
    assert got == want
