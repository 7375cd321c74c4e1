"""operators/ranking.py — the distributed global-rank decomposition must
be BIT-IDENTICAL to Spark's own single-partition window functions, since
registered queries substitute one for the other."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators.ranking import (
    distributed_avg_rank,
    distributed_prefix_max,
    distributed_prefix_sum,
    distributed_row_number,
    ntile_from_rank,
    range_bucket,
)


def _df(spark, vals):
    return spark.createDataFrame(
        [Row(i=i, v=v) for i, v in enumerate(vals)]
    )


@pytest.mark.parametrize(
    "vals",
    [
        [5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 3.0, 0.0],  # ties on v
        [1.0] * 7,  # ALL ties — one bucket, in-bucket sort decides
        [float(x) for x in range(40)],
        [2.5],
    ],
)
def test_distributed_row_number_equals_global_window(spark, vals):
    df = _df(spark, vals)
    bucket = F.floor(F.col("v"))  # coarse-monotone in v
    got = {
        r.i: r.rn
        for r in distributed_row_number(df, ["v", "i"], bucket).collect()
    }
    want = {
        r.i: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "i"))
        ).collect()
    }
    assert got == want


def test_null_bucket_rows_rank_first_not_dropped(spark):
    """A NULL bucket key must not silently drop rows (the inner offset
    join would) — the helper coalesces to -1, ranking them first."""
    df = spark.createDataFrame(
        [Row(i=0, v=None), Row(i=1, v=2.0), Row(i=2, v=1.0)]
    )
    out = distributed_row_number(
        df, [F.col("v").asc_nulls_first(), "i"], F.floor(F.col("v"))
    ).collect()
    assert len(out) == 3
    assert {r.i: r.rn for r in out} == {0: 1, 2: 2, 1: 3}


@pytest.mark.parametrize("n,k", [(8, 3), (40, 10), (2, 5), (10, 10), (1, 4)])
def test_ntile_from_rank_matches_ansi_ntile(spark, n, k):
    df = spark.range(n).select(F.col("id").alias("v"))
    want = {
        r.v: r.tile
        for r in df.withColumn(
            "tile", F.ntile(k).over(Window.orderBy("v"))
        ).collect()
    }
    got = {
        r.v: r.tile
        for r in df.select(
            "v",
            ntile_from_rank(
                F.row_number().over(Window.orderBy("v")), F.lit(n), k
            ).alias("tile"),
        ).collect()
    }
    assert got == want

@pytest.mark.parametrize(
    "vals",
    [
        [5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 3.0, 0.0],
        [1.0] * 7,
        [float(x) for x in range(40)],
        [2.5],
    ],
)
@pytest.mark.parametrize("inclusive", [True, False])
def test_distributed_prefix_sum_equals_global_window(spark, vals, inclusive):
    df = _df(spark, vals)
    hi = Window.currentRow if inclusive else -1
    w = Window.orderBy("v", "i").rowsBetween(Window.unboundedPreceding, hi)
    want = {
        r.i: r.cum
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    got = {
        r.i: r.cum_v
        for r in distributed_prefix_sum(
            df, ["v", "i"], F.floor(F.col("v")), ["v"], inclusive=inclusive
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    "vals",
    [
        [5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 3.0, 0.0],
        [9.0, 8.0, 7.0, 1.0],  # strictly decreasing: running max = first
        [1.0] * 5,
    ],
)
def test_distributed_prefix_max_equals_global_window(spark, vals):
    """Running max in ARRIVAL (i) order over strictly-preceding rows —
    the events_out_of_order_profile shape; first row must be NULL."""
    df = _df(spark, vals)
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.i: r.mx for r in df.withColumn("mx", F.max("v").over(w)).collect()
    }
    got = {
        r.i: r.mx
        for r in distributed_prefix_max(
            df, ["i"], F.floor(F.col("i") / 3), "v", out="mx"
        ).collect()
    }
    assert got == want
    assert got[0] is None


@pytest.mark.parametrize(
    "vals",
    [
        [5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 3.0, 0.0],  # ties -> .5 steps
        [1.0] * 7,  # all tied: avg rank (n+1)/2 for everyone
        [float(x) for x in range(25)],
    ],
)
def test_distributed_avg_rank_matches_window_tie_average(spark, vals):
    """avg_rank(v) must equal rank() + (count(v)-1)/2 as DECIMAL(18,1) —
    the Wilcoxon/Kruskal-Wallis tie-averaging recipe."""
    df = _df(spark, vals)
    want = {
        r.v: r.r
        for r in df.select(
            "v",
            (
                F.rank().over(Window.orderBy("v"))
                + (F.count(F.lit(1)).over(Window.partitionBy("v")) - 1) / 2.0
            )
            .cast("decimal(18,1)")
            .alias("r"),
        )
        .distinct()
        .collect()
    }
    got = {
        r.v: r.r
        for r in distributed_avg_rank(
            df, "v", F.floor(F.col("v")), out="r"
        ).collect()
    }
    assert got == want


def test_distributed_avg_rank_cnt_column(spark):
    out = {
        r.v: r.c
        for r in distributed_avg_rank(
            _df(spark, [3.0, 3.0, 1.0]), "v", F.floor(F.col("v")), cnt="c"
        ).collect()
    }
    assert out == {1.0: 1, 3.0: 2}


def test_range_bucket_monotone_and_bounded(spark):
    """Buckets are in [0, n-1], non-decreasing in the value, equal for
    equal values, and degrade to ONE bucket when the envelope is flat."""
    df = spark.createDataFrame(
        [Row(v=float(x)) for x in [0, 1, 1, 5, 99, 100]]
    )
    env = df.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    rows = (
        df.crossJoin(F.broadcast(env))
        .select(
            "v", range_bucket(F.col("v"), F.col("lo"), F.col("hi"), 8).alias("b")
        )
        .orderBy("v")
        .collect()
    )
    bs = [r.b for r in rows]
    assert all(0 <= b <= 7 for b in bs)
    assert bs == sorted(bs)
    assert bs[1] == bs[2]  # equal values share a bucket
    flat = spark.createDataFrame([Row(v=4.0), Row(v=4.0)])
    fenv = flat.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    fb = (
        flat.crossJoin(F.broadcast(fenv))
        .select(range_bucket(F.col("v"), F.col("lo"), F.col("hi")).alias("b"))
        .collect()
    )
    assert {r.b for r in fb} == {0}
