"""operators/ranking.py — the distributed global-rank decomposition must
be BIT-IDENTICAL to Spark's own single-partition window functions, since
registered queries substitute one for the other."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators.ranking import (
    distributed_row_number,
    ntile_from_rank,
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
