"""Distributed total-order ranking without a single-partition sort.

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row through
ONE task — the classic small-SF stand-in that dies at 100 TB. The helper
here is the general two-pass decomposition already proven in
``agg_percentile_ranks`` (plans/relational_ext4.py): bucket rows by a
coarse monotone key, hash-aggregate per-bucket counts (map-side partials,
fully parallel), turn the tiny bucket histogram into prefix offsets with
one driver-scale cumulative window, then rank WITHIN each bucket in
parallel and add the offset. Parallelism = number of buckets; no task
ever holds more than one bucket.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_row_number(
    df: DataFrame,
    order_cols: Sequence,
    bucket: Column,
    out: str = "rn",
) -> DataFrame:
    """Add a 1-based global ROW_NUMBER() by ``order_cols`` — computed as
    per-bucket local rank + broadcast prefix offset, never a global sort.

    ``bucket`` must be coarse-monotone in the ordering: whenever
    ``bucket(r1) < bucket(r2)``, row r1 must order before r2 (ties in
    bucket are broken by the in-bucket sort on the full ``order_cols``).
    In practice: derive ``bucket`` from a range-quantization of the FIRST
    order column, so equal first-key values always share a bucket.

    Pass 1 is one hash aggregate over the bucket key; the cumulative
    offset window runs over only ``n_buckets`` rows (histogram-sized, a
    deliberate driver-scale structure, same as agg_percentile_ranks'
    boundary scan). Pass 2 is a window partitioned BY bucket — each task
    sorts ~n/n_buckets rows. Scaling = raise the bucket count.
    """
    # coalesce to a non-nullable bucket: the inner offset-join would
    # otherwise infer isnotnull(__rnk_b), and that filter gets pushed
    # down INTO an upstream BroadcastNestedLoopJoin condition where the
    # whole bucket expression is re-evaluated per row interpreted (not
    # codegen) — measured 8 s on a 600k-row Morton-code bucket vs ~1 s
    # without. Non-nullable keys also mean no row is silently dropped.
    b = df.withColumn("__rnk_b", F.coalesce(bucket.cast("long"), F.lit(-1)))
    counts = b.groupBy("__rnk_b").agg(F.count(F.lit(1)).alias("__rnk_c"))
    wcum = Window.orderBy("__rnk_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__rnk_b",
        F.coalesce(F.sum("__rnk_c").over(wcum), F.lit(0)).alias("__rnk_off"),
    )
    wloc = Window.partitionBy("__rnk_b").orderBy(*order_cols)
    return (
        b.join(F.broadcast(offsets), "__rnk_b")
        .withColumn(
            out,
            (F.row_number().over(wloc) + F.col("__rnk_off")).cast("long"),
        )
        .drop("__rnk_b", "__rnk_off")
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL NTILE(k) from a 1-based global rank and the total row count —
    the first ``n % k`` tiles get ``n/k + 1`` rows, the rest ``n/k``
    (exactly the ANSI window-function distribution, so results are
    bit-identical to ``ntile() OVER (ORDER BY ...)`` at any scale)."""
    q = (n / k).cast("long")
    rem = n - q * k
    big = rem * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(rem + ((rank - 1 - big) / q).cast("long") + 1)
        .cast("int")
    )
