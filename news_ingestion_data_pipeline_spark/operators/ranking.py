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


def range_bucket(col: Column, lo: Column, hi: Column, n: int = 256) -> Column:
    """Quantize ``col`` into ``n`` coarse-monotone range buckets given
    broadcast envelope columns ``lo``/``hi`` (the column's global
    min/max). Monotone non-decreasing in ``col`` (IEEE subtract /
    multiply / divide by positive constants and ``floor`` are all
    monotone, and equal inputs always share a bucket), so the result is
    a valid ``bucket`` for every two-pass helper in this module."""
    c = col.cast("double")
    span = hi.cast("double") - lo.cast("double")
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.greatest(
                F.floor((c - lo.cast("double")) * n / span), F.lit(0)
            ),
            F.lit(n - 1),
        )
    )


def distributed_prefix_sum(
    df: DataFrame,
    order_cols: Sequence,
    bucket: Column,
    val_cols: Sequence[str],
    inclusive: bool = True,
    prefix: str = "cum_",
) -> DataFrame:
    """Add a global running SUM of each ``val_cols`` entry in
    ``order_cols`` order — per-bucket partial sums plus a broadcast
    offset table, never a single-partition window. Same two-pass shape
    (and same ``bucket`` contract) as :func:`distributed_row_number`;
    exactness-preserving for decimal inputs (decimal sums are
    associative). ``inclusive`` picks running-total vs
    strictly-preceding semantics."""
    b = df.withColumn("__rnk_b", F.coalesce(bucket.cast("long"), F.lit(-1)))
    totals = b.groupBy("__rnk_b").agg(
        *[F.sum(c).alias(f"__rnk_t_{c}") for c in val_cols]
    )
    woff = Window.orderBy("__rnk_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__rnk_b",
        *[
            F.sum(f"__rnk_t_{c}").over(woff).alias(f"__rnk_off_{c}")
            for c in val_cols
        ],
    )
    hi = Window.currentRow if inclusive else -1
    wloc = (
        Window.partitionBy("__rnk_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    out = b.join(F.broadcast(offsets), "__rnk_b")
    for c in val_cols:
        local = F.sum(c).over(wloc)
        off = F.col(f"__rnk_off_{c}")
        out = out.withColumn(
            f"{prefix}{c}",
            F.when(
                off.isNull() & local.isNull(), F.lit(None)
            ).otherwise(
                F.coalesce(off, F.lit(0)) + F.coalesce(local, F.lit(0))
            ),
        )
    return out.drop("__rnk_b", *[f"__rnk_off_{c}" for c in val_cols])


def distributed_prefix_max(
    df: DataFrame,
    order_cols: Sequence,
    bucket: Column,
    val_col: str,
    out: str,
    inclusive: bool = False,
) -> DataFrame:
    """Add a global running MAX of ``val_col`` in ``order_cols`` order
    (default: over strictly-preceding rows, NULL for the first row) —
    the two-pass decomposition of ``max().over(Window.orderBy(...))``.
    The offset is the max over strictly-preceding BUCKETS (bucket-
    histogram-scale window), combined with the in-bucket running max via
    null-skipping ``greatest``."""
    b = df.withColumn("__rnk_b", F.coalesce(bucket.cast("long"), F.lit(-1)))
    totals = b.groupBy("__rnk_b").agg(F.max(val_col).alias("__rnk_t"))
    woff = Window.orderBy("__rnk_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__rnk_b", F.max("__rnk_t").over(woff).alias("__rnk_off")
    )
    hi = Window.currentRow if inclusive else -1
    wloc = (
        Window.partitionBy("__rnk_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    return (
        b.join(F.broadcast(offsets), "__rnk_b")
        .withColumn(
            out, F.greatest(F.col("__rnk_off"), F.max(val_col).over(wloc))
        )
        .drop("__rnk_b", "__rnk_off")
    )


def distributed_avg_rank(
    df: DataFrame,
    value_col: str,
    bucket: Column,
    out: str = "avg_rank",
    cnt: str | None = None,
) -> DataFrame:
    """Tie-averaged rank MAP per DISTINCT ``value_col``:
    ``avg_rank(v) = |rows < v| + (count(v) + 1)/2``, held as
    DECIMAL(18,1) (ranks of ties average to an exact .5 step). This is
    the scale-safe form of ``rank().over(orderBy(v))`` +
    ``count().over(partitionBy(v))`` tie averaging: the value histogram
    aggregates map-side, bucket offsets come from a bucket-histogram
    window, and the in-bucket prefix runs partitioned BY bucket over
    distinct values only. ``bucket`` must be a coarse-monotone function
    of ``value_col`` (see :func:`distributed_row_number`). Returns
    ``(value_col, out[, cnt])`` — join it back or fold counts against
    it; never materializes a row-domain rank."""
    b = df.withColumn("__rnk_b", F.coalesce(bucket.cast("long"), F.lit(-1)))
    h = b.groupBy("__rnk_b", value_col).agg(
        F.count(F.lit(1)).alias("__rnk_c")
    )
    btot = h.groupBy("__rnk_b").agg(F.sum("__rnk_c").alias("__rnk_t"))
    woff = Window.orderBy("__rnk_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "__rnk_b",
        F.coalesce(F.sum("__rnk_t").over(woff), F.lit(0)).alias("__rnk_off"),
    )
    wloc = (
        Window.partitionBy("__rnk_b")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = h.join(F.broadcast(offsets), "__rnk_b").select(
        value_col,
        F.col("__rnk_c"),
        (
            F.col("__rnk_off")
            + F.coalesce(F.sum("__rnk_c").over(wloc), F.lit(0))
            + 1
            + (F.col("__rnk_c") - 1) / 2.0
        )
        .cast("decimal(18,1)")
        .alias(out),
    )
    keep = [value_col, out]
    if cnt is not None:
        ranked = ranked.withColumnRenamed("__rnk_c", cnt)
        keep.append(cnt)
    return ranked.select(*keep)


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
