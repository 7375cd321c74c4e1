"""Event-time windowed aggregates (streaming or batch — same functions).

The reference has no windowing (SURVEY.md §2.9); these are the standard
Spark shapes the driver contract's window_* batch queries mirror
(plans/windows.py), usable unchanged under readStream with watermarks:

    tumbling — non-overlapping fixed windows
    sliding  — overlapping fixed windows
    session  — gap-based dynamic windows (F.session_window)

Watermarking bounds state: at 100 TB/day the aggregation state holds only
windows newer than (max event time − delay); older state is emitted and
dropped. Pre-aggregation happens map-side before the keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, delay: str | None) -> DataFrame:
    return df.withWatermark(ts_col, delay) if delay and df.isStreaming else df


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    delay: str | None = "10 minutes",
) -> DataFrame:
    df = _maybe_watermark(events, ts_col, delay)
    return (
        df.groupBy(F.window(ts_col, width).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    slide: str = "30 minutes",
    delay: str | None = "10 minutes",
) -> DataFrame:
    df = _maybe_watermark(events, ts_col, delay)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "10 minutes",
    delay: str | None = "10 minutes",
) -> DataFrame:
    df = _maybe_watermark(events, ts_col, delay)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
