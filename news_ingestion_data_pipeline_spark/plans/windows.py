"""Time-window aggregations over the events stream table — batch plans with
exact Structured Streaming analogs (streaming/ runs the same shapes with
readStream + withWatermark; these batch twins are the oracle-checkable
versions, since F.window() semantics are identical in batch and streaming).

Determinism notes: event values are doubles → sums go through
decimal(20,10) (binary doubles round to 10 fractional digits identically in
both engines, and decimal sums are order-independent); window bounds are
projected as formatted strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t, ts_str

_VAL_DEC = "decimal(20,10)"
_SQL_VAL_SUM = "CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)"


@register(
    "window_tumbling_hourly",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {_SQL_VAL_SUM} AS sum_value
FROM events
GROUP BY 1, 2
""",
    description="Tumbling 1-hour windows per event type — F.window(ts, '1 "
    "hour'); identical shape under readStream+withWatermark. Partial agg "
    "map-side; shuffle carries (window,type) groups only.",
    tags=("streaming", "agg"),
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_sliding_1h_30m",
    oracle=f"""
WITH grid AS (
  SELECT *,
         to_timestamp(epoch(date_trunc('minute', ts))
                      - (CAST(epoch(date_trunc('minute', ts)) AS BIGINT) % 1800)) AS g
  FROM events
), expanded AS (
  SELECT * , g AS window_start FROM grid
  UNION ALL
  SELECT *, g - INTERVAL 30 MINUTE AS window_start FROM grid
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {_SQL_VAL_SUM} AS sum_value
FROM expanded
GROUP BY 1
""",
    description="Sliding windows (1h length, 30m slide): each event lands in "
    "two windows. Spark plans F.window with slide<length as a generator "
    "(explode) + hash agg — shuffle is O(events × length/slide).",
    tags=("streaming", "agg"),
)
def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "window_session_10m",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 600000000
                 THEN 1 ELSE 0 END AS is_new
  FROM seq
), sessions AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
    description="Session windows (10-min inactivity gap) per user — "
    "gaps-and-islands (lag + cumulative sum). One shuffle on user_id shared "
    "by the window and the aggregate. Streaming twin: "
    "F.session_window(ts, '10 minutes').",
    tags=("streaming", "window", "agg"),
)
def window_session_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = ev.withColumn("prev_ts", F.lag("ts").over(w_seq)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                > 600_000_000
            ),
            1,
        ).otherwise(0),
    )
    return (
        marked.withColumn("session_id", F.sum("is_new").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            ts_str(F.min("ts")).alias("session_start"),
            ts_str(F.max("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# REAL Structured Streaming executions (not batch twins).
#
# Each reads the events parquet through readStream → withWatermark → windowed
# aggregate → memory sink with Trigger.AvailableNow, awaited to completion.
# Because F.window()/F.session_window() semantics are identical in batch and
# streaming and complete output mode emits every group's final value, the
# drained sink must equal the batch answer — so these carry full DuckDB
# oracles, not just rows-only checks. (Append mode would be wrong here: the
# final watermark never flushes the last open session/window at end-of-input
# — verified to lose rows on this corpus.)
# ---------------------------------------------------------------------------


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet.

    events.ts varies by how the corpus was written: parquet TIMESTAMP(NANOS)
    reads as long under nanosAsLong (floor-convert to micros exactly like
    tables.load_table), while micros-precision writers surface TIMESTAMP_NTZ
    (cast to TIMESTAMP — session tz is pinned UTC so the wall clock is
    preserved and the watermark/window semantics match the batch twins).
    The file stream source wants a directory; glob-filter down to the events
    file inside the sf dir.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql.types import LongType, TimestampNTZType

    from news_ingestion_data_pipeline_spark.tables import table_path

    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = raw_schema["ts"].dataType
    if isinstance(ts_type, LongType):
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(ts_type, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _drain_to_memory(res: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Run a streaming query to a memory sink (Trigger.AvailableNow),
    await completion, return the sink table. Aggregates drain in complete
    mode; stream-stream joins (no aggregate) must drain in append mode.

    The drain pins the stream's shuffle width to the state-volume-sized
    default (see session.stream_state_partitions): these memory-sink
    states are fixture-scale, and the session width (cores) gave 32
    near-empty state-store tasks per micro-batch, ~10 CPU-s of pure
    open/commit fixed cost each batch (profiled r12)."""
    from news_ingestion_data_pipeline_spark.session import (
        stream_state_partitions,
    )

    spark = res.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with stream_state_partitions(spark):
        q = (
            res.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(name)


@register(
    "stream_tumbling_availablenow",
    oracle=f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {_SQL_VAL_SUM} AS sum_value
FROM events
GROUP BY 1, 2
""",
    description="REAL Structured Streaming execution: readStream over the "
    "events parquet -> watermark -> tumbling 1h aggregate per event type -> "
    "memory sink, Trigger.AvailableNow, complete mode, awaited. The drained "
    "sink is oracle-checked against the batch answer (identical window "
    "semantics).",
    tags=("streaming", "agg"),
)
def stream_tumbling_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _drain_to_memory(res, "stream_tumbling_mem")


@register(
    "stream_sliding_availablenow",
    oracle=f"""
WITH grid AS (
  SELECT *,
         to_timestamp(epoch(date_trunc('minute', ts))
                      - (CAST(epoch(date_trunc('minute', ts)) AS BIGINT) % 1800)) AS g
  FROM events
), expanded AS (
  SELECT * , g AS window_start FROM grid
  UNION ALL
  SELECT *, g - INTERVAL 30 MINUTE AS window_start FROM grid
)
SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n_events,
       {_SQL_VAL_SUM} AS sum_value
FROM expanded
GROUP BY 1
""",
    description="REAL Structured Streaming sliding windows (1h length, 30m "
    "slide): each event feeds two windows' state. Complete-mode memory sink "
    "drained under AvailableNow, oracle-checked against the batch "
    "self-union expansion.",
    tags=("streaming", "agg"),
)
def stream_sliding_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )
    return _drain_to_memory(res, "stream_sliding_mem")


@register(
    "stream_session_availablenow",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 600000000
                 THEN 1 ELSE 0 END AS is_new
  FROM seq
), sessions AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
    description="REAL Structured Streaming session windows (10-min gap) per "
    "user via F.session_window — dynamic, state-merging windows, the one "
    "window kind with no closed-form batch F.window twin. Complete-mode "
    "drain, oracle = the batch gaps-and-islands rewrite. Session end is "
    "excluded from the projection: streaming session_window.end is "
    "last_event+gap, the SQL rewrite's MAX(ts) is last_event — start and "
    "count identify the session either way.",
    tags=("streaming", "window", "agg"),
)
def stream_session_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )
    return _drain_to_memory(res, "stream_session_mem")


@register(
    "stream_stateful_counts",
    oracle="""
SELECT event_type, COUNT(*) AS total,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
FROM events
GROUP BY event_type
""",
    description="REAL streaming applyInPandasWithState execution: arbitrary "
    "per-group state (running count + max event time) evolved across "
    "micro-batches, Arrow-batched — the custom-stateful-operator escape "
    "hatch Spark's built-ins don't cover. Under AvailableNow the single "
    "events file is one micro-batch, so update-mode output is each group's "
    "final state and the drained sink oracle-checks against the batch "
    "GROUP BY. State is O(#event types) regardless of row volume.",
    tags=("streaming", "stateful"),
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        total, max_ts = state.get if state.exists else (0, None)
        for pdf in pdfs:
            total += len(pdf)
            m = pdf["ts"].max()
            if pd.notna(m):
                max_ts = m if max_ts is None else max(max_ts, m)
        state.update((total, max_ts))
        yield pd.DataFrame(
            {"event_type": [key[0]], "total": [total], "max_ts": [max_ts]}
        )

    res = (
        _events_stream(spark, sf_dir)
        .select("event_type", "ts")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType="event_type string, total bigint, max_ts timestamp",
            stateStructType="total bigint, max_ts timestamp",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    spark_session = spark
    name = "stream_stateful_mem"
    for q in spark_session.streams.active:
        if q.name == name:
            q.stop()
    from news_ingestion_data_pipeline_spark.session import (
        stream_state_partitions,
    )

    with stream_state_partitions(spark_session):
        q = (
            res.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark_session.table(name).select(
        "event_type", "total", ts_str("max_ts").alias("max_ts")
    )


@register(
    "stream_dedup_availablenow",
    oracle="""
SELECT DISTINCT user_id, event_type,
       strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS minute_ts
FROM events
""",
    description="REAL streaming dropDuplicatesWithinWatermark execution — "
    "the principled form of the reference's in-run seen-ids set "
    "(PhocusWire/PhocusWireSource.py:155-158): first event per (user, "
    "type, minute) key passes, later arrivals inside the watermark horizon "
    "are suppressed, state ages out beyond it. Dedup is a stateful FILTER "
    "(not an aggregate), so append mode emits immediately and loses "
    "nothing at end-of-input. Only key columns are projected: which "
    "physical row 'wins' per key depends on partition arrival order, but "
    "the KEY SET is deterministic — hence an exact DISTINCT oracle.",
    tags=("streaming", "dedup"),
)
def stream_dedup_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = (
        _events_stream(spark, sf_dir)
        .withColumn("minute_ts", F.date_trunc("minute", "ts"))
        .withWatermark("minute_ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute_ts"])
        .select("user_id", "event_type", "minute_ts")
    )
    spark_session = spark
    name = "stream_dedup_mem"
    for q in spark_session.streams.active:
        if q.name == name:
            q.stop()
    from news_ingestion_data_pipeline_spark.session import (
        stream_state_partitions,
    )

    with stream_state_partitions(spark_session):
        q = (
            res.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark_session.table(name).select(
        "user_id", "event_type", ts_str("minute_ts").alias("minute_ts")
    )


@register(
    "stream_static_join_availablenow",
    oracle=f"""
SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       c.c_mktsegment AS segment,
       COUNT(*) AS n_events,
       {_SQL_VAL_SUM} AS sum_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
""",
    description="REAL streaming stream-static enrichment join: the events "
    "stream joins the static customer dimension (broadcast — the dim is "
    "re-read per micro-batch but never shuffled, and the stream side "
    "keeps its partitioning), then a tumbling 1h aggregate per market "
    "segment. This is the scale pattern for enriching an event firehose "
    "with slowly-changing dims: dim updates are picked up at micro-batch "
    "boundaries, no stream-stream state needed. Complete-mode memory sink "
    "drained under AvailableNow, oracle-checked against the equivalent "
    "batch join+aggregate.",
    tags=("streaming", "join", "agg"),
)
def stream_static_join_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    res = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_VAL_DEC)).cast("double").alias("sum_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "segment",
            "n_events",
            "sum_value",
        )
    )
    return _drain_to_memory(res, "stream_static_join_mem")


@register(
    "stream_stream_join_availablenow",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_event_id,
       p.event_id AS purchase_event_id,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       (epoch_us(p.ts) - epoch_us(v.ts)) // 1000000 AS gap_sec
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
""",
    description="REAL streaming stream-stream interval join: the view and "
    "purchase streams (two readers over the same firehose) join per user "
    "with a [0, 1h] event-time band. Both sides carry watermarks, so the "
    "join state is BOUNDED: a buffered view row is evicted once the "
    "purchase-side watermark passes view.ts + 1h — the property that "
    "makes an infinite-stream join runnable at all (unbounded state is "
    "the classic stream-join failure). Append-mode memory sink drained "
    "under AvailableNow; the oracle is the equivalent batch interval "
    "self-join. The attribution shape (conversion within an hour of a "
    "view) is the canonical use.",
    tags=("streaming", "join"),
)
def stream_stream_join_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_event_id"),
        )
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_event_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    res = joined.select(
        F.col("v_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        ts_str(F.col("v_ts")).alias("view_ts"),
        ts_str(F.col("p_ts")).alias("purchase_ts"),
        (
            (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("v_ts")))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("gap_sec"),
    )
    return _drain_to_memory(res, "stream_stream_join_mem", mode="append")


@register(
    "stream_state_user_stats",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         AS sum_value,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts
FROM events GROUP BY user_id
""",
    description="Custom stateful streaming with DETERMINISTIC numeric "
    "state: per-user running (count, value-sum, max-ts) evolved across "
    "micro-batches via applyInPandasWithState, where the value sum "
    "accumulates as exact DECIMAL inside the processor (string-carried "
    "state, HALF_UP-quantized at 10 dp exactly like the engines' "
    "double->DECIMAL(20,10) cast) so the running total is "
    "order-independent and hash-matches the batch GROUP BY oracle — the "
    "pattern for making custom streaming state deterministic, not just "
    "convergent. State is O(#users); at scale the state store partitions "
    "by the grouping key like any shuffle. (Spark 4's successor API, "
    "transformWithStateInPandas, needs the protobuf package absent from "
    "this environment; the state semantics demonstrated here port to a "
    "ValueState handle one-to-one.)",
    tags=("streaming", "stateful"),
)
def stream_state_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from decimal import ROUND_HALF_UP, Decimal
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    q10 = Decimal("1.0000000000")

    def update(key, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        n, sum_str, max_us = state.get if state.exists else (0, "0", None)
        total = Decimal(sum_str)
        for pdf in pdfs:
            n += len(pdf)
            # mirror Spark/DuckDB CAST(double AS DECIMAL(20,10)):
            # shortest-repr decimal, HALF_UP at 10 dp, summed exactly
            for v in pdf["value"]:
                total += Decimal(str(v)).quantize(q10, rounding=ROUND_HALF_UP)
            m = pdf["ts_us"].max()
            if pd.notna(m):
                m = int(m)
                max_us = m if max_us is None else max(max_us, m)
        state.update((n, str(total), max_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [float(total)],
                "max_us": [max_us],
            }
        )

    res = (
        _events_stream(spark, sf_dir)
        .select(
            "user_id",
            "value",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, n_events long, sum_value double, max_us long"
            ),
            stateStructType="n bigint, sum_str string, max_us bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    drained = _drain_to_memory(res, "stream_state_user_mem", mode="update")
    return drained.select(
        "user_id",
        "n_events",
        "sum_value",
        ts_str(F.timestamp_micros(F.col("max_us"))).alias("max_ts"),
    )
