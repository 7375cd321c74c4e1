"""Structured Streaming tests (SURVEY.md §2.9 / §7 Phase 5).

Strategy: every streaming shape is exercised with Trigger.AvailableNow over
a tmp landing dir and compared against the batch twin on the same rows —
F.window/groupBy semantics are identical in batch and streaming, so the
batch result is the oracle.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import upsert
from news_ingestion_data_pipeline_spark.schemas import RAW_LISTING_SCHEMA
from news_ingestion_data_pipeline_spark.scratch import scratch_root
from news_ingestion_data_pipeline_spark.streaming import (
    pipeline as spipe,
    windows as swin,
)

T0 = dt.datetime(2025, 8, 1, 10, 0, 0)


def raw_rows(spark, specs):
    return spark.createDataFrame(
        [
            Row(
                raw_title=s[0],
                raw_href=s[1],
                raw_author="By A",
                raw_date=s[2],
                source_name="Skift",
                page_no=1,
            )
            for s in specs
        ],
        RAW_LISTING_SCHEMA,
    )


def events_df(spark, n=200, users=7, types=("view", "click", "buy")):
    rows = [
        Row(
            event_id=i,
            user_id=i % users,
            event_type=types[i % len(types)],
            ts=T0 + dt.timedelta(minutes=3 * i),
            value=float(i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: os.path.join(str(tmp_path), k)
        for k in ("landing", "table", "ckpt", "events", "ckpt2", "out")
    }
    os.makedirs(d["landing"], exist_ok=True)
    return d


def test_stream_ingest_matches_batch_and_is_idempotent(spark, dirs):
    batch1 = [
        ("A", "https://skift.com/a", "2025-08-01T10:00:00+00:00"),
        ("B", "https://skift.com/b", "2025-08-01T11:00:00+00:00"),
        ("A-dup", "https://skift.com/a", "2025-08-01T10:00:00+00:00"),
    ]
    raw_rows(spark, batch1).write.mode("append").parquet(dirs["landing"])
    spipe.stream_ingest_available_now(spark, dirs["landing"], dirs["table"], dirs["ckpt"])
    got = {r["News_link"]: r for r in upsert.read_articles(spark, dirs["table"]).collect()}
    assert set(got) == {"https://skift.com/a", "https://skift.com/b"}

    # second drop: one new article + one replay of 'b' → merge, no dup
    raw_rows(
        spark, [("C", "https://skift.com/c", "2025-08-02T09:00:00+00:00"),
                ("B", "https://skift.com/b", "2025-08-01T11:00:00+00:00")]
    ).write.mode("append").parquet(dirs["landing"])
    spipe.stream_ingest_available_now(spark, dirs["landing"], dirs["table"], dirs["ckpt"])
    tbl = upsert.read_articles(spark, dirs["table"])
    assert tbl.count() == 3
    assert tbl.filter(F.col("News_link") == "https://skift.com/c").count() == 1

    # restart with same checkpoint and no new files → no-op
    spipe.stream_ingest_available_now(spark, dirs["landing"], dirs["table"], dirs["ckpt"])
    assert upsert.read_articles(spark, dirs["table"]).count() == 3


@pytest.mark.parametrize(
    "fn,kwargs",
    [
        (swin.tumbling_counts, {}),
        (swin.sliding_counts, {}),
        (swin.session_windows, {"key_col": "user_id", "gap": "10 minutes"}),
    ],
)
def test_windowed_aggs_stream_equals_batch(spark, dirs, fn, kwargs):
    ev = events_df(spark)
    ev.write.mode("overwrite").parquet(dirs["events"])

    batch = {tuple(map(str, r)) for r in fn(ev, **kwargs).collect()}

    stream = (
        spark.readStream.schema(ev.schema).parquet(dirs["events"])
    )
    q = (
        fn(stream, **kwargs)
        .writeStream.format("memory")
        .queryName(f"win_{fn.__name__}")
        .outputMode("complete")
        .option("checkpointLocation", dirs["ckpt2"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        tuple(map(str, r))
        for r in spark.sql(f"select * from win_{fn.__name__}").collect()
    }
    assert got == batch


def test_stateful_running_counts(spark, dirs):
    from news_ingestion_data_pipeline_spark.streaming.state import running_source_counts

    specs = [(f"t{i}", f"https://skift.com/{i}", "2025-08-01T10:00:00+00:00") for i in range(5)]
    raw_rows(spark, specs).write.mode("append").parquet(dirs["landing"])

    from news_ingestion_data_pipeline_spark.operators import normalize

    stream = spark.readStream.schema(RAW_LISTING_SCHEMA).parquet(dirs["landing"])
    canon = normalize.finalize_articles(normalize.normalize_listing(stream))
    q = (
        running_source_counts(canon)
        .writeStream.format("memory")
        .queryName("counters")
        .outputMode("update")
        .option("checkpointLocation", dirs["out"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from counters").collect()
    assert rows and rows[-1]["Source_name"] == "Skift"
    assert rows[-1]["total"] == 5
    assert str(rows[-1]["max_ts"]) == "2025-08-01 10:00:00"


def test_watermark_drops_late_data_across_micro_batches(spark, tmp_path):
    """Late-data semantics need MULTIPLE micro-batches (a single
    AvailableNow batch never advances the watermark mid-run): batch 1
    carries an event at T0+2h which moves the watermark to T0+1h50m
    (10-minute delay); batch 2 then delivers an event stamped T0+5m —
    far below the watermark — whose window must NOT appear in the
    append-mode output, while a fresh on-time event must."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    land = tmp_path / "land"
    land.mkdir()
    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
        pq.write_table(
            pa.Table.from_pandas(pdf),
            str(land / name),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    # batch 1: two on-time events + the watermark-advancing head event
    write_file(
        "b1.parquet",
        [
            (1, 10, "view", T0, 1.0),
            (2, 10, "view", T0 + dt.timedelta(minutes=5), 1.0),
            (3, 10, "view", T0 + dt.timedelta(hours=2), 1.0),
        ],
    )
    schema = spark.read.parquet(str(land / "b1.parquet")).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(land))
            # pyarrow writes TIMESTAMP_NTZ; watermarks need TIMESTAMP
            # (session tz is pinned UTC so the wall clock is identical)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    # batch 2 (new run, resumed checkpoint = next micro-batch): one event
    # 1h45m BELOW the persisted watermark, one on-time event
    write_file(
        "b2.parquet",
        [
            (4, 10, "view", T0 + dt.timedelta(minutes=6), 1.0),  # LATE → dropped
            (5, 10, "view", T0 + dt.timedelta(hours=3), 1.0),  # on time
        ],
    )
    run_once()
    # third run so the hour-3 window can close and flush
    write_file(
        "b3.parquet", [(6, 10, "view", T0 + dt.timedelta(hours=5), 1.0)]
    )
    run_once()

    got = {
        r["ws"]: r["n"] for r in spark.read.parquet(out_dir).collect()
    }
    # T0 window: closed by batch 1's head event; contains ONLY the two
    # on-time rows — the late row 4 must not have re-opened or re-counted it
    assert got.get(T0.replace(minute=0)) == 2
    # the late event's would-be window is T0+0h (already emitted) — row 4
    # contributed nowhere: total counted events = 4 (ids 1,2,3,5), and the
    # hour-2/hour-3 windows hold exactly one event each
    assert got.get(T0 + dt.timedelta(hours=2)) == 1
    assert got.get(T0 + dt.timedelta(hours=3)) == 1
    assert sum(got.values()) == 4


def test_checkpoint_resume_processes_only_new_files(spark):
    """The second (restarted) query must resume from checkpointed source
    offsets: its file-source log for the resumed batch lists only the
    files added after the first run — recovery without reprocessing."""
    import glob
    import hashlib
    import json

    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["stream_checkpoint_resume"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 5

    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    src_log = f"{scratch_root('llm6')}/ckpt_{sfx}/sources/0"
    batches = sorted(
        int(os.path.basename(p))
        for p in glob.glob(f"{src_log}/*")
        if os.path.basename(p).isdigit()
    )
    assert len(batches) >= 2, f"expected >=2 source batches, got {batches}"

    def files_of(batch: int) -> set[str]:
        with open(f"{src_log}/{batch}") as f:
            lines = [ln for ln in f if ln.startswith("{")]
        return {json.loads(ln)["path"] for ln in lines}

    first, last = files_of(batches[0]), files_of(batches[-1])
    assert first and last
    assert not (first & last), "resumed batch re-read already-processed files"
