"""Hundred-twenty-eighth wave: the capped sessionizer's STREAMING twin.

Wave 126's events_capped_sessionize promised its streaming form drops
straight into applyInPandasWithState with the same state triple — this
wave ships that twin and oracle-proves the batch/streaming parity:

  * stream_capped_sessionize — per-user arbitrary state
    [n_sessions, count_in_session, last_ts] evolved across
    micro-batches; within a batch events fold in (ts, event_id) order,
    exactly the batch fold's rule (10-min gap OR 20-event cap).  Under
    AvailableNow the events file is one micro-batch, so the drained
    update-mode output is each user's final state and the oracle is
    the SAME session arithmetic the batch query certifies — one
    operator, two runtimes, one answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register
from news_ingestion_data_pipeline_spark.plans.windows import (
    _drain_to_memory,
    _events_stream,
)

_GAP_US = 600_000_000
_CAP = 20


@register(
    "stream_capped_sessionize",
    oracle=f"""
WITH ordered AS (
  SELECT user_id,
         list(epoch_us(ts) ORDER BY ts, event_id) AS us
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id, len(us) AS n_events,
    list_reduce(
      list_prepend([CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(-1 AS BIGINT)],
        list_transform(us, u -> [u, CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
      (acc, x) -> CASE
        WHEN acc[1] = 0 OR x[1] - acc[3] > {_GAP_US} OR acc[2] >= {_CAP}
        THEN [acc[1] + 1, CAST(1 AS BIGINT), x[1]]
        ELSE [acc[1], acc[2] + 1, x[1]] END
    ) AS st
  FROM ordered
)
SELECT user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(st[1] AS BIGINT) AS n_sessions,
       CAST(st[2] AS BIGINT) AS last_session_len
FROM folded
ORDER BY user_id
""",
    description="REAL streaming execution of the capped sessionizer "
    "(10-min gap OR 20-event cap — the recursive boundary rule windows "
    "can't express): applyInPandasWithState holds the SAME state triple "
    "[n_sessions, count_in_session, last_ts_us] as the batch fold "
    "(events_capped_sessionize) and replays its exact transition per "
    "event in (ts, event_id) order within each micro-batch. Under "
    "AvailableNow the corpus is one batch, so the drained update-mode "
    "rows are each user's final state and the oracle is the identical "
    "session arithmetic — a certified batch/streaming parity pair. At "
    "scale, state is 3 longs per live user and late events beyond the "
    "watermark would age out via state TTL (NoTimeout here: bounded "
    "replay).",
    tags=("streaming", "stateful", "events", "iterative"),
)
def stream_capped_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        ns, cnt, last, n_events = (
            state.get if state.exists else (0, 0, -1, 0)
        )
        rows = []
        for pdf in pdfs:
            rows.append(pdf)
        if rows:
            batch = pd.concat(rows).sort_values(["us", "event_id"])
            for u in batch["us"].astype("int64"):
                u = int(u)
                if ns == 0 or u - last > _GAP_US or cnt >= _CAP:
                    ns, cnt = ns + 1, 1
                else:
                    cnt += 1
                last = u
            n_events += len(batch)
        state.update((ns, cnt, last, n_events))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_sessions": [ns],
                "last_session_len": [cnt],
            }
        )

    stream = _events_stream(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    res = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, n_events bigint, n_sessions bigint, "
            "last_session_len bigint"
        ),
        stateStructType=(
            "ns bigint, cnt bigint, last_us bigint, n_events bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _drain_to_memory(res, "stream_capped_sess_mem", mode="update")
    return out
