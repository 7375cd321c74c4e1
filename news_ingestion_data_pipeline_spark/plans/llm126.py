"""Hundred-twenty-sixth wave: capped sessionization and Simpson's
reversal detection.

  * events_capped_sessionize — sessionization with BOTH a gap rule
    (> 10 min starts a new session) and a size cap (a session holds at
    most 20 events).  The cap makes boundaries RECURSIVE — whether an
    event starts a session depends on how many events the current
    session already absorbed, which itself depends on earlier
    boundaries — so no window function can express it (the plain gap
    rule, window_session_10m, can).  Runs as a per-user fold under the
    cross-engine contract.
  * agg_simpsons_reversal — the classic aggregation trap, detected:
    per-segment URGENT-vs-LOW order-value gaps compared against the
    pooled gap; a segment whose gap sign contradicts the pooled sign
    is a Simpson's reversal.  Exact decimal arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_GAP_US = 600_000_000
_CAP = 20


@register(
    "events_capped_sessionize",
    oracle=f"""
WITH ordered AS (
  SELECT user_id,
         list(epoch_us(ts) ORDER BY ts, event_id) AS us
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id, len(us) AS n_events,
    -- state [n_sessions, count_in_session, last_ts]
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
    description="Sessionization with a gap rule AND a hard size cap "
    f"(10-minute gap OR {_CAP}-event cap starts a new session): the cap "
    "makes boundaries recursive — an event's session depends on how many "
    "events the current session already absorbed — which running-sum "
    "window tricks (window_session_10m's gaps-and-islands) cannot "
    "express. Runs as one per-user fold over (ts,event_id)-ordered "
    "timestamps with BIGINT state [n_sessions, count_in_session, "
    "last_ts], bit-identical to the oracle's list_reduce. The streaming "
    "twin is applyInPandasWithState with the same state triple. Scale: "
    "one shuffle to user lists; state is O(1) per user.",
    tags=("events", "window", "iterative"),
)
def events_capped_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ordered = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.struct(
                "ts",
                "event_id",
                F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
            ).alias("x"),
        )
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("x")), lambda e: e["us"]
            ).alias("us")
        )
    )

    def step(acc, u):
        ns = F.element_at(acc, 1)
        cnt = F.element_at(acc, 2)
        last = F.element_at(acc, 3)
        new_sess = (
            (ns == 0) | (u - last > _GAP_US) | (cnt >= _CAP)
        )
        return F.when(
            new_sess, F.array(ns + 1, F.lit(1).cast("bigint"), u)
        ).otherwise(F.array(ns, cnt + 1, u))

    init = F.array(
        F.lit(0).cast("bigint"),
        F.lit(0).cast("bigint"),
        F.lit(-1).cast("bigint"),
    )
    folded = ordered.select(
        "user_id",
        F.size("us").alias("n_events"),
        F.aggregate("us", init, step).alias("st"),
    )
    return folded.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.element_at("st", 1).alias("n_sessions"),
        F.element_at("st", 2).alias("last_session_len"),
    )


@register(
    "agg_simpsons_reversal",
    oracle="""
WITH seg AS (
  SELECT c.c_mktsegment AS segment,
         o.o_orderpriority AS prio,
         COUNT(*) AS n,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
  GROUP BY 1, 2
),
wide AS (
  SELECT segment,
         CAST(CAST(MAX(CASE WHEN prio = '1-URGENT' THEN s END) AS VARCHAR)
              AS DOUBLE)
           / MAX(CASE WHEN prio = '1-URGENT' THEN n END) AS m_urgent,
         CAST(CAST(MAX(CASE WHEN prio = '5-LOW' THEN s END) AS VARCHAR)
              AS DOUBLE)
           / MAX(CASE WHEN prio = '5-LOW' THEN n END) AS m_low
  FROM seg GROUP BY segment
),
pooled AS (
  SELECT CAST(CAST(SUM(CASE WHEN prio = '1-URGENT' THEN s
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR)
              AS DOUBLE)
           / SUM(CASE WHEN prio = '1-URGENT' THEN n ELSE 0 END) AS m_urgent,
         CAST(CAST(SUM(CASE WHEN prio = '5-LOW' THEN s
                            ELSE CAST(0 AS DECIMAL(18,2)) END) AS VARCHAR)
              AS DOUBLE)
           / SUM(CASE WHEN prio = '5-LOW' THEN n ELSE 0 END) AS m_low
  FROM seg
)
SELECT w.segment,
       w.m_urgent - w.m_low AS seg_gap,
       p.m_urgent - p.m_low AS pooled_gap,
       CAST(sign(w.m_urgent - w.m_low) <> sign(p.m_urgent - p.m_low)
            AS BOOLEAN) AS reversal
FROM wide w CROSS JOIN pooled p
ORDER BY segment
""",
    description="Simpson's-paradox detector: the URGENT-vs-LOW mean "
    "order-value gap per market segment, compared against the pooled "
    "gap — a segment whose gap sign contradicts the pooled sign is a "
    "reversal (the aggregation trap where a trend holds in every "
    "subgroup yet flips in the total). Means are exact-decimal sums over "
    "exact counts divided once, so gaps and the reversal flags are "
    "bit-identical cross-engine. One grouped pass feeds both the "
    "per-segment and pooled views — the pooled CTE aggregates the "
    "6-row segment table, never the fact table twice.",
    tags=("agg", "stats", "causal"),
)
def agg_simpsons_reversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
        )
        .localCheckpoint()  # feeds both the per-segment and pooled views
    )
    urgent = F.col("prio") == "1-URGENT"
    wide = seg.groupBy("segment").agg(
        (
            F.max(F.when(urgent, F.col("s"))).cast("double")
            / F.max(F.when(urgent, F.col("n")))
        ).alias("m_urgent"),
        (
            F.max(F.when(~urgent, F.col("s"))).cast("double")
            / F.max(F.when(~urgent, F.col("n")))
        ).alias("m_low"),
    )
    pooled = seg.agg(
        (
            F.sum(F.when(urgent, F.col("s")).otherwise(F.lit(0).cast("decimal(18,2)")))
            .cast("double")
            / F.sum(F.when(urgent, F.col("n")).otherwise(0))
        ).alias("p_urgent"),
        (
            F.sum(F.when(~urgent, F.col("s")).otherwise(F.lit(0).cast("decimal(18,2)")))
            .cast("double")
            / F.sum(F.when(~urgent, F.col("n")).otherwise(0))
        ).alias("p_low"),
    )
    return (
        wide.crossJoin(F.broadcast(pooled))
        .select(
            "segment",
            (F.col("m_urgent") - F.col("m_low")).alias("seg_gap"),
            (F.col("p_urgent") - F.col("p_low")).alias("pooled_gap"),
            (
                F.signum(F.col("m_urgent") - F.col("m_low"))
                != F.signum(F.col("p_urgent") - F.col("p_low"))
            ).alias("reversal"),
        )
        
    )
