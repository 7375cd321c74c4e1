"""Fifty-seventh wave: HITS link analysis and split-conformal intervals.

graph_hits_hubs_authorities completes the iterative-graph family
(components, pagerank, label propagation, k-core) with the mutually
recursive hub/authority fixpoint — same engineering recipe as pagerank:
driver-controlled rounds, localCheckpoint lineage truncation, and a
generated term-for-term unrolled DuckDB oracle.  agg_conformal_interval is
distribution-free uncertainty quantification (split conformal): the
prediction-interval method modern ML serving uses because it needs only
exchangeability, and — being pure order statistics — it is exactly the
kind of op a SQL engine certifies bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# HITS hubs & authorities (10 unrolled rounds, L1-normalized)
# ---------------------------------------------------------------------------

_HITS_ITERS = 10

_HITS_BASE = """WITH raw AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), edges AS MATERIALIZED (
  SELECT DISTINCT src, event_type AS dst
  FROM raw WHERE src IS NOT NULL AND src <> event_type
), nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
), h0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT COUNT(*) FROM nodes) AS h FROM nodes
)"""


def _hits_oracle() -> str:
    # Per-round L1 normalization is a pure rescale of a linear update, so
    # it commutes to the end: run the rounds unnormalized (5-node graph,
    # values stay far from overflow) and divide ONCE by the final sums —
    # same mathematical result, and the Spark side avoids 2 driver
    # round-trips per iteration.
    steps = []
    for k in range(1, _HITS_ITERS + 1):
        p = k - 1
        steps.append(f""", a{k} AS MATERIALIZED (
  SELECT nd.node, COALESCE(s.v, 0.0) AS a
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node, SUM(h.h) AS v
    FROM h{p} h JOIN edges e ON h.node = e.src
    GROUP BY e.dst
  ) s ON nd.node = s.node
), h{k} AS MATERIALIZED (
  SELECT nd.node, COALESCE(s.v, 0.0) AS h
  FROM nodes nd LEFT JOIN (
    SELECT e.src AS node, SUM(a.a) AS v
    FROM a{k} a JOIN edges e ON a.node = e.dst
    GROUP BY e.src
  ) s ON nd.node = s.node
)""")
    last = _HITS_ITERS
    return f"""{_HITS_BASE}{''.join(steps)}
SELECT h.node,
       round(a.a / (SELECT SUM(a) FROM a{last}), 8) AS authority,
       round(h.h / (SELECT SUM(h) FROM h{last}), 8) AS hub
FROM h{last} h JOIN a{last} a USING (node)
ORDER BY authority DESC, node
"""


@register(
    "graph_hits_hubs_authorities",
    oracle=_hits_oracle(),
    description=f"HITS (Kleinberg) hubs & authorities over the event-type "
    f"transition graph — {_HITS_ITERS} fixed rounds of the mutually "
    "recursive update (authority = sum of in-neighbor hub scores, hub = "
    "sum of out-neighbor authority scores), L1-normalized each half-"
    "round so scores are comparable across rounds; the link-analysis "
    "complement of graph_pagerank_transitions (pagerank ranks by random-"
    "walk mass, HITS separates 'points at good things' from 'is a good "
    "thing' — the distinction that matters for referral/citation "
    "graphs). Same scale recipe as the engine's other iterative ops: "
    "per-round state is O(#nodes), each half-round is one join + one "
    "aggregate, lineage truncated by localCheckpoint; the oracle is the "
    f"{_HITS_ITERS}-round update unrolled as generated MATERIALIZED "
    "CTEs with term-identical IEEE arithmetic, round-8 absorbing "
    "summation-order drift (the pagerank precedent).",
    tags=("graph", "iterative", "events"),
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        t(spark, sf_dir, "events")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("event_type")))
        .select("src", F.col("event_type").alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    # unnormalized rounds — L1 normalization is a pure rescale of a linear
    # update, applied ONCE at the end (see the oracle generator note); one
    # localCheckpoint per round bounds lineage, no per-round collect()
    h = nodes.select("node", (F.lit(1.0) / n).alias("h")).localCheckpoint()
    a = None
    for _ in range(_HITS_ITERS):
        a = (
            nodes.join(
                h.join(edges, h["node"] == edges["src"])
                .groupBy(F.col("dst").alias("anode"))
                .agg(F.sum("h").alias("v")),
                nodes["node"] == F.col("anode"),
                "left",
            )
            .select("node", F.coalesce(F.col("v"), F.lit(0.0)).alias("a"))
            .localCheckpoint()
        )
        h = (
            nodes.join(
                a.join(edges, a["node"] == edges["dst"])
                .groupBy(F.col("src").alias("hnode"))
                .agg(F.sum("a").alias("v")),
                nodes["node"] == F.col("hnode"),
                "left",
            )
            .select("node", F.coalesce(F.col("v"), F.lit(0.0)).alias("h"))
            .localCheckpoint()
        )
    a_sum = a.agg(F.sum("a").alias("s"))
    h_sum = h.agg(F.sum("h").alias("s"))
    out = (
        h.join(a, "node")
        .crossJoin(F.broadcast(a_sum.select(F.col("s").alias("sa"))))
        .crossJoin(F.broadcast(h_sum.select(F.col("s").alias("sh"))))
        .select(
            "node",
            F.round(F.col("a") / F.col("sa"), 8).alias("authority"),
            F.round(F.col("h") / F.col("sh"), 8).alias("hub"),
        )
        
    )
    edges.unpersist()
    nodes.unpersist()
    return out


# ---------------------------------------------------------------------------
# Split-conformal prediction interval
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1  # target 90% coverage


@register(
    "agg_conformal_interval",
    oracle=f"""
WITH train AS (
  SELECT event_type,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS pred
  FROM events WHERE day(ts) <= 10
  GROUP BY event_type
), cal AS (
  SELECT e.event_id, abs(e.value - t.pred) AS resid
  FROM events e JOIN train t USING (event_type)
  WHERE day(ts) BETWEEN 11 AND 15
), ncal AS (SELECT COUNT(*) AS n FROM cal),
qhat AS (
  SELECT resid AS q, n FROM (
    SELECT resid, n,
           ROW_NUMBER() OVER (ORDER BY resid, event_id) AS rn
    FROM cal CROSS JOIN ncal
  ) WHERE rn = CAST(ceil((n + 1) * {1 - _CONF_ALPHA!r}) AS BIGINT)
), test AS (
  SELECT e.value, t.pred FROM events e JOIN train t USING (event_type)
  WHERE day(ts) > 15
)
SELECT CAST((SELECT COUNT(*) FROM events WHERE day(ts) <= 10) AS BIGINT)
         AS n_train,
       CAST(q.n AS BIGINT) AS n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       round(q.q, 6) AS qhat,
       CAST({1 - _CONF_ALPHA!r} AS DOUBLE) AS target_coverage,
       round(CAST(COUNT(*) FILTER (WHERE abs(value - pred) <= q.q) AS DOUBLE)
             / COUNT(*), 6) AS empirical_coverage
FROM test CROSS JOIN qhat q
GROUP BY q.n, q.q
""",
    description="Split-conformal prediction interval: a per-type mean "
    "model fits on days 1-10, the calibration split (days 11-15) yields "
    "absolute residuals whose ⌈(n+1)(1−α)⌉-th order statistic is the "
    "interval half-width q̂, and the held-out split (days 16+) measures "
    "empirical coverage of pred ± q̂ — distribution-free uncertainty "
    "with finite-sample ≥1−α coverage guaranteed only by "
    "exchangeability, which is why conformal is the UQ method ML "
    "serving actually ships. Everything is exact: decimal train means, "
    "an integer-rank order statistic ((residual, id)-total-ordered "
    "against double ties), and a counted coverage ratio — so the oracle "
    "certifies the full train/calibrate/evaluate pipeline. Shape: one "
    "5-row model broadcast onto two filtered scans; q̂ comes from the "
    "distinct-residual histogram's two-pass cumulative counts "
    "(operators/ranking.py — min residual whose running count reaches "
    "the target rank); nothing scales worse than the scans.",
    tags=("agg", "stats", "ml"),
)
def agg_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    train = (
        ev.filter(day <= 10)
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("pred")
        )
    )
    cal = (
        ev.filter((day >= 11) & (day <= 15))
        .join(F.broadcast(train), "event_type")
        .select("event_id", F.abs(F.col("value") - F.col("pred")).alias("resid"))
    )
    ncal = cal.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("resid").alias("rlo"),
        F.max("resid").alias("rhi"),
    )
    # k-th order statistic = min{resid : cum(resid) >= k} over the
    # distinct-residual histogram's distributed cumulative counts
    # (operators/ranking.py) — no row-domain rank window
    hist = cal.groupBy("resid").agg(F.count(F.lit(1)).alias("c"))
    cum = RK.distributed_prefix_sum(
        hist.crossJoin(F.broadcast(ncal)),
        ["resid"],
        RK.range_bucket(F.col("resid"), F.col("rlo"), F.col("rhi")),
        ["c"],
        inclusive=True,
    )
    qhat = (
        cum.filter(
            F.col("cum_c")
            >= F.ceil((F.col("n") + 1) * F.lit(1 - _CONF_ALPHA)).cast(
                "bigint"
            )
        )
        .groupBy("n")
        .agg(F.min("resid").alias("q"))
        .select("q", "n")
    )
    test = ev.filter(day > 15).join(F.broadcast(train), "event_type")
    n_train = ev.filter(day <= 10).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train")
    )
    return (
        test.crossJoin(F.broadcast(qhat))
        .groupBy("n", "q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.round(
                F.count(F.when(F.abs(F.col("value") - F.col("pred")) <= F.col("q"), 1))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("empirical_coverage"),
        )
        .crossJoin(F.broadcast(n_train))
        .select(
            "n_train",
            F.col("n").cast("bigint").alias("n_cal"),
            "n_test",
            F.round("q", 6).alias("qhat"),
            F.lit(1 - _CONF_ALPHA).alias("target_coverage"),
            "empirical_coverage",
        )
    )
