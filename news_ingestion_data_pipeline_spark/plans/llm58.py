"""Fifty-eighth wave: absorbing-chain conversion probabilities.

events_markov_absorption answers the product question "given a user is
currently in state X, what is the probability they purchase within k
steps" by iterating the absorbing Markov chain built from observed
event-type transitions — the removal-effect/attribution machinery's core
computation, done with the engine's unrolled-oracle iterative recipe
(pagerank / HITS precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_ABS_STATE = "purchase"  # absorbing state
_ABS_STEPS = 10

_ABS_BASE = f"""WITH raw AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), e0 AS (
  SELECT src, event_type AS dst, COUNT(*) AS w
  FROM raw WHERE src IS NOT NULL AND src <> '{_ABS_STATE}'
  GROUP BY src, event_type
), outw AS (
  SELECT src, SUM(w) AS ow FROM e0 GROUP BY src
), trans AS MATERIALIZED (
  SELECT e0.src, e0.dst, CAST(e0.w AS DOUBLE) / CAST(outw.ow AS DOUBLE) AS p
  FROM e0 JOIN outw USING (src)
), nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM trans UNION ALL SELECT dst FROM trans
  )
), p0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = '{_ABS_STATE}' THEN 1.0 ELSE 0.0 END AS p
  FROM nodes
)"""


def _absorption_oracle() -> str:
    steps = []
    for k in range(1, _ABS_STEPS + 1):
        prev = f"p{k - 1}"
        steps.append(f""", p{k} AS MATERIALIZED (
  SELECT nd.node,
         CASE WHEN nd.node = '{_ABS_STATE}' THEN 1.0
              ELSE COALESCE(s.v, 0.0) END AS p
  FROM nodes nd LEFT JOIN (
    SELECT tr.src AS node, SUM(tr.p * pp.p) AS v
    FROM trans tr JOIN {prev} pp ON pp.node = tr.dst
    GROUP BY tr.src
  ) s ON nd.node = s.node
)""")
    return f"""{_ABS_BASE}{''.join(steps)}
SELECT node AS state, round(p, 8) AS p_absorb_{_ABS_STEPS}
FROM p{_ABS_STEPS}
ORDER BY p_absorb_{_ABS_STEPS} DESC, state
"""


@register(
    "events_markov_absorption",
    oracle=_absorption_oracle(),
    description=f"Absorbing-chain conversion probability: from the "
    "observed event-type transition matrix (rows from non-absorbing "
    f"states, '{_ABS_STATE}' made absorbing), iterate "
    f"P_k(v) = Σ_u T(v,u)·P_(k-1)(u) for {_ABS_STEPS} steps to get each "
    f"state's probability of reaching '{_ABS_STATE}' within "
    f"{_ABS_STEPS} transitions — the computation behind Markov "
    "attribution's removal effects and 'likelihood to convert from "
    "here' product dashboards (events_transition_matrix exposes the "
    "raw T; events_attribution_ushape is the heuristic sibling). Same "
    "iterative recipe as pagerank/HITS: per-round state is O(#states), "
    "each round one join + one aggregate, localCheckpoint truncation, "
    "and the oracle is the fixed-depth update unrolled as generated "
    "MATERIALIZED CTEs with term-identical arithmetic (round-8 absorbs "
    "summation-order drift).",
    tags=("events", "graph", "iterative"),
)
def events_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e0 = (
        t(spark, sf_dir, "events")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != _ABS_STATE))
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = e0.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (
        e0.join(outw, "src")
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("ow").cast("double")).alias("p"),
        )
        .persist()
    )
    nodes = (
        trans.select(F.col("src").alias("node"))
        .union(trans.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    p = nodes.select(
        "node",
        F.when(F.col("node") == _ABS_STATE, 1.0).otherwise(0.0).alias("p"),
    ).localCheckpoint()
    for _ in range(_ABS_STEPS):
        prev = p.withColumnRenamed("node", "dnode").withColumnRenamed("p", "pp")
        contrib = (
            trans.join(prev, trans["dst"] == F.col("dnode"))
            .groupBy(F.col("src").alias("cnode"))
            .agg(F.sum(F.col("p") * F.col("pp")).alias("v"))
        )
        p = (
            nodes.join(contrib, nodes["node"] == F.col("cnode"), "left")
            .select(
                "node",
                F.when(F.col("node") == _ABS_STATE, F.lit(1.0))
                .otherwise(F.coalesce(F.col("v"), F.lit(0.0)))
                .alias("p"),
            )
            .localCheckpoint()
        )
    out = p.select(
        F.col("node").alias("state"),
        F.round("p", 8).alias(f"p_absorb_{_ABS_STEPS}"),
    )
    trans.unpersist()
    nodes.unpersist()
    return out
