"""Seventy-eighth wave: most-probable transition paths.

graph_most_probable_paths runs Bellman-Ford over the event-type
transition graph with −ln(p) edge weights — shortest path in that metric
IS the most probable multi-step path (the Viterbi trick), answering "what
is the likeliest journey from 'signup' to each other state" — the
weighted-path member the graph family lacked (graph_bfs_distances is
hop-count only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MPP_SEED = "signup"
_MPP_ROUNDS = 6

_MPP_BASE = f"""WITH raw AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), e0 AS (
  SELECT src, dst, COUNT(*) AS w
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY src, dst
), outw AS (
  SELECT src, SUM(w) AS ow FROM e0 GROUP BY src
), edges AS MATERIALIZED (
  SELECT e0.src, e0.dst,
         CAST(round(-ln(CAST(e0.w AS DOUBLE) / outw.ow), 9) AS DECIMAL(18,9))
           AS cost
  FROM e0 JOIN outw USING (src)
), nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
), d0 AS MATERIALIZED (
  SELECT node,
         CASE WHEN node = '{_MPP_SEED}' THEN CAST(0 AS DECIMAL(18,9)) END AS d
  FROM nodes
)"""


def _mpp_oracle() -> str:
    steps = []
    for k in range(1, _MPP_ROUNDS + 1):
        p = k - 1
        steps.append(f""", d{k} AS MATERIALIZED (
  SELECT nd.node,
         CASE WHEN pd.d IS NULL AND rx.best IS NULL THEN NULL
              ELSE LEAST(COALESCE(pd.d, rx.best), COALESCE(rx.best, pd.d))
         END AS d
  FROM nodes nd
  LEFT JOIN d{p} pd ON pd.node = nd.node
  LEFT JOIN (
    SELECT e.dst AS node, MIN(pp.d + e.cost) AS best
    FROM d{p} pp JOIN edges e ON e.src = pp.node
    WHERE pp.d IS NOT NULL
    GROUP BY e.dst
  ) rx ON rx.node = nd.node
)""")
    return f"""{_MPP_BASE}{''.join(steps)}
SELECT node AS state,
       round(CAST(CAST(d AS VARCHAR) AS DOUBLE), 6) AS neg_log_prob,
       round(exp(-CAST(CAST(d AS VARCHAR) AS DOUBLE)), 6) AS best_path_prob
FROM d{_MPP_ROUNDS}
WHERE d IS NOT NULL
ORDER BY neg_log_prob, state
"""


@register(
    "graph_most_probable_paths",
    oracle=_mpp_oracle(),
    description=f"Most-probable paths from '{_MPP_SEED}' to every other "
    "event-type state: Bellman-Ford over the transition graph with "
    "−ln(transition probability) edge costs — shortest path in that "
    "metric IS the maximum-probability path (the Viterbi identity), so "
    "each state reports the log-cost and probability of the single "
    "likeliest journey from the seed; the weighted companion of "
    "graph_bfs_distances (hops) and events_markov_absorption "
    f"(probability of EVENTUALLY arriving). {_MPP_ROUNDS} relaxation "
    "rounds (≥ graph diameter; convergence asserted by tests), the "
    "engine's unrolled-oracle iterative recipe. Edge costs are "
    "rounded to 9 dp and carried as DECIMAL so path sums are exact "
    "and min-relaxation ties cannot flip cross-engine; per-round "
    "state is O(#nodes), each round one join + one min-aggregate.",
    tags=("graph", "events", "iterative"),
)
def graph_most_probable_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e0 = (
        t(spark, sf_dir, "events")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("event_type")))
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    outw = e0.groupBy("src").agg(F.sum("w").alias("ow"))
    edges = (
        e0.join(outw, "src")
        .select(
            "src",
            "dst",
            F.round(
                -F.log(F.col("w").cast("double") / F.col("ow")), 9
            )
            .cast("decimal(18,9)")
            .alias("cost"),
        )
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    d = nodes.select(
        "node",
        F.when(F.col("node") == _MPP_SEED, F.lit(0).cast("decimal(18,9)")).alias("d"),
    ).localCheckpoint()
    for _ in range(_MPP_ROUNDS):
        relaxed = (
            d.filter(F.col("d").isNotNull())
            .withColumnRenamed("node", "snode")
            .join(edges, F.col("snode") == edges["src"])
            .groupBy(F.col("dst").alias("rnode"))
            .agg(F.min(F.col("d") + F.col("cost")).alias("best"))
        )
        d = (
            nodes.join(d.withColumnRenamed("node", "pnode"), F.col("node") == F.col("pnode"), "left")
            .join(relaxed, F.col("node") == F.col("rnode"), "left")
            .select(
                "node",
                F.when(
                    F.col("d").isNull() & F.col("best").isNull(), F.lit(None)
                )
                .otherwise(
                    F.least(
                        F.coalesce(F.col("d"), F.col("best")),
                        F.coalesce(F.col("best"), F.col("d")),
                    )
                )
                .alias("d"),
            )
            .localCheckpoint()
        )
    out = (
        d.filter(F.col("d").isNotNull())
        .select(
            F.col("node").alias("state"),
            F.round(F.col("d").cast("double"), 6).alias("neg_log_prob"),
            F.round(F.exp(-F.col("d").cast("double")), 6).alias("best_path_prob"),
        )
        
    )
    edges.unpersist()
    nodes.unpersist()
    return out
