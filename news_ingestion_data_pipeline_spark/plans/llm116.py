"""Hundred-sixteenth wave: personalized PageRank and deterministic
language rebalancing.

  * graph_personalized_pagerank — PageRank with teleport pinned to a
    seed node ('signup'): the recommendation / relevance primitive
    ("importance FROM this node's point of view") that global PageRank
    can't answer.  Dangling mass also returns to the seed.  Same
    unrolled-iteration recipe as graph_pagerank_transitions.
  * curation_language_rebalance — class rebalancing for training
    mixes: every language is upsampled to the majority language's
    count with DETERMINISTIC replication (floor-quota per doc, the
    remainder going to the smallest doc_ids — no RNG, reproducible
    shards).  The plan actually materializes the replicas (explode of
    a per-doc sequence) and re-aggregates, proving the replication
    DAG, and the oracle certifies the result analytically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SEED = "signup"
_ITERS = 12
_D = 0.85


def _ppr_oracle() -> str:
    base = f"""WITH raw AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), e0 AS (
  SELECT src, event_type AS dst, COUNT(*) AS weight
  FROM raw WHERE src IS NOT NULL GROUP BY src, event_type
), outw AS (
  SELECT src, SUM(weight) AS out_weight FROM e0 GROUP BY src
), edges AS MATERIALIZED (
  SELECT e0.src, e0.dst,
         CAST(e0.weight AS DOUBLE) / CAST(outw.out_weight AS DOUBLE) AS prob
  FROM e0 JOIN outw USING (src)
), nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
), has_out AS MATERIALIZED (
  SELECT DISTINCT src FROM edges
), r0 AS MATERIALIZED (
  SELECT node, CASE WHEN node = '{_SEED}' THEN 1.0 ELSE 0.0 END AS rank
  FROM nodes
)"""
    steps = []
    for k in range(1, _ITERS + 1):
        prev = f"r{k - 1}"
        steps.append(f""", dang{k} AS (
  SELECT COALESCE(SUM(r.rank), 0.0) AS d
  FROM {prev} r LEFT JOIN has_out h ON r.node = h.src
  WHERE h.src IS NULL
), r{k} AS MATERIALIZED (
  SELECT nd.node,
         (CASE WHEN nd.node = '{_SEED}'
               THEN {1 - _D} + {_D} * (SELECT d FROM dang{k})
               ELSE 0.0 END)
         + {_D} * COALESCE(c.contrib, 0.0) AS rank
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank * e.prob) AS contrib
    FROM {prev} r JOIN edges e ON r.node = e.src
    GROUP BY e.dst
  ) c ON nd.node = c.node
)""")
    return (
        base
        + "".join(steps)
        + f"""
SELECT node, round(rank, 8) AS ppr
FROM r{_ITERS}
ORDER BY ppr DESC, node
"""
    )


@register(
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(),
    description=f"Personalized PageRank from the '{_SEED}' seed over the "
    "event-type transition graph: teleport mass (1-d) AND dangling mass "
    "both return to the seed instead of spreading uniformly, giving "
    "importance relative to the seed's neighborhood — the "
    "recommendation/relevance primitive global PageRank can't answer "
    f"({_ITERS} iterations, d={_D}). Same iterative recipe as "
    "graph_pagerank_transitions: per-round state is O(#nodes), one "
    "join + one aggregate per round with localCheckpoint truncation, "
    "and the oracle is the generated unrolled-CTE chain with "
    "term-identical IEEE arithmetic (round-8 absorbs summation-order "
    "drift). At 100 TB the edge table builds once from the event log; "
    "every extra seed is another column of the same iteration, not "
    "another pass over the data.",
    tags=("graph", "events", "iterative"),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    raw = t(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("src")
    )
    e0 = (
        raw.filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    outw = e0.groupBy("src").agg(F.sum("weight").alias("out_weight"))
    edges = (
        e0.join(outw, "src")
        .select(
            "src",
            "dst",
            (
                F.col("weight").cast("double")
                / F.col("out_weight").cast("double")
            ).alias("prob"),
        )
        .localCheckpoint()  # probed every iteration
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # pinned: probed once per iteration (12 rounds would otherwise each
    # recompute the distinct inside their checkpoint query)
    has_out = (
        edges.select(F.col("src").alias("node"), F.lit(True).alias("has_out"))
        .distinct()
        .localCheckpoint()
    )
    rank = nodes.select(
        "node",
        F.when(F.col("node") == _SEED, 1.0).otherwise(0.0).alias("rank"),
    ).localCheckpoint()
    for _ in range(_ITERS):
        contrib = (
            rank.join(edges, rank.node == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("prob")).alias("contrib"))
        )
        # Dangling mass as a global-window sum over the node-sized rank
        # frame (rank carries every node, so it IS the per-round base)
        # instead of a separate anti-join aggregate + broadcast cross
        # join: same terms (rows with no outgoing edge), two fewer job
        # submissions per round — profiled r11: this query ran 118 jobs /
        # 175 stages with ~0.05 s of task work per stage. Bounded domain:
        # the node set is the event-type vocabulary. The window executes
        # inside the per-round localCheckpoint, not in the final plan.
        dang = F.coalesce(
            F.sum(F.when(F.col("has_out").isNull(), F.col("rank"))).over(
                Window.partitionBy()
            ),
            F.lit(0.0),
        )
        rank = (
            rank.join(has_out, "node", "left")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.when(
                        F.col("node") == _SEED,
                        F.lit(1 - _D) + F.lit(_D) * dang,
                    ).otherwise(0.0)
                    + F.lit(_D) * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
            # per-round truncation stays: rank is consumed twice per
            # round, so skipping barriers doubles the subtree per round —
            # tried a 3-round cadence (jobs 96 -> 72) but the duplicated
            # chains raised AQE stage materializations 154 -> 202 for no
            # wall win
            .localCheckpoint()
        )
    return rank.select(
        "node", F.round("rank", 8).alias("ppr")
    )


@register(
    "curation_language_rebalance",
    oracle="""
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
),
target AS (
  SELECT MAX(n) AS tgt FROM counts
),
ranked AS (
  SELECT d.doc_id, d.lang, c.n, t.tgt,
         ROW_NUMBER() OVER (PARTITION BY d.lang ORDER BY d.doc_id) AS rn
  FROM documents d JOIN counts c USING (lang) CROSS JOIN target t
),
quota AS (
  SELECT doc_id, lang, n, tgt,
         tgt // n + CASE WHEN rn <= tgt % n THEN 1 ELSE 0 END AS reps
  FROM ranked
)
SELECT lang,
       CAST(MAX(n) AS BIGINT) AS n_orig,
       CAST(SUM(reps) AS BIGINT) AS n_out,
       CAST(SUM(doc_id * reps) AS BIGINT) AS docid_checksum,
       CAST(MAX(reps) - MIN(reps) AS BIGINT) AS quota_spread
FROM quota
GROUP BY lang
ORDER BY lang
""",
    description="Deterministic minority-language upsampling to the "
    "majority count: per-doc replica quota = floor(target/n) with the "
    "remainder assigned to the smallest doc_ids (no RNG — shards are "
    "reproducible run-to-run, the property sampling-based rebalancing "
    "loses). The Spark plan MATERIALIZES the replicas (explode of a "
    "per-doc sequence) and re-aggregates, so the replication DAG "
    "actually runs; the oracle certifies counts and the doc_id-weighted "
    "checksum analytically. quota_spread <= 1 by construction — the "
    "fairest integer apportionment. Scale shape: the quota computation "
    "shuffles only (lang, doc_id); the explode multiplies rows "
    "map-side AFTER the shuffle, exactly where a 100 TB upsample wants "
    "the fan-out.",
    tags=("curation", "sampling"),
)
def curation_language_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    target = counts.agg(F.max("n").alias("tgt"))
    ranked = (
        docs.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(target))
        .select(
            "doc_id",
            "lang",
            "n",
            "tgt",
            F.row_number()
            .over(Window.partitionBy("lang").orderBy("doc_id"))
            .alias("rn"),
        )
    )
    quota = ranked.select(
        "doc_id",
        "lang",
        "n",
        F.expr("tgt div n + CASE WHEN rn <= tgt % n THEN 1 ELSE 0 END").alias(
            "reps"
        ),
    )
    replicas = quota.select(
        "doc_id",
        "lang",
        "n",
        "reps",
        F.explode(F.sequence(F.lit(1), F.col("reps"))).alias("copy_no"),
    )
    return (
        replicas.groupBy("lang")
        .agg(
            F.max("n").cast("bigint").alias("n_orig"),
            F.count(F.lit(1)).alias("n_out"),
            F.sum("doc_id").alias("docid_checksum"),
            (
                F.max(
                    F.when(F.col("copy_no") == 1, F.col("reps"))
                )
                - F.min(F.when(F.col("copy_no") == 1, F.col("reps")))
            )
            .cast("bigint")
            .alias("quota_spread"),
        )
        
    )
