"""Hundred-eleventh wave: weighted shortest paths and Markov
removal-effect attribution.

  * graph_weighted_sssp — Bellman–Ford single-source (multi-seed)
    shortest paths over the co-presence graph with integer edge costs
    (strong ties are cheap: cost = 1000 div co-occurrence count).
    The weighted upgrade of graph_bfs_distances: k relaxation rounds,
    each one join + one min-aggregate, all-BIGINT arithmetic so the
    distances are bit-exact across engines.
  * events_markov_removal_effect — full Markov attribution: absorbing-
    chain conversion probability from the empirical start distribution,
    recomputed with each channel knocked out of the transition matrix
    (transitions into the removed channel become loss, no
    renormalization), removal effect = 1 - p_removed / p_base.  The
    what-if grid (one tag per candidate channel + a base tag) rides a
    SINGLE k-round iteration keyed by (tag, state) — the 100 TB shape:
    adding scenarios widens one small keyed state, it never re-reads
    the events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_ROUNDS = 4

_WEDGES_SQL = """presence AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 600000000 AS bkt, user_id
  FROM events
), sized AS (
  SELECT event_type, bkt FROM presence
  GROUP BY event_type, bkt HAVING COUNT(*) <= 30
), p AS (
  SELECT presence.* FROM presence JOIN sized USING (event_type, bkt)
), wedges AS (
  SELECT a.user_id AS u, b.user_id AS v, 1000 // COUNT(*) AS w
  FROM p a JOIN p b
    ON a.event_type = b.event_type AND a.bkt = b.bkt AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
  HAVING COUNT(*) >= 2
), und AS (
  SELECT u, v, w FROM wedges UNION ALL SELECT v, u, w FROM wedges
)"""


def _sssp_oracle() -> str:
    steps = []
    for k in range(1, _ROUNDS + 1):
        prev = f"d{k - 1}"
        steps.append(f""", d{k} AS MATERIALIZED (
  SELECT u, MIN(dist) AS dist FROM (
    SELECT u, dist FROM {prev}
    UNION ALL
    SELECT e.v AS u, p.dist + e.w AS dist
    FROM {prev} p JOIN und e ON e.u = p.u
  ) GROUP BY u
)""")
    return f"""WITH {_WEDGES_SQL},
d0 AS MATERIALIZED (
  SELECT DISTINCT u, CAST(0 AS BIGINT) AS dist FROM und WHERE u % 50 = 0
){''.join(steps)}
SELECT u AS user_id, CAST(dist AS BIGINT) AS dist
FROM d{_ROUNDS}
ORDER BY user_id
"""


@register(
    "graph_weighted_sssp",
    oracle=_sssp_oracle(),
    description="Bellman–Ford multi-seed weighted shortest paths over the "
    "co-presence graph (integer edge cost 1000 div co-occurrence count, so "
    "stronger ties are cheaper), seeds = user_id % 50 == 0, "
    f"{_ROUNDS} relaxation rounds. Each round is one frontier-join + one "
    "min-aggregate with localCheckpoint lineage truncation — shuffles stay "
    "O(edges), rounds bound path length exactly like the BFS sibling, and "
    "every distance is BIGINT arithmetic so the result is bit-identical to "
    "the oracle's unrolled min-merge CTE chain. At 100 TB this is the "
    "standard iterate-until-k pattern: per-round state is node-sized, the "
    "edge table partitions by source once and is reused every round.",
    tags=("graph", "events", "iterative"),
)
def graph_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 600000000").alias("bkt"),
        "user_id",
    )
    presence = ev.distinct()
    sized = (
        presence.groupBy("event_type", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= 30)
        .select("event_type", "bkt")
    )
    p = presence.join(sized, ["event_type", "bkt"])
    a, b = p.alias("a"), p.alias("b")
    wedges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= 2)
        .select("u", "v", F.expr("1000 div ns").cast("bigint").alias("w"))
    )
    # Mirrored union, not explode-of-struct-array: the r11 single-pass
    # explode form regressed in both harnesses (min-of-3 1.85 -> 2.46 s) —
    # it serializes the row doubling into one task set ahead of the
    # checkpoint, while the union's two branches run concurrently and the
    # duplicated head pipeline is only ~1.3 MB of exchange.
    und = wedges.unionByName(
        wedges.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).localCheckpoint()  # probed once per relaxation round

    dist = (
        und.select("u")
        .distinct()
        .filter(F.col("u") % 50 == 0)
        .select("u", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint()
    )
    for _ in range(_ROUNDS):
        relaxed = dist.join(und, "u").select(
            F.col("v").alias("u"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("u")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select(F.col("u").alias("user_id"), "dist")


_ABS_STATE = "purchase"
_RE_STEPS = 8

_RE_BASE = f"""WITH raw AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src,
         CASE WHEN lag(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_first
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
), starts AS MATERIALIZED (
  SELECT event_type AS node,
         CAST(COUNT(*) AS DOUBLE)
           / (SELECT COUNT(*) FROM raw WHERE is_first = 1) AS pi
  FROM raw WHERE is_first = 1 GROUP BY event_type
), nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM trans UNION ALL SELECT dst FROM trans
  )
), tags AS MATERIALIZED (
  SELECT '__base__' AS tag
  UNION ALL
  SELECT DISTINCT node FROM nodes WHERE node <> '{_ABS_STATE}'
), ttrans AS MATERIALIZED (
  SELECT tg.tag, tr.src, tr.dst, tr.p
  FROM tags tg CROSS JOIN trans tr
  WHERE tg.tag = '__base__' OR (tr.src <> tg.tag AND tr.dst <> tg.tag)
), p0 AS MATERIALIZED (
  SELECT tg.tag, nd.node,
         CASE WHEN nd.node = '{_ABS_STATE}' THEN 1.0 ELSE 0.0 END AS p
  FROM tags tg CROSS JOIN nodes nd
  WHERE tg.tag = '__base__' OR nd.node <> tg.tag
)"""


def _removal_oracle() -> str:
    steps = []
    for k in range(1, _RE_STEPS + 1):
        prev = f"p{k - 1}"
        steps.append(f""", p{k} AS MATERIALIZED (
  SELECT pv.tag, pv.node,
         CASE WHEN pv.node = '{_ABS_STATE}' THEN 1.0
              ELSE COALESCE(s.v, 0.0) END AS p
  FROM p0 pv LEFT JOIN (
    SELECT tr.tag, tr.src AS node, SUM(tr.p * pp.p) AS v
    FROM ttrans tr JOIN {prev} pp ON pp.tag = tr.tag AND pp.node = tr.dst
    GROUP BY tr.tag, tr.src
  ) s ON pv.tag = s.tag AND pv.node = s.node
)""")
    return f"""{_RE_BASE}{''.join(steps)},
conv AS (
  SELECT pk.tag, SUM(st.pi * pk.p) AS p_conv
  FROM p{_RE_STEPS} pk JOIN starts st ON st.node = pk.node
  GROUP BY pk.tag
)
SELECT c.tag AS channel,
       round(c.p_conv, 8) AS p_removed,
       round(1.0 - c.p_conv / b.p_conv, 8) AS removal_effect
FROM conv c CROSS JOIN (SELECT p_conv FROM conv WHERE tag = '__base__') b
WHERE c.tag <> '__base__'
ORDER BY channel
"""


@register(
    "events_markov_removal_effect",
    oracle=_removal_oracle(),
    description="Markov-attribution removal effects: absorbing-chain "
    f"conversion probability into '{_ABS_STATE}' within {_RE_STEPS} steps "
    "from the empirical first-event start distribution, recomputed with "
    "each candidate channel knocked out (its rows AND columns dropped "
    "from the transition matrix — lost mass is the point, no "
    "renormalization), removal_effect = 1 - p_removed/p_base. The whole "
    "what-if grid (4 channels + base) is ONE iteration keyed by (tag, "
    "state): the tagged transition matrix is built once, every round is "
    "a single join + aggregate over a few dozen rows, and events are "
    "read exactly once — the same scenario-grid shape as "
    "agg_scenario_grid_whatif, applied to an iterative chain. Arithmetic "
    "mirrors events_markov_absorption (round-8 absorbs summation-order "
    "drift on the tiny state space).",
    tags=("events", "graph", "iterative", "attribution"),
)
def events_markov_removal_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    raw = t(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("src")
    )
    # ONE pass over the windowed events: the (src, dst) count grid is
    # tiny (|event types|^2 + first-touch rows) and every downstream
    # frame — transitions, start distribution, node set — derives from
    # it. The former shape re-ran the full window pass three times
    # (e0, firsts.count() driver action, starts).
    g = (
        raw.groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    e0 = g.filter(F.col("src").isNotNull() & (F.col("src") != _ABS_STATE))
    outw = e0.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = e0.join(outw, "src").select(
        "src", "dst", (F.col("w").cast("double") / F.col("ow")).alias("p")
    )
    firsts_g = g.filter(F.col("src").isNull())
    # bcast-ok: single-row total of the tiny first-touch grid
    starts = firsts_g.crossJoin(
        F.broadcast(firsts_g.agg(F.sum("w").alias("tot")))
    ).select(
        F.col("dst").alias("node"),
        (F.col("w").cast("double") / F.col("tot")).alias("pi"),
    )
    nodes = (
        trans.select(F.col("src").alias("node"))
        .unionByName(trans.select(F.col("dst").alias("node")))
        .distinct()
    )
    tags = (
        nodes.filter(F.col("node") != _ABS_STATE)
        .select(F.col("node").alias("tag"))
        .unionByName(
            nodes.sparkSession.range(1).select(F.lit("__base__").alias("tag"))
        )
    )
    ttrans = (
        tags.crossJoin(trans)
        .filter(
            (F.col("tag") == "__base__")
            | ((F.col("src") != F.col("tag")) & (F.col("dst") != F.col("tag")))
        )
        # the iterate is a (tags x trans)-sized grid (~200 rows): collapse
        # to ONE partition before checkpointing so each of the 8 loop
        # rounds schedules 1 task, not 32. r10 adjudication: the loop's
        # wall time (~0.25-0.35 s/round at any SF) is per-JOB driver fixed
        # cost, not task or shuffle work — broadcast-hinted and
        # checkpoint-free variants measured the SAME 3.5-4.3 s min-of-3,
        # so the r7->r9 drift (2.5 -> 3.3 s) is driver-latency weather.
        # The loop cost is CONSTANT in SF; only the corpus pass scales.
        .coalesce(1)
        .localCheckpoint()  # reused every iteration round
    )
    p = (
        tags.crossJoin(nodes)
        .filter((F.col("tag") == "__base__") | (F.col("node") != F.col("tag")))
        .select(
            "tag",
            "node",
            F.when(F.col("node") == _ABS_STATE, 1.0).otherwise(0.0).alias("p"),
        )
        .coalesce(1)
        .localCheckpoint()
    )
    shell = p.select("tag", "node")
    for _ in range(_RE_STEPS):
        stepped = (
            ttrans.alias("tr")
            .join(
                p.alias("pp"),
                (F.col("pp.tag") == F.col("tr.tag"))
                & (F.col("pp.node") == F.col("tr.dst")),
            )
            .groupBy(F.col("tr.tag").alias("tag"), F.col("tr.src").alias("node"))
            .agg(F.sum(F.col("tr.p") * F.col("pp.p")).alias("v"))
        )
        p = (
            shell.join(stepped, ["tag", "node"], "left")
            .select(
                "tag",
                "node",
                F.when(F.col("node") == _ABS_STATE, 1.0)
                .otherwise(F.coalesce("v", F.lit(0.0)))
                .alias("p"),
            )
            .coalesce(1)
            .localCheckpoint()
        )
    conv = (
        p.join(starts, "node")
        .groupBy("tag")
        .agg(F.sum(F.col("pi") * F.col("p")).alias("p_conv"))
    )
    base = conv.filter(F.col("tag") == "__base__").select(
        F.col("p_conv").alias("p_base")
    )
    return (
        conv.filter(F.col("tag") != "__base__")
        # bcast-ok: 1-row baseline conversion frame
        .crossJoin(F.broadcast(base))
        .select(
            F.col("tag").alias("channel"),
            F.round("p_conv", 8).alias("p_removed"),
            F.round(1.0 - F.col("p_conv") / F.col("p_base"), 8).alias(
                "removal_effect"
            ),
        )
        
    )
