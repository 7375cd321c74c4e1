"""Tenth wave: windowed band flags from exact decimal frame sums,
behavioral entropy (bot-detection feature), and MMR-diversified
retrieval (unrolled greedy oracle) — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df


@register(
    "window_bollinger_flags",
    oracle="""
WITH w AS (
  SELECT user_id, event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value,
         COUNT(*) OVER fr AS n,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) OVER fr AS VARCHAR)
              AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))
                       * CAST(value AS DECIMAL(20,10))) OVER fr AS VARCHAR)
              AS DOUBLE) AS sxx
  FROM events
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, ts_s, value,
       round(sx / n, 6) AS mid,
       round(CASE WHEN n > 1
             THEN sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0))
             ELSE 0.0 END, 6) AS band_sd,
       n > 1 AND abs(value - sx / n)
         > 2 * sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) AS outside
FROM w
""",
    description="Bollinger-band outlier flags over each user's trailing "
    "20 events: rolling mean and rolling sample-stddev derived from "
    "EXACT DECIMAL window power sums (sum, sum-of-squares over the "
    "frame) — the agg_stats_suite sufficient-statistics treatment moved "
    "into a window frame, so the rolling moments are deterministic "
    "where a naive double window sum depends on frame accumulation "
    "order. One (user) shuffle; both window sums and the flag share the "
    "frame. greatest(.,0) guards the catastrophic-cancellation corner "
    "where the variance formula goes epsilon-negative on "
    "near-constant frames.",
    tags=("window", "timeseries", "stats"),
)
def window_bollinger_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(20,10)"
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    x = F.col("value").cast(dec)
    n = F.count(F.lit(1)).over(fr)
    sx = F.sum(x).over(fr).cast("double")
    sxx = F.sum(x * x).over(fr).cast("double")
    var = F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0))
    sd = F.when(n > 1, F.sqrt(var)).otherwise(F.lit(0.0))
    return t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
        F.round(sx / n, 6).alias("mid"),
        F.round(sd, 6).alias("band_sd"),
        ((n > 1) & (F.abs(F.col("value") - sx / n) > 2 * F.sqrt(var))).alias(
            "outside"
        ),
    )


@register(
    "events_entropy_by_user",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
), logs AS (
  SELECT user_id, event_type, c,
         CAST(round(log2(c), 9) AS DECIMAL(28,12)) AS log2_c
  FROM counts
), per_user AS (
  SELECT user_id, SUM(c) AS n,
         SUM(c * log2_c) AS sum_c_log2c,
         COUNT(*) AS n_types
  FROM logs GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n, n_types,
       round(round(log2(n), 9)
             - CAST(CAST(sum_c_log2c AS VARCHAR) AS DOUBLE) / n, 6)
         AS entropy_bits
FROM per_user
ORDER BY user_id
""",
    description="Behavioral entropy per user — the bot-detection / "
    "diversity feature: H = log2(n) - (1/n) sum c_t*log2(c_t) over the "
    "user's event-type distribution (near-zero entropy = monomaniacal "
    "automation, high = organic mix). Same determinism treatment as "
    "text_unigram_logprob: log2 evaluated once per (user, type) COUNT — "
    "a bounded set — rounded to 9 dp and folded through exact DECIMAL "
    "arithmetic, so the sum is partition-order-proof. Two aggregates "
    "sharing the (user) shuffle.",
    tags=("events", "stats", "anomaly"),
)
def events_entropy_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(28,12)"
    counts = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    logs = counts.select(
        "user_id",
        "c",
        F.round(F.log2("c"), 9).cast(dec).alias("log2_c"),
    )
    per_user = logs.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("log2_c")).alias("sum_c_log2c"),
        F.count(F.lit(1)).alias("n_types"),
    )
    entropy = F.round(F.log2("n"), 9) - F.col("sum_c_log2c").cast(
        "double"
    ) / F.col("n")
    return per_user.select(
        "user_id",
        "n",
        "n_types",
        F.round(entropy, 6).alias("entropy_bits"),
    )


def _mmr_oracle(k: int = 5, lam: str = "0.7") -> str:
    """Greedy MMR unrolled: step i picks argmax of
    lam*rel - (1-lam)*max_sim_to_selected among remaining candidates.
    Mirrors the driver loop in sim_mmr_diversified; candidates are query
    0's top-20 exact neighbors."""
    cos = (
        "round(list_dot_product({a}.v, {b}.v) / (sqrt(list_dot_product({a}.v, {a}.v))"
        " * sqrt(list_dot_product({b}.v, {b}.v))), 6)"
    )
    head = f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v FROM e WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id, e.v, {cos.format(a='e', b='q')} AS rel
  FROM e, q WHERE e.vec_id != 0
  ORDER BY rel DESC, e.vec_id LIMIT 20
),
sel0(rank, vec_id) AS (SELECT 0, -1 WHERE FALSE)"""
    steps = []
    for i in range(1, k + 1):
        prev = f"sel{i-1}"
        steps.append(f"""pick{i} AS (
  SELECT CAST({i} AS BIGINT) AS rank, c.vec_id FROM cand c
  WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
  ORDER BY {lam} * c.rel - (1 - {lam}) * COALESCE(
      (SELECT MAX({cos.format(a='c', b='s')})
       FROM cand s WHERE s.vec_id IN (SELECT vec_id FROM {prev})), 0.0)
    DESC, c.vec_id
  LIMIT 1
),
sel{i}(rank, vec_id) AS (
  SELECT rank, vec_id FROM {prev}
  UNION ALL SELECT rank, vec_id FROM pick{i})""")
    tail = f"""
SELECT rank, vec_id AS neighbor_id FROM sel{k} ORDER BY rank"""
    return head + ",\n" + ",\n".join(steps) + tail


@register(
    "sim_mmr_diversified",
    oracle=_mmr_oracle(5, "0.7"),
    description="Maximal Marginal Relevance (Carbonell & Goldstein 1998) "
    "— diversified retrieval: from query 0's top-20 exact neighbors, "
    "greedily pick 5 maximizing lam*relevance - (1-lam)*max-similarity-"
    "to-already-picked, so near-duplicate neighbors don't crowd the "
    "result (the retrieval-side complement of SemDeDup's corpus-side "
    "pruning). The greedy loop is DRIVER-CONTROLLED over a 20-row "
    "candidate set — the pattern for k-step iterative selection where "
    "k and the candidate pool are small and the heavy work (the exact "
    "top-20) is the distributed part. The oracle unrolls the 5 greedy "
    "steps as CTEs (like the PageRank oracle), term-for-term identical "
    "arithmetic with deterministic (score DESC, id) tie-break.",
    tags=("llm", "similarity", "retrieval"),
)
def sim_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V

    lam = 0.7
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cand_df = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.round(V.cosine(F.col("v"), F.col("qv")), 6).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(20)
    )
    # driver-ok: 20 rows — cand_df carries .limit(20); the greedy MMR
    # pool is deliberately driver-side
    cand = cand_df.collect()

    import math

    def cos6(a: list[float], b: list[float]) -> float:
        # identical arithmetic to functions.vectors.cosine: sequential
        # left-to-right fold, then round to 6
        dot = 0.0
        na = 0.0
        nb = 0.0
        for xa, xb in zip(a, b):
            dot += xa * xb
        for xa in a:
            na += xa * xa
        for xb in b:
            nb += xb * xb
        if na > 0 and nb > 0:
            return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
        return 0.0

    selected: list = []
    remaining = {r["vec_id"]: r for r in cand}
    while len(selected) < 5 and remaining:
        best = None
        for vid in sorted(remaining):
            r = remaining[vid]
            max_sim = max(
                (cos6(r["v"], s["v"]) for s in selected), default=0.0
            )
            score = lam * r["rel"] - (1 - lam) * max_sim
            if best is None or score > best[0] or (
                score == best[0] and vid < best[1]
            ):
                best = (score, vid)
        selected.append(remaining.pop(best[1]))

    rows = [(i + 1, r["vec_id"]) for i, r in enumerate(selected)]
    return local_df(spark, rows, "rank long, neighbor_id long")
