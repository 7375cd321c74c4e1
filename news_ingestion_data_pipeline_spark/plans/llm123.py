"""Hundred-twenty-third wave: k-center coreset selection and the
binary-prefilter → exact-rerank retrieval composition.

  * curation_kcenter_coreset — greedy k-center (farthest-point
    traversal) over the embedding table: iteratively pick the point
    farthest from everything selected so far.  THE classic coreset /
    diverse-subset selection for training-data pruning (maximizes
    coverage radius; sim_mmr_diversified is the relevance-weighted
    cousin).  Deterministic: seeded at vec_id 0, total (distance DESC,
    id) tie order, squared-L2 via the engine-identical fold.
  * sim_hamming_reranked — the production two-stage retrieval: the
    1-BIGINT sign signature prunes to 50 Hamming candidates, exact
    cosine re-ranks to top-5.  Composes wave 122's prefilter with the
    exact scorer, certifying the full pipeline end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_K = 10
_SQ_TERMS = " + ".join(
    f"(p.v[{i}] - c.v[{i}]) * (p.v[{i}] - c.v[{i}])" for i in range(1, 65)
)


def _kcenter_oracle() -> str:
    base = f"""WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
c0 AS (SELECT vec_id, v FROM e WHERE vec_id = 0),
md0 AS (
  SELECT p.vec_id, p.v, {_SQ_TERMS} AS d
  FROM e p CROSS JOIN c0 c
)"""
    steps = []
    for k in range(1, _K):
        prev = f"md{k - 1}"
        steps.append(f""", pick{k} AS (
  SELECT vec_id, v, d FROM {prev} ORDER BY d DESC, vec_id LIMIT 1
), md{k} AS (
  SELECT p.vec_id, p.v, LEAST(p.d, {_SQ_TERMS}) AS d
  FROM {prev} p CROSS JOIN pick{k} c
)""")
    picks = "\n  UNION ALL ".join(
        [
            "SELECT 0 AS step, vec_id, CAST('Infinity' AS DOUBLE) AS d FROM c0"
        ]
        + [
            f"SELECT {k} AS step, vec_id, d FROM pick{k}"
            for k in range(1, _K)
        ]
    )
    return (
        base
        + "".join(steps)
        + f"""
SELECT step, vec_id AS center_id,
       CASE WHEN step = 0 THEN NULL ELSE round(d, 6) END AS sqdist_at_pick
FROM ({picks})
ORDER BY step
"""
    )


@register(
    "curation_kcenter_coreset",
    oracle=_kcenter_oracle(),
    description=f"Greedy k-center coreset selection (farthest-point "
    f"traversal, k={_K}) over the embeddings: each step picks the point "
    "with the MAXIMUM distance to the selected set (total (d DESC, id) "
    "order), then relaxes every point's min-distance against the new "
    "center — the coverage-maximizing subset selection used for "
    "training-data pruning and landmark picking (the 2-approximation of "
    "the k-center objective). Deterministic end to end: seed vec_id 0, "
    "squared-L2 via the left-associative fold both engines execute "
    "identically, exact double comparisons. Scale shape: state is one "
    "min-distance column updated per round against ONE broadcast center "
    "— k rounds, zero vector shuffles, the standard distributed "
    "farthest-point schedule.",
    tags=("curation", "similarity", "iterative"),
)
def curation_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def sqdist(pv, cv):
        return F.aggregate(
            F.zip_with(pv, cv, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    c0 = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("cv")
    )
    md = (
        e.crossJoin(F.broadcast(c0))
        .select("vec_id", "v", sqdist(F.col("v"), F.col("cv")).alias("d"))
        .localCheckpoint()
    )
    picks = [(0, None)]
    rows = [
        md.sparkSession.range(1).select(
            F.lit(0).alias("step"),
            F.lit(0).cast("bigint").alias("center_id"),
            F.lit(None).cast("double").alias("sqdist_at_pick"),
        )
    ]
    # Two queries per greedy round (orderBy-limit-1 pick, then relax
    # against the broadcast pick). r11 fused them into one via a global
    # max-struct window carrying the full center vector into every row —
    # fewer jobs (31 -> 22) but SLOWER in both harnesses (min-of-3
    # 1.78 -> 2.12 s, and 3.34 s by this round's baseline): the
    # single-partition window serializes the round and the checkpoint
    # re-materializes the widened rows, while limit-1 plans as a cheap
    # TakeOrdered. Reverted to the r10 form.
    for k in range(1, _K):
        pick = (
            md.orderBy(F.desc("d"), "vec_id")
            .limit(1)
            .select(
                F.col("vec_id").alias("pick_id"),
                F.col("v").alias("cv"),
                F.col("d").alias("pick_d"),
            )
            .localCheckpoint()
        )
        rows.append(
            pick.select(
                F.lit(k).alias("step"),
                F.col("pick_id").cast("bigint").alias("center_id"),
                F.round("pick_d", 6).alias("sqdist_at_pick"),
            )
        )
        md = (
            md.crossJoin(F.broadcast(pick.select("cv")))
            .select(
                "vec_id",
                "v",
                F.least(
                    F.col("d"), sqdist(F.col("v"), F.col("cv"))
                ).alias("d"),
            )
            .localCheckpoint()
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


_NQ = 10
_PREFILTER = 50
_POWS_SQL = (
    "["
    + ", ".join(
        [f"{1 << kk}::BIGINT" for kk in range(63)]
        + ["(-9223372036854775807::BIGINT - 1)"]
    )
    + "]"
)
_DOT = " + ".join(f"q.v[{i}] * e.v[{i}]" for i in range(1, 65))
_NRM = lambda a: " + ".join(f"{a}.v[{i}] * {a}.v[{i}]" for i in range(1, 65))


@register(
    "sim_hamming_reranked",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
sig AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(range(1, 65),
           i -> CASE WHEN v[i] > 0 THEN {_POWS_SQL}[i]
                     ELSE 0::BIGINT END)) AS BIGINT) AS s
  FROM e
),
q AS (SELECT vec_id AS qid, s AS qs FROM sig WHERE vec_id < {_NQ}),
ham AS (
  SELECT q.qid, sig.vec_id AS nid,
         bit_count(xor(q.qs, sig.s)) AS hamming,
         ROW_NUMBER() OVER (
           PARTITION BY q.qid
           ORDER BY bit_count(xor(q.qs, sig.s)), sig.vec_id) AS hrn
  FROM q JOIN sig ON sig.vec_id <> q.qid
),
cand AS (SELECT qid, nid, hamming FROM ham WHERE hrn <= {_PREFILTER}),
scored AS (
  SELECT c.qid, c.nid, c.hamming,
         round(({_DOT}) / (sqrt({_NRM('q')}) * sqrt({_NRM('e')})), 6)
           AS cosine
  FROM cand c
  JOIN e q ON q.vec_id = c.qid
  JOIN e ON e.vec_id = c.nid
),
ranked AS (
  SELECT qid, nid, hamming, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, nid) AS rn
  FROM scored
)
SELECT qid, CAST(rn AS BIGINT) AS rank, nid,
       CAST(hamming AS BIGINT) AS hamming, cosine
FROM ranked WHERE rn <= 5
ORDER BY qid, rank
""",
    description="Two-stage retrieval composition: the 1-BIGINT sign "
    f"signature prunes each query to {_PREFILTER} Hamming candidates "
    "(XOR + popcount — wave 122's prefilter), then EXACT cosine re-ranks "
    "to top-5 — precisely how binary-embedding serving tiers are "
    "deployed (cheap bits first, floats only on the shortlist). Cosine "
    "uses the engine-identical left-associative dot/norm folds with "
    "total (score DESC, id) order. Scale shape: stage 1 scans 8-byte "
    "signatures; stage 2 touches only shortlist·query vector pairs — the "
    "float table is never broadcast or self-joined.",
    tags=("similarity",),
)
def sim_hamming_reranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    pows = F.array(
        *[F.lit(1 << kk).cast("bigint") for kk in range(63)],
        F.lit(-(1 << 63)).cast("bigint"),
    )
    sig = e.select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(64)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.when(
                F.element_at("v", i.cast("int")) > 0,
                F.element_at(pows, i.cast("int")),
            ).otherwise(F.lit(0).cast("bigint")),
        ).alias("s"),
    ).localCheckpoint()
    q = sig.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("qid"), F.col("s").alias("qs")
    )
    wh = Window.partitionBy("qid").orderBy("hamming", "nid")
    cand = (
        F.broadcast(q)
        .crossJoin(sig)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.bit_count(F.col("qs").bitwiseXOR(F.col("s")))
            .cast("bigint")
            .alias("hamming"),
        )
        .withColumn("hrn", F.row_number().over(wh))
        .filter(F.col("hrn") <= _PREFILTER)
        .drop("hrn")
    )

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    qv = e.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    nv = e.select(F.col("vec_id").alias("nid"), F.col("v").alias("nv"))
    scored = (
        cand.join(F.broadcast(qv), "qid")
        .join(nv, "nid")
        .select(
            "qid",
            "nid",
            "hamming",
            F.round(
                fold_sum(F.zip_with("qv", "nv", lambda a, b: a * b))
                / (
                    F.sqrt(fold_sum(F.zip_with("qv", "qv", lambda a, b: a * b)))
                    * F.sqrt(
                        fold_sum(F.zip_with("nv", "nv", lambda a, b: a * b))
                    )
                ),
                6,
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("qid", "rank", "nid", "hamming", "cosine")
        
    )
