"""Round-8 wave: training-data INFLUENCE functions (TracIn-lite) over
the embeddings table — per-example gradient-proxy dot products against
deterministic linear-model checkpoints, the data-attribution primitive
("which training examples drove this prediction?") and its
memorization-score companion. Clean-room from the public TracIn idea
(Pruthi et al., NeurIPS 2020): influence(i -> j) ~= sum over
checkpoints t of grad_t(i) . grad_t(j); for a logistic probe on frozen
embeddings the per-example gradient is (sigma(w_t.x) - y) * x, so the
dot product factors into scalar residuals times one x_i.x_j — no
autograd, pure relational algebra. Checkpoints are DETERMINISTIC
functions of the data (the class-mean direction scaled by t/T — the
closed-form trajectory of one gradient step family), so the whole
pipeline is oracle-checkable bit-for-bit: decimal per-dimension means,
decimal margin folds, the libm contract (round transcendentals to 9 dp)
for the sigmoid, decimal influence sums.

Reference parity note: the reference pipeline (NeerajBassi/
news_ingestion_data_pipeline) has no analytics beyond top-N
(database_utils/database_methods.py:108-125); this family is part of
the LLM-training-data surface the driver contract demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import vectors as V
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_T_CHECKPOINTS = 3  # deterministic "training trajectory" length
_N_TEST = 5  # vec_id < 5 are the test (query) examples

# shared oracle prelude: per-dim class means -> checkpoint weights ->
# per-(vec, checkpoint) margins -> gradient-proxy residuals g
_G_SQL = f"""
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label % 2 AS y FROM embeddings
), dims AS (
  SELECT vec_id, y, generate_subscripts(v, 1) AS pos, unnest(v) AS val
  FROM e
), mu AS (
  SELECT pos,
         CAST(CAST(SUM(CAST(round(val, 6) AS DECIMAL(18,6)))
                   FILTER (WHERE y = 1) AS VARCHAR) AS DOUBLE)
           / COUNT(*) FILTER (WHERE y = 1) AS mu1,
         CAST(CAST(SUM(CAST(round(val, 6) AS DECIMAL(18,6)))
                   FILTER (WHERE y = 0) AS VARCHAR) AS DOUBLE)
           / COUNT(*) FILTER (WHERE y = 0) AS mu0
  FROM dims GROUP BY pos
), w AS (
  SELECT ts.t, mu.pos, ts.t / CAST({_T_CHECKPOINTS} AS DOUBLE) * (mu1 - mu0) AS w
  FROM mu CROSS JOIN (SELECT UNNEST(range(1, {_T_CHECKPOINTS} + 1)) AS t) ts
), marg AS (
  SELECT d.vec_id, d.y, w.t,
         CAST(CAST(SUM(CAST(round(w.w * d.val, 12) AS DECIMAL(24,12)))
                   AS VARCHAR) AS DOUBLE) AS m
  FROM dims d JOIN w ON w.pos = d.pos
  GROUP BY d.vec_id, d.y, w.t
), g AS (
  SELECT vec_id, t, round(1.0 / (1.0 + exp(-m)) - y, 9) AS g FROM marg
)
"""


def _g_frame(spark: SparkSession, sf_dir: str):
    """(embeddings-with-y, per-(vec, checkpoint) gradient residuals g).

    Everything decimal-exact or libm-rounded so the Spark values match
    the oracle's bit-for-bit: per-dim class means are decimal sums over
    6-dp-rounded components, margins are decimal folds of 12-dp-rounded
    products (unordered SUMs must be order-independent), and the
    sigmoid lands on the 9-dp libm contract."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("label") % 2).alias("y")
    )
    dims = emb.select(
        "vec_id", "y", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    mu = dims.groupBy("pos").agg(
        (
            F.sum(
                F.when(
                    F.col("y") == 1,
                    F.round("val", 6).cast("decimal(18,6)"),
                )
            ).cast("double")
            / F.count(F.when(F.col("y") == 1, 1))
        ).alias("mu1"),
        (
            F.sum(
                F.when(
                    F.col("y") == 0,
                    F.round("val", 6).cast("decimal(18,6)"),
                )
            ).cast("double")
            / F.count(F.when(F.col("y") == 0, 1))
        ).alias("mu0"),
    )
    ts = emb.sparkSession.range(1, _T_CHECKPOINTS + 1).select(
        F.col("id").alias("t")
    )
    w = mu.crossJoin(F.broadcast(ts)).select(
        "t",
        "pos",
        (
            F.col("t").cast("double")
            / float(_T_CHECKPOINTS)
            * (F.col("mu1") - F.col("mu0"))
        ).alias("w"),
    )
    marg = (
        dims.join(F.broadcast(w), "pos")
        .groupBy("vec_id", "y", "t")
        .agg(
            F.sum(
                F.round(F.col("w") * F.col("val"), 12).cast("decimal(24,12)")
            )
            .cast("double")
            .alias("m")
        )
    )
    g = marg.select(
        "vec_id",
        "t",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y"), 9
        ).alias("g"),
    )
    return emb, g


@register(
    "influence_tracin_proponents",
    oracle=f"""
WITH {_G_SQL},
pairs AS (
  SELECT q.vec_id AS query_id, a.vec_id AS train_id,
         round(list_dot_product(q.v, a.v), 6) AS xdot
  FROM e q CROSS JOIN e a
  WHERE q.vec_id < {_N_TEST} AND a.vec_id >= {_N_TEST}
), infl AS (
  SELECT p.query_id, p.train_id,
         CAST(CAST(SUM(CAST(round(gq.g * ga.g * p.xdot, 12)
                            AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS infl
  FROM pairs p
  JOIN g gq ON gq.vec_id = p.query_id
  JOIN g ga ON ga.vec_id = p.train_id AND ga.t = gq.t
  GROUP BY p.query_id, p.train_id
)
SELECT query_id, train_id, round(infl, 9) AS influence, rank FROM (
  SELECT query_id, train_id, infl,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY infl DESC, train_id) AS rank
  FROM infl
) WHERE rank <= 5
ORDER BY query_id, rank
""",
    description="TracIn-lite PROPONENTS: for each of the 5 test "
    "embeddings, the 5 training examples with the highest summed "
    "gradient-proxy influence sum_t (sig(w_t.x_i)-y_i)(sig(w_t.x_j)-"
    "y_j)(x_i.x_j) over 3 deterministic class-mean-direction "
    "checkpoints — the data-attribution query ('which training docs "
    "drove this prediction?') behind curation decisions like "
    "upweighting proponents of hard eval examples. The gradient dot "
    "product FACTORS into scalar residuals times one x_i.x_j, so cost "
    "is |test|x|train| dot products + tiny joins, never per-dimension "
    "pair work. Exactness: decimal class means, decimal margin folds, "
    "9-dp libm sigmoid, decimal influence sums; top-5 via a window "
    "PARTITIONED by query. At 100 TB the pair stage is the engine's "
    "blocked-GEMM path (sim_pairs_above_threshold) with the residual "
    "join riding the same blocks.",
    tags=("llm", "influence", "similarity", "curation"),
)
def influence_tracin_proponents(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, g = _g_frame(spark, sf_dir)
    test = emb.filter(F.col("vec_id") < _N_TEST).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    train = emb.filter(F.col("vec_id") >= _N_TEST).select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("tv")
    )
    pairs = train.crossJoin(F.broadcast(test)).select(
        "query_id",
        "train_id",
        F.round(V.dot(F.col("qv"), F.col("tv")), 6).alias("xdot"),
    )
    gq = g.filter(F.col("vec_id") < _N_TEST).select(
        F.col("vec_id").alias("query_id"), "t", F.col("g").alias("gq")
    )
    ga = g.filter(F.col("vec_id") >= _N_TEST).select(
        F.col("vec_id").alias("train_id"), "t", F.col("g").alias("ga")
    )
    infl = (
        pairs.join(F.broadcast(gq), "query_id")
        .join(ga, ["train_id", "t"])
        .groupBy("query_id", "train_id")
        .agg(
            F.sum(
                F.round(
                    F.col("gq") * F.col("ga") * F.col("xdot"), 12
                ).cast("decimal(24,12)")
            )
            .cast("double")
            .alias("infl")
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("infl"), F.col("train_id")
    )
    return (
        infl.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "train_id",
            F.round("infl", 9).alias("influence"),
            "rank",
        )
    )


@register(
    "influence_self_memorization",
    oracle=f"""
WITH {_G_SQL},
sqn AS (
  SELECT vec_id, y, round(list_dot_product(v, v), 6) AS s FROM e
), selfinf AS (
  SELECT g.vec_id, MAX(q.y) AS y,
         CAST(CAST(SUM(CAST(round(g.g * g.g * q.s, 12)
                            AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS si
  FROM g JOIN sqn q USING (vec_id)
  GROUP BY g.vec_id
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(y AS INT) AS y,
       round(si, 9) AS self_influence
FROM selfinf
ORDER BY si DESC, vec_id
LIMIT 20
""",
    description="TracIn self-influence (memorization score): "
    "sum_t (sig(w_t.x_i)-y_i)^2 ||x_i||^2 per example — high scorers "
    "are the examples the probe must 'memorize' (mislabeled, "
    "off-distribution, or unique), the standard triage list for label "
    "noise in training corpora (Pruthi et al. 2020, sec 4.3). Same "
    "deterministic checkpoint/residual construction as the proponents "
    "query; one aggregate per example, global top-20 via "
    "TakeOrderedAndProject — nothing scales worse than the scan.",
    tags=("llm", "influence", "quality", "curation"),
)
def influence_self_memorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, g = _g_frame(spark, sf_dir)
    sqn = emb.select(
        "vec_id",
        "y",
        F.round(V.dot(F.col("embedding"), F.col("embedding")), 6).alias("s"),
    )
    selfinf = (
        g.join(sqn, "vec_id")
        .groupBy("vec_id")
        .agg(
            F.max("y").alias("y"),
            F.sum(
                F.round(F.col("g") * F.col("g") * F.col("s"), 12).cast(
                    "decimal(24,12)"
                )
            )
            .cast("double")
            .alias("si"),
        )
    )
    return (
        selfinf.orderBy(F.desc("si"), "vec_id")
        .limit(20)
        .select(
            F.col("vec_id").cast("bigint").alias("vec_id"),
            F.col("y").cast("int").alias("y"),
            F.round("si", 9).alias("self_influence"),
        )
    )
