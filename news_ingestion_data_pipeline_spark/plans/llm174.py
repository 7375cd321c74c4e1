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
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread: the one-row-group embeddings scan otherwise serializes the
    # posexplode + per-(vec, checkpoint) decimal margin folds on a single
    # task (r11 profile: a ~1.4 s tasks=1 stage in BOTH influence queries)
    emb = spread(t(spark, sf_dir, "embeddings")).select(
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


_DECON_TAU = 0.25  # cosine threshold (data max cross-cos ~0.39)
_DECON_EVAL = 10  # vec_id < 10 are the held-out eval examples


@register(
    "curation_semantic_decontaminate",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), sims AS (
  SELECT a.vec_id AS train_id, b.vec_id AS eval_id,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS c
  FROM e a CROSS JOIN e b
  WHERE a.vec_id >= {_DECON_EVAL} AND b.vec_id < {_DECON_EVAL}
), best AS (
  SELECT train_id, MAX(c) AS max_cos,
         MIN(eval_id) FILTER (WHERE c = (SELECT MAX(c2.c) FROM sims c2
                                         WHERE c2.train_id = sims.train_id))
           AS matched_eval_id
  FROM sims GROUP BY train_id
)
SELECT train_id, matched_eval_id, max_cos
FROM best WHERE max_cos >= {_DECON_TAU!r}
ORDER BY train_id
""",
    description="SEMANTIC decontamination: flag training examples whose "
    f"max embedding cosine against any held-out eval example reaches "
    f"{_DECON_TAU} — the paraphrase-robust complement to the n-gram "
    "decontaminator (curation_decontaminate), which misses reworded "
    "eval leakage that embeddings still place next to the eval point "
    "(the GPT-3 appendix-C lesson). Per-train argmax reported with a "
    "deterministic min-eval-id tiebreak. Shape: one |train|x|eval| "
    "broadcast cosine stage (eval sets are small by construction) + "
    "one per-train max — at 100 TB the candidate stage swaps for the "
    "engine's LSH/IVF bucketed-join paths, same threshold semantics.",
    tags=("llm", "curation", "similarity", "quality"),
)
def curation_semantic_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = emb.filter(F.col("vec_id") < _DECON_EVAL).select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("ev")
    )
    # spread: the |train|x|eval| cosine stage is the heavy map compute
    # (interpreted array folds) and the one-row-group scan would run it
    # on a single task (profiled r11: one 4.6 s single-task stage)
    tr = spread(emb.filter(F.col("vec_id") >= _DECON_EVAL)).select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("tv")
    )
    sims = tr.crossJoin(F.broadcast(ev)).select(
        "train_id",
        "eval_id",
        F.round(V.cosine(F.col("tv"), F.col("ev")), 6).alias("c"),
    )
    # one-pass argmax: max(struct(c, -eval_id)) picks max cosine with the
    # min-eval-id tiebreak — same values as the former max + equality
    # re-join against sims, which re-ran the whole cosine stage a second
    # time (sims has no exchange below it, so both consumers replayed it)
    arg = sims.groupBy("train_id").agg(
        F.max(F.struct(F.col("c"), (-F.col("eval_id")).alias("neg"))).alias("m")
    ).select(
        "train_id",
        (-F.col("m.neg")).alias("matched_eval_id"),
        F.col("m.c").alias("max_cos"),
    )
    return (
        arg.filter(F.col("max_cos") >= _DECON_TAU)
        .select("train_id", "matched_eval_id", "max_cos")
    )


_RR_QUERIES = 8  # vec_id < 8 act as retrieval queries
_RR_K1 = 20  # first-stage candidate depth
_RR_K2 = 10  # eval cutoff


@register(
    "rerank_cross_encoder_eval",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
), firststage AS (
  SELECT * FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS cand_id,
           q.label = a.label AS rel,
           round(list_dot_product(q.v, a.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(a.v, a.v))), 6) AS cos,
           round(list_dot_product(list_transform(q.v, x -> abs(x)),
                                  list_transform(a.v, x -> abs(x))), 6)
             AS cross_score,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_dot_product(q.v, a.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(a.v, a.v))), 6) DESC,
                              a.vec_id) AS rank1
    FROM e q CROSS JOIN e a
    WHERE q.vec_id < {_RR_QUERIES} AND a.vec_id != q.vec_id
  ) WHERE rank1 <= {_RR_K1}
), reranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cross_score DESC, cand_id) AS rank2
  FROM firststage
), per_query AS (
  SELECT query_id,
         COALESCE(1.0 / MIN(CASE WHEN rel THEN rank1 END), 0.0) AS rr1,
         COALESCE(1.0 / MIN(CASE WHEN rel THEN rank2 END), 0.0) AS rr2,
         COUNT(*) FILTER (WHERE rel AND rank1 <= {_RR_K2}) AS hits1,
         COUNT(*) FILTER (WHERE rel AND rank2 <= {_RR_K2}) AS hits2
  FROM reranked GROUP BY query_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       round(CAST(CAST(SUM(CAST(round(rr1, 9) AS DECIMAL(18,9)))
                       AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS mrr_first,
       round(CAST(CAST(SUM(CAST(round(rr2, 9) AS DECIMAL(18,9)))
                       AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS mrr_rerank,
       round(CAST(SUM(hits1) AS DOUBLE) / (COUNT(*) * {_RR_K2}), 6)
         AS p_at_{_RR_K2}_first,
       round(CAST(SUM(hits2) AS DOUBLE) / (COUNT(*) * {_RR_K2}), 6)
         AS p_at_{_RR_K2}_rerank
FROM per_query
""",
    description="Two-stage retrieval EVAL harness: first-stage cosine "
    f"top-{_RR_K1} per query, a deterministic cross-interaction "
    "re-scorer over the candidate set (stand-in for the cross-encoder "
    "every production retriever runs at stage two — scoring only "
    "|queries|xK pairs, never the corpus), and label-match relevance "
    f"folded into MRR and precision@{_RR_K2} for BOTH stages — the "
    "side-by-side table that decides whether a re-ranker earns its "
    "latency. Candidate generation and re-ranking both run as windows "
    "PARTITIONED by query; relevance means flow through 9-dp decimal "
    "sums. At 100 TB stage one swaps for the bucketed LSH/IVF paths "
    "(identical candidate contract), stage two cost is unchanged.",
    tags=("llm", "similarity", "eval"),
)
def rerank_cross_encoder_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    q = emb.filter(F.col("vec_id") < _RR_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlab"),
    )
    absv = lambda col: F.transform(col, lambda x: F.abs(x.cast("double")))
    cands = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        (F.col("label") == F.col("qlab")).alias("rel"),
        F.round(V.cosine(F.col("qv"), F.col("embedding")), 6).alias("cos"),
        F.round(
            V.dot(absv(F.col("qv")), absv(F.col("embedding"))), 6
        ).alias("cross_score"),
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.col("cand_id")
    )
    first = scored.withColumn("rank1", F.row_number().over(w1)).filter(
        F.col("rank1") <= _RR_K1
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cross_score"), F.col("cand_id")
    )
    reranked = first.withColumn("rank2", F.row_number().over(w2))
    per_query = reranked.groupBy("query_id").agg(
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("rel"), F.col("rank1"))),
            F.lit(0.0),
        ).alias("rr1"),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(F.col("rel"), F.col("rank2"))),
            F.lit(0.0),
        ).alias("rr2"),
        F.count(
            F.when(F.col("rel") & (F.col("rank1") <= _RR_K2), 1)
        ).alias("hits1"),
        F.count(
            F.when(F.col("rel") & (F.col("rank2") <= _RR_K2), 1)
        ).alias("hits2"),
    )
    n = F.count(F.lit(1))
    return per_query.agg(
        n.cast("bigint").alias("n_queries"),
        F.round(
            F.sum(F.round("rr1", 9).cast("decimal(18,9)")).cast("double") / n,
            6,
        ).alias("mrr_first"),
        F.round(
            F.sum(F.round("rr2", 9).cast("decimal(18,9)")).cast("double") / n,
            6,
        ).alias("mrr_rerank"),
        F.round(
            F.sum("hits1").cast("double") / (n * _RR_K2), 6
        ).alias(f"p_at_{_RR_K2}_first"),
        F.round(
            F.sum("hits2").cast("double") / (n * _RR_K2), 6
        ).alias(f"p_at_{_RR_K2}_rerank"),
    )


_BT_ITERS = 3


def _bt_iteration_sql(t: int) -> str:
    """One unrolled MM update: s'_i = round(W_i / sum_j m_ij/(s_i+s_j), 9),
    then normalized to sum 1 — per-opponent terms rounded to 12 dp and
    summed as DECIMAL so the 4-term fold is partition-order-proof."""
    prev = f"s{t - 1}"
    return f"""
d{t} AS (
  SELECT m.i,
         CAST(CAST(SUM(CAST(round(m.m / (si.s + sj.s), 12)
                            AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE) AS den
  FROM m JOIN {prev} si ON si.i = m.i JOIN {prev} sj ON sj.i = m.j
  GROUP BY m.i
), r{t} AS (
  SELECT w.i, round(w.w / d{t}.den, 9) AS s
  FROM w JOIN d{t} ON d{t}.i = w.i
), z{t} AS (
  SELECT CAST(CAST(SUM(CAST(s AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE) AS z
  FROM r{t}
), s{t} AS (
  SELECT i, round(s / z, 9) AS s FROM r{t} CROSS JOIN z{t}
)"""


#: shared CTE prefix: per-(user,type) decimal spend, duels, the duel
#: matrix, win totals, and the unrolled MM iterations ending at
#: s{_BT_ITERS} — reused verbatim by events_dpo_pairs (llm175) so the
#: pair construction replays the SAME ratings the BT query publishes.
_BT_CTES = f"""
WITH per AS (
  SELECT user_id, event_type,
         SUM(CAST(value AS DECIMAL(20,10))) AS sv
  FROM events GROUP BY user_id, event_type
), duels AS (
  SELECT a.event_type AS winner, b.event_type AS loser
  FROM per a JOIN per b
    ON b.user_id = a.user_id AND a.event_type != b.event_type
  WHERE a.sv > b.sv
), n AS (
  SELECT winner, loser, COUNT(*) AS c FROM duels GROUP BY winner, loser
), items AS (SELECT DISTINCT event_type AS i FROM per),
m AS (
  SELECT ii.i, jj.i AS j,
         COALESCE((SELECT c FROM n WHERE winner = ii.i AND loser = jj.i), 0)
         + COALESCE((SELECT c FROM n WHERE winner = jj.i AND loser = ii.i), 0)
           AS m
  FROM items ii JOIN items jj ON jj.i != ii.i
), w AS (
  SELECT ii.i,
         CAST(COALESCE((SELECT SUM(c) FROM n WHERE winner = ii.i), 0)
              AS DOUBLE) AS w
  FROM items ii
), s0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS s FROM items),
{",".join(_bt_iteration_sql(t) for t in range(1, _BT_ITERS + 1))}"""


@register(
    "events_bradley_terry",
    oracle=f"""{_BT_CTES}
SELECT s.i AS event_type,
       CAST(w.w AS BIGINT) AS wins,
       s.s AS bt_rating,
       CAST(ROW_NUMBER() OVER (ORDER BY s.s DESC, s.i) AS INT) AS rank
FROM s{_BT_ITERS} s JOIN w ON w.i = s.i
ORDER BY rank
""",
    description="Bradley-Terry preference strengths over the event "
    "types: each user who spends strictly more on type A than type B "
    "casts one A-beats-B duel, and three unrolled MM iterations "
    "(Hunter 2004: s_i <- W_i / sum_j m_ij/(s_i+s_j), normalized each "
    "round) turn the duel matrix into maximum-likelihood strengths — "
    "the pairwise-comparison -> scalar-rating primitive behind RLHF "
    "preference models and match-making ladders. Determinism: duel "
    "counts are exact; each iteration rounds per-opponent terms to 12 "
    "dp and folds them as DECIMAL (order-proof 4-term sums), ratings "
    "snap to 9 dp per round. Shape: one per-(user, type) aggregate, "
    "one within-user duel join, then every iteration runs on the "
    "5-item domain — broadcast-scale forever; the rank window covers "
    "5 rows (bounded domain, adjudicated).",
    tags=("events", "stats", "llm", "preference"),
)
def events_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pinned: consumed by BOTH duel-join sides and the items domain —
    # unpinned, the events aggregate re-ran once per consumer
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("sv"))
        .localCheckpoint()
    )
    a, b = per.alias("a"), per.alias("b")
    duels = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") != F.col("b.event_type"))
        & (F.col("a.sv") > F.col("b.sv")),
    ).select(
        F.col("a.event_type").alias("winner"),
        F.col("b.event_type").alias("loser"),
    )
    # localCheckpoint the duel-count matrix (≤ items² rows): every MM
    # iteration reads it, and an unbroken lineage would replay the
    # within-user duel join once per iteration per consumer
    n = (
        duels.groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    # not pinned: one tiny distinct over the PINNED per frame — its
    # exchange is computed once and ReuseExchange serves every consumer,
    # cheaper than another localCheckpoint query submission
    items = per.select(F.col("event_type").alias("i")).distinct()
    # symmetric duel counts m_ij (i != j), zero-filled over the item grid
    grid = items.crossJoin(items.select(F.col("i").alias("j"))).filter(
        F.col("i") != F.col("j")
    )
    m = (
        grid.join(
            n.select(
                F.col("winner").alias("i"),
                F.col("loser").alias("j"),
                F.col("c").alias("c_ij"),
            ),
            ["i", "j"],
            "left",
        )
        .join(
            n.select(
                F.col("loser").alias("i"),
                F.col("winner").alias("j"),
                F.col("c").alias("c_ji"),
            ),
            ["i", "j"],
            "left",
        )
        .select(
            "i",
            "j",
            (
                F.coalesce(F.col("c_ij"), F.lit(0))
                + F.coalesce(F.col("c_ji"), F.lit(0))
            ).alias("m"),
        )
    )
    w = items.join(
        n.groupBy(F.col("winner").alias("i")).agg(F.sum("c").alias("w")),
        "i",
        "left",
    ).select("i", F.coalesce(F.col("w"), F.lit(0)).cast("double").alias("w"))
    s = items.select("i", F.lit(1.0).alias("s"))
    for _ in range(_BT_ITERS):
        den = (
            m.join(s.select(F.col("i"), F.col("s")), "i")
            .join(
                s.select(F.col("i").alias("j"), F.col("s").alias("sj")), "j"
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(
                        F.col("m") / (F.col("s") + F.col("sj")), 12
                    ).cast("decimal(24,12)")
                )
                .cast("double")
                .alias("den")
            )
        )
        r = w.join(den, "i").select(
            "i", F.round(F.col("w") / F.col("den"), 9).alias("s")
        )
        # normalization constant as a global-window decimal sum over the
        # 5-item frame instead of a separate aggregate + broadcast cross
        # join: the DECIMAL fold is partition/order-proof, so the value is
        # bit-identical, and each MM round sheds two job submissions (the
        # z materialization and the broadcast build) — profiled r11: this
        # query was 62 jobs / 105 stages, every stage ~0.01 s of work.
        # Bounded domain (event-type vocabulary, 5 values): adjudicated in
        # GLOBAL_WINDOW_OK like the rank window below.
        z = (
            F.sum(F.col("s").cast("decimal(18,9)"))
            .over(Window.partitionBy())
            .cast("double")
        )
        # No per-round lineage break: all corpus-scale inputs (m, w,
        # items) are pinned above, so each round only adds a handful of
        # 5-row join/window nodes — 3 unrolled rounds stay a small plan,
        # and the whole iteration executes as ONE query instead of one
        # RDD-materialization query per round (profiled r11: the
        # checkpointed form ran 60 jobs / 98 stages with ~0.01 s of work
        # per stage — pure job-submission fixed cost).
        s = r.select("i", F.round(F.col("s") / z, 9).alias("s"))
    wr = Window.orderBy(F.desc("s"), F.col("i"))
    return (
        s.join(w, "i")
        .select(
            F.col("i").alias("event_type"),
            F.col("w").cast("bigint").alias("wins"),
            F.col("s").alias("bt_rating"),
            F.row_number().over(wr).cast("int").alias("rank"),
        )
        
    )


#: (applicationId, sf_dir) -> localCheckpointed Bradley-Terry ratings
_BT_RATINGS_CACHE: dict[tuple[str, str], DataFrame] = {}


def bt_ratings_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_bradley_terry's output (event_type, wins, bt_rating,
    rank), localCheckpointed once per (SparkContext, sf_dir): the
    preference family (events_dpo_pairs, and any future consumer of the
    fitted reward model) replays the SAME MM fixed point — the fit is
    the expensive part (a corpus-sized per-(user, type) aggregate plus
    the within-user duel join), while the artifact is a 5-row table. At
    100 TB this is "fit the reward model once, join it everywhere": the
    artifact reuse a production RLHF pipeline gets by persisting the
    rating table between stages. Keyed by applicationId so a restarted
    SparkContext recomputes instead of dereferencing dead RDDs."""
    from news_ingestion_data_pipeline_spark.plans import artifact_cache

    app_id = spark.sparkContext.applicationId
    # evict entries from dead applicationIds: a process that restarts its
    # SparkContext (test suites do) would otherwise accumulate stale
    # DataFrames pinning old localCheckpoint blocks (r10 ADVICE)
    for k in [k for k in _BT_RATINGS_CACHE if k[0] != app_id]:
        del _BT_RATINGS_CACHE[k]
    key = (app_id, sf_dir)
    df = _BT_RATINGS_CACHE.get(key)
    artifact_cache.record("bt_ratings", df is not None)
    if df is None:
        df = events_bradley_terry(spark, sf_dir).localCheckpoint()
        _BT_RATINGS_CACHE[key] = df
    return df
