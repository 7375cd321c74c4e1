"""Forty-eighth wave: ML feature engineering + resampling inference.

Four training-data primitives the earlier waves didn't cover: leave-one-out
target encoding (the leakage-safe categorical encoder), a full k-means Lloyd
UPDATE step (sim_kmeans_assign covered only the assignment half), kNN
classification over embeddings (the eval loop behind every embedding-quality
dashboard), and the distributed Poisson bootstrap (the only bootstrap that
works at 100 TB — per-element independent weights, no global resample index).

Reference parity note: the reference pipeline (NeerajBassi/
news_ingestion_data_pipeline, ~645 LoC scrape-ETL) has no ML stage; these
extend the LLM-pipeline surface the north star mandates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import dec, register, t

# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------

_TE_SMOOTH = 10.0  # prior strength m in the (sum + m*prior)/(n + m) blend


@register(
    "feature_target_encode_loo",
    oracle=f"""
WITH cat AS (
  SELECT o_orderpriority AS category,
         COUNT(*) AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY 1
), g AS (
  SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS prior
  FROM orders
)
SELECT o.o_orderkey, c.category,
       round((CAST(CAST(c.s - CAST(o.o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE)
              + {_TE_SMOOTH!r} * g.prior)
             / ((c.n - 1) + {_TE_SMOOTH!r}), 6) AS enc
FROM orders o
JOIN cat c ON o.o_orderpriority = c.category
CROSS JOIN g
""",
    description="Leave-one-out smoothed target encoding of order priority "
    "against order value — the leakage-safe categorical feature encoder "
    "(each row's own target is subtracted from its category sum, then "
    f"blended with the global prior at strength m={_TE_SMOOTH}). Physical "
    "shape: ONE tiny hash-aggregate per category (5 rows) plus a 1-row "
    "global prior, both broadcast back onto the fact scan — no shuffle of "
    "the fact table at all, which is why LOO encoding scales to 100 TB "
    "while the naive per-row window formulation (partitionBy category = "
    "5 giant skewed partitions) does not. Category sums are exact "
    "DECIMAL, so subtracting the row's own target is exact; the final "
    "blend is one deterministic IEEE expression.",
    tags=("feature", "llm", "agg"),
)
def feature_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cat = orders.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).alias("s"),
    )
    prior = orders.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("prior")
    )
    enc = F.round(
        (
            (F.col("s") - dec("o_totalprice")).cast("double")
            + F.lit(_TE_SMOOTH) * F.col("prior")
        )
        / ((F.col("n") - 1) + F.lit(_TE_SMOOTH)),
        6,
    )
    return (
        orders.join(
            F.broadcast(cat), orders["o_orderpriority"] == cat["category"]
        )
        .crossJoin(F.broadcast(prior))
        .select("o_orderkey", "category", enc.alias("enc"))
    )


# ---------------------------------------------------------------------------
# k-means Lloyd UPDATE step (assignment + new centroids + shift)
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_DIM = 64


def _sqdist_sql(a: str, b: str, dim: int) -> str:
    # left-associative sum — same IEEE evaluation order as Spark's
    # F.aggregate fold (precedent: llm2.sim_kmeans_assign)
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, dim + 1)
    )


def _sq_sql(a: str, dim: int) -> str:
    return " + ".join(f"{a}[{i}] * {a}[{i}]" for i in range(1, dim + 1))


@register(
    "sim_kmeans_update",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < {_KM_K}),
dists AS (
  SELECT e.vec_id, cent.cent_id, e.v,
         {_sqdist_sql('e.v', 'cent.cv', _KM_DIM)} AS d
  FROM e CROSS JOIN cent
), assigned AS (
  SELECT vec_id, cent_id, v,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
  FROM dists
), members AS (
  SELECT cent_id, vec_id, v FROM assigned WHERE rn = 1
), dims AS (
  SELECT cent_id, u.dim, u.val
  FROM members,
       LATERAL (SELECT UNNEST(range(1, {_KM_DIM} + 1)) AS dim,
                       UNNEST(v) AS val) u
), dim_means AS (
  SELECT cent_id, dim,
         CAST(CAST(SUM(CAST(val AS DECIMAL(20,12))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS mean_val
  FROM dims GROUP BY cent_id, dim
), newc AS (
  SELECT cent_id, list(mean_val ORDER BY dim) AS nc
  FROM dim_means GROUP BY cent_id
), counts AS (
  SELECT cent_id, COUNT(*) AS n_members FROM members GROUP BY cent_id
)
SELECT c.cent_id, c.n_members,
       round(sqrt({_sqdist_sql('n.nc', 'o.cv', _KM_DIM)}), 6) AS shift,
       round(sqrt({_sq_sql('n.nc', _KM_DIM)}), 6) AS new_norm
FROM counts c
JOIN newc n ON n.cent_id = c.cent_id
JOIN cent o ON o.cent_id = c.cent_id
ORDER BY c.cent_id
""",
    description="One full k-means Lloyd iteration — assignment (identical "
    "argmin to sim_kmeans_assign: broadcast centroids, squared-L2 fold, "
    "(distance, id) total order) PLUS the update half: per-dimension "
    "exact-DECIMAL means become the new centroids, and each centroid "
    "reports its member count, movement (L2 shift vs the old centroid) "
    "and new norm — shift is the Lloyd convergence criterion. Physical "
    "shape at 100 TB: map-side argmin against k broadcast centroids, "
    "then ONE partial-aggregated shuffle of (cluster, dim) keyed "
    "component sums — k x dim = 512 groups regardless of corpus size; "
    "the explode is the honest distributed form of the vector-sum "
    "aggregate (no per-executor mutable state needed). DECIMAL "
    "component sums make the centroid means order-independent, so the "
    "result is bit-reproducible under any partitioning — which is what "
    "lets the oracle certify every assignment and every centroid "
    "coordinate exactly.",
    tags=("llm", "similarity", "iterative"),
)
def sim_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    e = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    d = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cent_id", "v", d.alias("d"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d", "cent_id")).alias("m"),
            F.first("v").alias("v"),
        )
        .select("vec_id", F.col("m.cent_id").alias("cent_id"), "v")
    )
    dims = assigned.select(
        "cent_id", F.posexplode("v").alias("dim0", "val")
    ).select("cent_id", (F.col("dim0") + 1).alias("dim"), "val")
    dim_means = dims.groupBy("cent_id", "dim").agg(
        (
            F.sum(F.col("val").cast("decimal(20,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_val")
    )
    newc = dim_means.groupBy("cent_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "mean_val"))),
            lambda s: s["mean_val"],
        ).alias("nc")
    )
    counts = assigned.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n_members"))
    sq = lambda arr_a, arr_b: F.aggregate(  # noqa: E731
        F.zip_with(arr_a, arr_b, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.aggregate(
        F.col("nc"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return (
        counts.join(newc, "cent_id")
        .join(F.broadcast(cent), "cent_id")
        .select(
            "cent_id",
            "n_members",
            F.round(F.sqrt(sq(F.col("nc"), F.col("cv"))), 6).alias("shift"),
            F.round(F.sqrt(nrm), 6).alias("new_norm"),
        )
        
    )


# ---------------------------------------------------------------------------
# kNN classification over embeddings
# ---------------------------------------------------------------------------

_KNN_K = 5
_KNN_Q_MOD = 37  # query set: vec_id % 37 == 0

_SQL_COS = (
    "round(list_dot_product(a.v, q.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 6)"
)


@register(
    "sim_knn_classify",
    oracle=f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id, v, label FROM c WHERE vec_id % {_KNN_Q_MOD} = 0),
topk AS (
  SELECT query_id, neighbor_id, nlabel FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, a.label AS nlabel,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, a.vec_id) AS rank
    FROM c a CROSS JOIN q
    WHERE a.vec_id != q.vec_id
  ) WHERE rank <= {_KNN_K}
), votes AS (
  SELECT query_id, nlabel, COUNT(*) AS cnt
  FROM topk GROUP BY query_id, nlabel
), pred AS (
  SELECT query_id, nlabel AS pred_label, cnt AS n_votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cnt DESC, nlabel) AS rn
  FROM votes
)
SELECT p.query_id, q.label AS true_label, p.pred_label,
       CAST(p.n_votes AS BIGINT) AS n_votes,
       CAST(q.label = p.pred_label AS BOOLEAN) AS correct
FROM pred p JOIN q ON q.vec_id = p.query_id
WHERE p.rn = 1
ORDER BY p.query_id
""",
    description=f"kNN classification (k={_KNN_K}, cosine) of a held-out "
    "query set against the labeled embedding corpus — the standard "
    "embedding-quality eval (kNN accuracy) run after every re-embedding "
    "of a training corpus. Majority vote with (count desc, label) total "
    "order so ties are deterministic; output carries the true label and "
    "a correctness flag so accuracy is one aggregate away. Physical "
    "shape: queries broadcast (they are always the small side), corpus "
    "streams map-side through the scored cross join, per-query top-K via "
    "partitioned row_number — no corpus shuffle; swap in the LSH/IVF "
    "candidate join (sim_lsh_topk / sim_ivf_topk) for the approximate "
    "variant at 100 TB.",
    tags=("llm", "similarity"),
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % _KNN_Q_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("true_label"),
    )
    topk = SIM.brute_force_topk(
        emb, queries.select("query_id", "query_vec"), k=_KNN_K
    )
    labeled = topk.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), F.col("label").alias("nlabel")),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "nlabel").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cnt").desc(), F.col("nlabel"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("nlabel").alias("pred_label"),
            F.col("cnt").cast("bigint").alias("n_votes"),
        )
    )
    return (
        pred.join(F.broadcast(queries.select("query_id", "true_label")), "query_id")
        .select(
            "query_id",
            "true_label",
            "pred_label",
            "n_votes",
            (F.col("true_label") == F.col("pred_label")).alias("correct"),
        )
        
    )


# ---------------------------------------------------------------------------
# Distributed Poisson bootstrap CI
# ---------------------------------------------------------------------------

_BOOT_B = 32          # number of resamples
_BOOT_USER_MOD = 20   # scope: user_id % 20 == 0
# Poisson(1) inverse-CDF thresholds (cumulative P(X <= k)), frozen as the
# exact double literals both engines parse identically
_POIS_CDF = []
_acc = 0.0
for _k in range(5):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(_acc)

_U_DENOM = float(1 << 52)  # 13 hex chars = 52 bits


def _w_sql() -> str:
    u = (
        "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || '_' || "
        f"CAST(b AS VARCHAR)), 1, 13) AS BIGINT) / {_U_DENOM!r}"
    )
    cases = " ".join(
        f"WHEN {u} < {p!r} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"CASE {cases} ELSE 5 END"


@register(
    "events_bootstrap_ci",
    oracle=f"""
WITH scoped AS (
  SELECT event_id, value FROM events WHERE user_id % {_BOOT_USER_MOD} = 0
), resampled AS (
  SELECT s.event_id, s.value, t.b, {_w_sql()} AS w
  FROM scoped s, range({_BOOT_B}) t(b)
), means AS (
  SELECT b,
         CAST(CAST(SUM(w * CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         / SUM(w) AS mean_b
  FROM resampled GROUP BY b
), ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM means
), ci AS (
  SELECT MIN(CASE WHEN rn = 2 THEN mean_b END) AS lo,
         MIN(CASE WHEN rn = {_BOOT_B - 1} THEN mean_b END) AS hi
  FROM ranked
), pt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
         / COUNT(*) AS est
  FROM scoped
)
SELECT pt.n_events, round(pt.est, 6) AS est,
       round(ci.lo, 6) AS ci_lo, round(ci.hi, 6) AS ci_hi
FROM pt CROSS JOIN ci
""",
    description=f"Poisson bootstrap confidence interval for the mean event "
    f"value ({_BOOT_B} resamples): each element independently draws a "
    "Poisson(1) replication weight per resample — deterministic here via "
    "md5-derived uniforms through the frozen inverse-CDF thresholds, so "
    "both engines materialize the IDENTICAL resample weights. This is THE "
    "bootstrap that distributes: classic resampling needs a global n-out-"
    "of-n index (impossible to coordinate across 1000 executors), while "
    "Poisson weights are a pure per-row map — the resample x element "
    "explode is embarrassingly parallel and the per-resample means are "
    f"one {_BOOT_B}-group partial aggregate. CI bounds are order "
    "statistics of the resample means (rank 2 / rank "
    f"{_BOOT_B - 1} of {_BOOT_B} ≈ 94% coverage); weighted sums are "
    "exact DECIMAL so resample means are partition-order-independent.",
    tags=("events", "stats", "sampling"),
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    scoped = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % _BOOT_USER_MOD == 0)
        .select("event_id", "value")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit("_"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(_U_DENOM)
    )
    w = F.lit(5)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    resampled = scoped.withColumn(
        "b", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1)))
    ).withColumn("w", w)
    means = resampled.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("value").cast("decimal(18,6)")).cast("double")
            / F.sum("w")
        ).alias("mean_b")
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy("mean_b", "b"))
    )
    ci = ranked.agg(
        F.min(F.when(F.col("rn") == 2, F.col("mean_b"))).alias("lo"),
        F.min(F.when(F.col("rn") == _BOOT_B - 1, F.col("mean_b"))).alias("hi"),
    )
    pt = scoped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est"),
    )
    return pt.crossJoin(ci).select(
        "n_events",
        F.round("est", 6).alias("est"),
        F.round("lo", 6).alias("ci_lo"),
        F.round("hi", 6).alias("ci_hi"),
    )
