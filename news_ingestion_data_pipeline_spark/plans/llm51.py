"""Fifty-first wave: approximate-index quality measurement, join planning,
privacy auditing, inequality decomposition.

sim_lsh_recall_eval turns the PLANS.md claim "LSH recall@5 = 0.94" into a
reproducible in-engine query: the approximate and exact top-k paths run
side by side and recall is computed per query.  profile_join_key_skew is
the pre-flight check run BEFORE a big self-join at 100 TB — it predicts
the shuffle explosion from per-key counts alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t

# ---------------------------------------------------------------------------
# LSH recall@k measured against the exact baseline
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    lsh = REGISTRY["sim_lsh_topk"].oracle
    exact = REGISTRY["sim_cosine_topk"].oracle
    return f"""
WITH lsh AS ({lsh}),
ex AS ({exact}),
hits AS (
  SELECT e.query_id,
         COUNT(*) AS n_exact,
         COUNT(l.neighbor_id) AS n_hit
  FROM ex e
  LEFT JOIN lsh l
    ON l.query_id = e.query_id AND l.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
)
SELECT query_id, CAST(n_exact AS BIGINT) AS n_exact,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(CAST(n_hit AS DOUBLE) / n_exact, 4) AS recall
FROM hits ORDER BY query_id
"""


@register(
    "sim_lsh_recall_eval",
    oracle=_recall_oracle(),
    description="Recall@5 of the AND-OR LSH index (sim_lsh_topk's exact "
    "construction: 4 x 4-bit hyperplane tables + hamming-1 multi-probe) "
    "measured against the brute-force cosine baseline (sim_cosine_topk), "
    "per query — the approximate-index acceptance test every ANN "
    "deployment runs before swapping the exact path out. Both paths are "
    "the engine's own registered constructions, so this query IS the "
    "reproducible evidence behind the documented recall figure; at "
    "100 TB you run it on a sampled query set against the same index "
    "the production path serves. The comparison itself is a tiny "
    "left join on (query, neighbor) — cost is entirely the two "
    "top-k paths, and the exact side is the one you sample down.",
    tags=("llm", "similarity", "eval"),
)
def sim_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    lsh = SIM.lsh_bucketed_topk(
        emb, queries, k=5, n_planes=4, n_tables=4, dim=64, seed=42, multi_probe=True
    ).select("query_id", "neighbor_id")
    exact = SIM.brute_force_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    hits = (
        exact.alias("e")
        .join(
            lsh.alias("l"),
            (F.col("e.query_id") == F.col("l.query_id"))
            & (F.col("e.neighbor_id") == F.col("l.neighbor_id")),
            "left_outer",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count(F.col("l.neighbor_id")).cast("bigint").alias("n_hit"),
        )
    )
    return hits.select(
        "query_id",
        "n_exact",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_exact"), 4).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Join-key skew profiler
# ---------------------------------------------------------------------------

_SKEW_TOP = 10


@register(
    "profile_join_key_skew",
    oracle=f"""
WITH per_key AS (
  SELECT l_partkey, COUNT(*) AS n_rows,
         COUNT(*) * COUNT(*) AS est_pairs
  FROM lineitem GROUP BY l_partkey
), tot AS (
  SELECT SUM(est_pairs) AS total_pairs, SUM(n_rows) AS total_rows FROM per_key
), ranked AS (
  SELECT l_partkey, n_rows, est_pairs,
         ROW_NUMBER() OVER (ORDER BY est_pairs DESC, l_partkey) AS rank,
         SUM(est_pairs) OVER (ORDER BY est_pairs DESC, l_partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_pairs
  FROM per_key
)
SELECT r.rank, r.l_partkey,
       CAST(r.n_rows AS BIGINT) AS n_rows,
       CAST(r.est_pairs AS BIGINT) AS est_pairs,
       round(CAST(r.est_pairs AS DOUBLE) / t.total_pairs, 6) AS share,
       round(CAST(r.cum_pairs AS DOUBLE) / t.total_pairs, 6) AS cum_share
FROM ranked r CROSS JOIN tot t
WHERE r.rank <= {_SKEW_TOP}
ORDER BY r.rank
""",
    description="Join-key skew profiler — the pre-flight planning query "
    "run BEFORE a self-join or co-purchase join on l_partkey at scale: "
    "per-key row counts predict each key's join-output contribution "
    "(n², the shuffle-explosion term) without executing the join, and "
    f"the top-{_SKEW_TOP} heavy hitters with their cumulative share tell "
    "you whether salting (join_salted_skew), a df-cap "
    "(dedup_ngram_jaccard's max_df) or AQE skew splitting is required. "
    "Physical shape: ONE partial-aggregated count per key — the profile "
    "costs a single pass over the fact table; the heavy-hitter rank is "
    "TakeOrdered over #distinct-keys rows, and the 1-row totals frame "
    "broadcasts back onto the top slice.",
    tags=("profile", "join", "scale"),
)
def profile_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_key = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("est_pairs", F.col("n_rows") * F.col("n_rows"))
    )
    tot = per_key.agg(F.sum("est_pairs").alias("total_pairs"))
    # global top-K first (TakeOrderedAndProject); the rank/running-sum
    # window then covers only the K kept rows — the cumulative sum over
    # a prefix of the total order is unchanged by dropping the suffix
    topk = per_key.orderBy(F.col("est_pairs").desc(), "l_partkey").limit(
        _SKEW_TOP
    )
    w = Window.orderBy(F.col("est_pairs").desc(), F.col("l_partkey"))
    ranked = topk.select(
        "l_partkey",
        "n_rows",
        "est_pairs",
        F.row_number().over(w).alias("rank"),
        F.sum("est_pairs")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_pairs"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "l_partkey",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("est_pairs").cast("bigint").alias("est_pairs"),
            F.round(
                F.col("est_pairs").cast("double") / F.col("total_pairs"), 6
            ).alias("share"),
            F.round(
                F.col("cum_pairs").cast("double") / F.col("total_pairs"), 6
            ).alias("cum_share"),
        )
        
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5
_KANON_BUCKET = 200  # n_chars generalization width


@register(
    "curation_k_anonymity",
    oracle=f"""
SELECT lang, source,
       CAST(n_chars // {_KANON_BUCKET} AS BIGINT) AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS k,
       CAST(COUNT(*) < {_KANON_K} AS BOOLEAN) AS at_risk,
       CAST(MIN(doc_id) AS BIGINT) AS sample_doc
FROM documents
GROUP BY lang, source, n_chars // {_KANON_BUCKET}
ORDER BY lang, source, len_bucket
""",
    description=f"k-anonymity audit of the quasi-identifier projection "
    f"(lang, source, length-bucket/{_KANON_BUCKET}): every equivalence "
    "class reports its size k and whether it falls below the k="
    f"{_KANON_K} re-identification threshold — the privacy counterpart "
    "of curation_pii_redact (redaction removes direct identifiers; "
    "k-anonymity measures whether the REMAINING attributes still single "
    "someone out). Classes below threshold are the rows a release "
    "pipeline must suppress or generalize further (widen the bucket, "
    "drop 'source'). Physical shape: one hash-aggregate on the "
    "generalized QI tuple — the audit is a single partial-agg shuffle "
    "whatever the corpus size, and the generalization lattice search "
    "just re-runs it with coarser bucket literals.",
    tags=("curation", "privacy", "agg"),
)
def curation_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.count(F.lit(1))
    return (
        t(spark, sf_dir, "documents")
        .groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / _KANON_BUCKET).cast("bigint").alias("len_bucket"),
        )
        .agg(
            k.cast("bigint").alias("k"),
            (k < _KANON_K).alias("at_risk"),
            F.min("doc_id").cast("bigint").alias("sample_doc"),
        )
        
    )


# ---------------------------------------------------------------------------
# Theil inequality decomposition (within / between groups)
# ---------------------------------------------------------------------------


@register(
    "agg_theil_decomposition",
    oracle="""
WITH rows_ AS (
  SELECT o_orderpriority AS category,
         CAST(o_totalprice AS DECIMAL(12,2)) AS y,
         CAST(round(ln(o_totalprice), 9) AS DECIMAL(14,9)) AS lny
  FROM orders
), grp AS (
  SELECT category, COUNT(*) AS n,
         SUM(y) AS sum_y, SUM(y * lny) AS sum_ylny
  FROM rows_ GROUP BY category
), tot AS (
  SELECT SUM(n) AS tn, SUM(sum_y) AS tsum_y FROM grp
)
SELECT g.category,
       CAST(g.n AS BIGINT) AS n,
       round(CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE) / g.n, 6) AS mean_value,
       round((CAST(CAST(g.sum_ylny AS VARCHAR) AS DOUBLE)
              - round(ln(CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE) / g.n), 9)
                * CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE))
             / CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE), 6) AS theil_within,
       round(CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE)
             / CAST(CAST(t.tsum_y AS VARCHAR) AS DOUBLE)
             * round(ln((CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE) / g.n)
                        / (CAST(CAST(t.tsum_y AS VARCHAR) AS DOUBLE) / t.tn)), 9),
             6) AS between_contrib,
       round(CAST(CAST(g.sum_y AS VARCHAR) AS DOUBLE)
             / CAST(CAST(t.tsum_y AS VARCHAR) AS DOUBLE), 6) AS income_share
FROM grp g CROSS JOIN tot t
ORDER BY g.category
""",
    description="Theil T inequality index decomposed within/between order-"
    "priority groups: per group the internal inequality T_g = "
    "(Σ y·ln y − ln μ_g·Σ y)/Σ y (the algebraic rearrangement that needs "
    "only TWO exact sums — Σy and Σ y·ln y — instead of a per-row "
    "ln(y/μ) second pass, which is what makes it ONE aggregate at "
    "100 TB), plus its between-group contribution s_g·ln(μ_g/μ). "
    "Income-share-weighted T_g summed with the between terms "
    "reconstructs total Theil exactly (asserted by tests) — the additive "
    "decomposition Gini lacks, and why Theil is the inequality measure "
    "used for drill-downs (customer_gini_spend is the non-decomposable "
    "sibling). Determinism: ln evaluated once per row, rounded to 9 dp, "
    "folded through DECIMAL products/sums (the text_unigram_logprob "
    "contract), so partial aggregation is exact and partition-order-"
    "independent.",
    tags=("agg", "stats"),
)
def agg_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows_ = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("y"),
        F.round(F.log("o_totalprice"), 9).cast("decimal(14,9)").alias("lny"),
    )
    grp = rows_.groupBy("category").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("y") * F.col("lny")).alias("sum_ylny"),
    )
    tot = grp.agg(F.sum("n").alias("tn"), F.sum("sum_y").alias("tsum_y"))
    sy = F.col("sum_y").cast("double")
    tsy = F.col("tsum_y").cast("double")
    mean_g = sy / F.col("n")
    mean_t = tsy / F.col("tn")
    theil_within = (
        F.col("sum_ylny").cast("double") - F.round(F.log(mean_g), 9) * sy
    ) / sy
    between = sy / tsy * F.round(F.log(mean_g / mean_t), 9)
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            "category",
            F.col("n").cast("bigint").alias("n"),
            F.round(mean_g, 6).alias("mean_value"),
            F.round(theil_within, 6).alias("theil_within"),
            F.round(between, 6).alias("between_contrib"),
            F.round(sy / tsy, 6).alias("income_share"),
        )
        
    )
