"""Fifty-third wave: experiment variance reduction (CUPED), training-batch
length bucketing, and LLR collocation mining.

CUPED is the adjustment every mature experimentation platform applies
before reading an A/B test (pre-period covariates absorb between-user
variance); length bucketing is the batching strategy that keeps GPU
padding waste down when packing variable-length documents; Dunning's
log-likelihood ratio is the statistically-grounded collocation score that
PMI/lift approximations (text_cooccurrence_lift) are usually corrected to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# CUPED variance reduction for the month's A/B split
# ---------------------------------------------------------------------------


@register(
    "events_cuped_adjustment",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         SUM(CAST(value AS DECIMAL(20,10))) FILTER (WHERE day(ts) <= 15) AS x_dec,
         SUM(CAST(value AS DECIMAL(20,10))) FILTER (WHERE day(ts) > 15) AS y_dec
  FROM events GROUP BY user_id
), xy AS (
  SELECT user_id,
         CAST(CAST(COALESCE(x_dec, 0) AS VARCHAR) AS DOUBLE) AS x,
         CAST(CAST(COALESCE(y_dec, 0) AS VARCHAR) AS DOUBLE) AS y
  FROM per_user
), xy6 AS (
  SELECT user_id, x, y,
         CAST(round(x, 6) AS DECIMAL(12,6)) AS x6,
         CAST(round(y, 6) AS DECIMAL(12,6)) AS y6
  FROM xy
), m AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(x6) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y6) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(x6 AS DECIMAL(20,6)) * x6) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(x6 AS DECIMAL(20,6)) * y6) AS VARCHAR) AS DOUBLE) AS sxy,
         CAST(CAST(SUM(CAST(y6 AS DECIMAL(20,6)) * y6) AS VARCHAR) AS DOUBLE) AS syy
  FROM xy6
)
SELECT CAST(n AS BIGINT) AS n_users,
       round(sy / n, 6) AS mean_post,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS theta,
       round(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
             * (sx / n - sx / n), 6) AS cuped_mean,
       round((syy - sy * sy / n) / n, 6) AS var_post,
       round(((syy - sy * sy / n)
              - (sxy - sx * sy / n) * (sxy - sx * sy / n) / (sxx - sx * sx / n))
             / n, 6) AS var_cuped,
       round(((sxy - sx * sy / n) * (sxy - sx * sy / n))
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS var_reduction
FROM m
""",
    description="CUPED variance reduction: each user's pre-period spend "
    "(days 1-15) is the covariate X for their post-period metric Y; "
    "theta = cov(X,Y)/var(X) gives the adjusted metric "
    "Y − θ(X − mean(X)) whose variance drops by exactly corr(X,Y)² — "
    "the adjustment every experimentation platform applies before "
    "reading an A/B test, because halving the variance halves the "
    "required sample size. The CUPED mean equals the raw mean by "
    "construction (reported both ways as the self-check), and "
    "var_reduction is the fraction of metric variance the covariate "
    "explains. Physical shape: one per-user aggregate (the only shuffle "
    "of the fact table), then a single 5-moment frame over user rows — "
    "per-user totals are rounded once to 6 dp and folded through exact "
    "DECIMAL power sums, so the moment matrix is partition-order-"
    "independent at any scale.",
    tags=("events", "stats", "experiment"),
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = F.col("value").cast("decimal(20,10)")
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.dayofmonth("ts") <= 15, v)).alias("x_dec"),
            F.sum(F.when(F.dayofmonth("ts") > 15, v)).alias("y_dec"),
        )
    )
    xy6 = per_user.select(
        F.round(F.coalesce(F.col("x_dec"), F.lit(0)).cast("double"), 6)
        .cast("decimal(12,6)")
        .alias("x6"),
        F.round(F.coalesce(F.col("y_dec"), F.lit(0)).cast("double"), 6)
        .cast("decimal(12,6)")
        .alias("y6"),
    )
    m = xy6.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x6").cast("double").alias("sx"),
        F.sum("y6").cast("double").alias("sy"),
        F.sum(F.col("x6") * F.col("x6")).cast("double").alias("sxx"),
        F.sum(F.col("x6") * F.col("y6")).cast("double").alias("sxy"),
        F.sum(F.col("y6") * F.col("y6")).cast("double").alias("syy"),
    )
    n = F.col("n")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    theta = cov / varx
    return m.select(
        n.cast("bigint").alias("n_users"),
        F.round(F.col("sy") / n, 6).alias("mean_post"),
        F.round(theta, 6).alias("theta"),
        F.round(
            F.col("sy") / n - theta * (F.col("sx") / n - F.col("sx") / n), 6
        ).alias("cuped_mean"),
        F.round(vary / n, 6).alias("var_post"),
        F.round((vary - cov * cov / varx) / n, 6).alias("var_cuped"),
        F.round(cov * cov / (varx * vary), 6).alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Length-bucketed batch packing (GPU padding-waste minimization)
# ---------------------------------------------------------------------------

_LB_BUCKET = 64   # token-length bucket width
_LB_BATCH = 16    # documents per batch


@register(
    "curation_length_batching",
    oracle=f"""
WITH lens AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
), bucketed AS (
  SELECT doc_id, n_tok,
         CAST(n_tok // {_LB_BUCKET} AS BIGINT) AS bucket,
         ROW_NUMBER() OVER (PARTITION BY n_tok // {_LB_BUCKET}
                            ORDER BY n_tok, doc_id) - 1 AS rn
  FROM lens
)
SELECT bucket,
       CAST(rn // {_LB_BATCH} AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_tok) AS BIGINT) AS max_len,
       CAST(SUM(n_tok) AS BIGINT) AS sum_len,
       round(1.0 - CAST(SUM(n_tok) AS DOUBLE) / (COUNT(*) * MAX(n_tok)), 6)
         AS pad_waste
FROM bucketed
GROUP BY bucket, rn // {_LB_BATCH}
ORDER BY bucket, batch_id
""",
    description=f"Length-bucketed batch packing: documents are bucketed "
    f"by token length (width {_LB_BUCKET}), ordered by (length, id) "
    f"within a bucket and cut into batches of {_LB_BATCH}; each batch "
    "reports its padding waste 1 − Σlen/(n·maxlen) — the fraction of "
    "GPU compute a padded batch burns on pad tokens, the number "
    "length-grouped batching exists to minimize (contrast "
    "curation_pack_sequences, which CONCATENATES docs into fixed "
    "windows; bucketed batching preserves document boundaries for "
    "models that need them). Deterministic: the within-bucket "
    "(length, id) total order fixes every batch assignment. Shape: one "
    "token-count map, one bucket-partitioned window (buckets are "
    "many and bounded-size, no global sort), one batch aggregate — at "
    "100 TB batches stream out per bucket partition with no "
    "cross-bucket coordination.",
    tags=("curation", "llm"),
)
def curation_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    lens = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    bucketed = lens.select(
        "doc_id",
        "n_tok",
        F.floor(F.col("n_tok") / _LB_BUCKET).cast("bigint").alias("bucket"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("bucket").orderBy("n_tok", "doc_id")
        )
        - 1,
    )
    return (
        bucketed.groupBy(
            "bucket", F.floor(F.col("rn") / _LB_BATCH).cast("bigint").alias("batch_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max("n_tok").cast("bigint").alias("max_len"),
            F.sum("n_tok").cast("bigint").alias("sum_len"),
            F.round(
                F.lit(1.0)
                - F.sum("n_tok").cast("double")
                / (F.count(F.lit(1)) * F.max("n_tok")),
                6,
            ).alias("pad_waste"),
        )
        
    )


# ---------------------------------------------------------------------------
# Dunning log-likelihood-ratio collocations
# ---------------------------------------------------------------------------

_LLR_TOP = 20
_LLR_MIN = 5

# x*ln(x) with the engine determinism contract: ln of an integer count
# (bounded domain), rounded to 9 dp; x·lnx folded through DECIMAL later.
_XLNX_SQL = "CASE WHEN {x} = 0 THEN CAST(0 AS DECIMAL(14,9)) " \
            "ELSE CAST(round(ln(CAST({x} AS DOUBLE)), 9) AS DECIMAL(14,9)) END"


def _llr_sql() -> str:
    # LLR = 2*(S(k11)+S(k12)+S(k21)+S(k22) - S(r1)-S(r2)-S(c1)-S(c2)+S(n))
    # with S(x) = x ln x, contingency cells from bigram/unigram counts.
    terms_pos = ["k11", "k12", "k21", "k22", "n"]
    terms_neg = ["r1", "r2", "c1", "c2"]
    s = " + ".join(
        f"CAST(CAST({t} AS DECIMAL(20,0)) * {_XLNX_SQL.format(x=t)} AS DOUBLE)"
        for t in terms_pos
    )
    s_neg = " + ".join(
        f"CAST(CAST({t} AS DECIMAL(20,0)) * {_XLNX_SQL.format(x=t)} AS DOUBLE)"
        for t in terms_neg
    )
    return f"2.0 * (({s}) - ({s_neg}))"


@register(
    "text_collocation_llr",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), bigrams AS (
  SELECT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
  FROM tok, LATERAL (SELECT UNNEST(range(1, len(tk))) AS i)
  WHERE len(tk) >= 2
), big_counts AS (
  SELECT w1, w2, COUNT(*) AS k11 FROM bigrams GROUP BY w1, w2
), left_counts AS (
  SELECT w1, COUNT(*) AS c_left FROM bigrams GROUP BY w1
), right_counts AS (
  SELECT w2, COUNT(*) AS c_right FROM bigrams GROUP BY w2
), tot AS (
  SELECT COUNT(*) AS n FROM bigrams
), cells AS (
  SELECT b.w1, b.w2, b.k11,
         l.c_left - b.k11 AS k12,
         r.c_right - b.k11 AS k21,
         t.n - l.c_left - r.c_right + b.k11 AS k22,
         l.c_left AS r1, t.n - l.c_left AS r2,
         r.c_right AS c1, t.n - r.c_right AS c2,
         t.n AS n
  FROM big_counts b
  JOIN left_counts l USING (w1)
  JOIN right_counts r USING (w2)
  CROSS JOIN tot t
  WHERE b.k11 >= {_LLR_MIN}
)
SELECT w1, w2, CAST(k11 AS BIGINT) AS n_bigram,
       round({_llr_sql()}, 4) AS llr,
       ROW_NUMBER() OVER (ORDER BY round({_llr_sql()}, 4) DESC, w1, w2) AS rnk
FROM cells
QUALIFY rnk <= {_LLR_TOP}
ORDER BY rnk
""",
    description="Dunning (1993) log-likelihood-ratio collocation mining "
    f"over adjacent word bigrams (min count {_LLR_MIN}, top {_LLR_TOP}): "
    "the 2×2 contingency LLR −2log λ that stays calibrated for SPARSE "
    "counts where PMI/lift (text_cooccurrence_lift) over-score rare "
    "pairs — the score production phrase-extraction uses. Every cell "
    "comes from three hash-aggregates (bigram, left-unigram, "
    "right-unigram counts) joined back — counts are integers, x·ln x "
    "terms evaluate ln once per integer count rounded to 9 dp and fold "
    "through DECIMAL products (the text_unigram_logprob contract), so "
    "the statistic is deterministic cross-engine. Shape: the unigram "
    "tables are vocabulary-sized and broadcast; only the bigram "
    "aggregate shuffles corpus-proportional data, once.",
    tags=("llm", "text", "stats"),
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = t(spark, sf_dir, "documents").select(F.split("text", " ").alias("tk"))
    bigrams = (
        tok.filter(F.size("tk") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at("tk", i).alias("w1"),
                        F.element_at("tk", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("k11"))
    left_counts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_left"))
    right_counts = bigrams.groupBy("w2").agg(F.count(F.lit(1)).alias("c_right"))
    tot = bigrams.agg(F.count(F.lit(1)).alias("n"))

    def xlnx(x):
        return F.when(x == 0, F.lit(0).cast("decimal(14,9)")).otherwise(
            F.round(F.log(x.cast("double")), 9).cast("decimal(14,9)")
        )

    def term(x):
        return (x.cast("decimal(20,0)") * xlnx(x)).cast("double")

    cells = (
        big_counts.filter(F.col("k11") >= _LLR_MIN)
        .join(F.broadcast(left_counts), "w1")
        .join(F.broadcast(right_counts), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("c_left") - F.col("k11")).alias("k12"),
            (F.col("c_right") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("c_left") - F.col("c_right") + F.col("k11")).alias(
                "k22"
            ),
            F.col("c_left").alias("r1"),
            (F.col("n") - F.col("c_left")).alias("r2"),
            F.col("c_right").alias("c1"),
            (F.col("n") - F.col("c_right")).alias("c2"),
            "n",
        )
    )
    llr = F.lit(2.0) * (
        (
            term(F.col("k11"))
            + term(F.col("k12"))
            + term(F.col("k21"))
            + term(F.col("k22"))
            + term(F.col("n"))
        )
        - (
            term(F.col("r1"))
            + term(F.col("r2"))
            + term(F.col("c1"))
            + term(F.col("c2"))
        )
    )
    scored = cells.select(
        "w1", "w2", F.col("k11").cast("bigint").alias("n_bigram"),
        F.round(llr, 4).alias("llr"),
    )
    w = Window.orderBy(F.col("llr").desc(), F.col("w1"), F.col("w2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _LLR_TOP)
        
    )
