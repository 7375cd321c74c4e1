"""Round-9 wave: RLHF/eval-direction primitives on top of the round-8
preference machinery.

* events_dpo_pairs — DPO/RLHF preference-PAIR construction: each
  user's strict within-user spend preferences become (chosen,
  rejected) candidate pairs, kept only when the GLOBAL Bradley-Terry
  reward model (events_bradley_terry's ratings, replayed exactly)
  agrees by at least a margin threshold — the standard recipe for
  turning raw pairwise evidence into a DPO training set (local
  preference + reward-margin filter).
* agg_krippendorff_alpha — judge-agreement with MISSING ratings:
  Krippendorff's nominal alpha over (unit=user, judge=event_type)
  quality categories, where a judge abstains below a minimum evidence
  count — the multi-rater generalization of agg_cohens_kappa (llm88),
  which handles >2 judges and incomplete rating matrices, the
  agreement statistic used to audit LLM-judge panels.

Reference parity note: the reference pipeline (NeerajBassi/
news_ingestion_data_pipeline) has no analytics beyond top-N
(database_utils/database_methods.py:108-125); this family is part of
the LLM-training-data surface the driver contract demands.

Determinism: per-(user,type) spends fold as DECIMAL(20,10) (exact);
category thresholds compare sv < k*c in decimal (never the double
average); Bradley-Terry margins compare as exact integer NANOS of the
9-dp ratings; alpha's only non-integer fold (per-unit agree-pair
density, denominator <= judges-1) rounds to 12 dp and sums as DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.llm174 import (
    _BT_CTES,
    _BT_ITERS,
    _G_SQL,
    _T_CHECKPOINTS,
    _g_frame,
)
from news_ingestion_data_pipeline_spark.plans.registry import (
    register,
    t,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM

#: minimum global reward-model margin for a kept pair, in nanos of the
#: 9-dp Bradley-Terry rating (0.02 — between the ~0.004 adjacent-rank
#: noise and the ~0.04 top-vs-bottom spread at the test SFs)
_DPO_MARGIN_NANOS = 20_000_000


@register(
    "events_dpo_pairs",
    oracle=f"""{_BT_CTES},
ratings AS (
  SELECT i AS event_type,
         CAST(CAST(s AS DECIMAL(18,9)) * 1000000000 AS BIGINT) AS rn
  FROM s{_BT_ITERS}
),
pairs AS (
  SELECT a.user_id, a.event_type AS chosen, b.event_type AS rejected,
         a.sv - b.sv AS um
  FROM per a JOIN per b
    ON b.user_id = a.user_id AND a.event_type != b.event_type
  WHERE a.sv > b.sv
)
SELECT p.user_id, p.chosen, p.rejected,
       CAST(p.um AS DOUBLE) AS user_margin,
       CAST(rc.rn - rr.rn AS DOUBLE) / 1000000000.0 AS reward_margin
FROM pairs p
JOIN ratings rc ON rc.event_type = p.chosen
JOIN ratings rr ON rr.event_type = p.rejected
WHERE rc.rn - rr.rn >= {_DPO_MARGIN_NANOS}
""",
    description="DPO preference-pair construction from the Bradley-"
    "Terry reward model: every user who spends strictly more on type A "
    "than type B contributes a candidate (chosen=A, rejected=B) pair, "
    "and a pair survives only when the GLOBAL ratings "
    "(events_bradley_terry's MM fixed point, replayed exactly) agree "
    "by >= 0.02 — local pairwise evidence filtered through the fitted "
    "reward margin, exactly how raw human comparisons become a DPO/"
    "RLHF training set (chosen, rejected, margin). Determinism: spends "
    "are DECIMAL-exact, the margin threshold compares integer NANOS of "
    "the 9-dp ratings (no double-vs-decimal promotion at the "
    "boundary). Shape: one within-user self-join (shuffle on user_id), "
    "then two broadcast joins against the 5-row rating table — the "
    "rating fit itself is broadcast-scale forever, and it is consumed "
    "through bt_ratings_cached (localCheckpointed once per session/SF, "
    "hit/miss attributed in the bench's warm_artifacts), so the MM fit "
    "replays at most once per session.",
    tags=("events", "llm", "preference", "curation"),
)
def events_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.plans.llm174 import (
        bt_ratings_cached,
    )

    ratings = (
        bt_ratings_cached(spark, sf_dir)
        .select(
            "event_type",
            (F.col("bt_rating").cast("decimal(18,9)") * 1000000000)
            .cast("bigint")
            .alias("rn"),
        )
    )
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("sv"))
    )
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_type") != F.col("b.event_type"))
        & (F.col("a.sv") > F.col("b.sv")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.event_type").alias("chosen"),
        F.col("b.event_type").alias("rejected"),
        (F.col("a.sv") - F.col("b.sv")).alias("um"),
    )
    rc = ratings.select(
        F.col("event_type").alias("chosen"), F.col("rn").alias("rn_c")
    )
    rr = ratings.select(
        F.col("event_type").alias("rejected"), F.col("rn").alias("rn_r")
    )
    return (
        pairs.join(F.broadcast(rc), "chosen")
        .join(F.broadcast(rr), "rejected")
        .filter(F.col("rn_c") - F.col("rn_r") >= _DPO_MARGIN_NANOS)
        .select(
            "user_id",
            "chosen",
            "rejected",
            F.col("um").cast("double").alias("user_margin"),
            (
                (F.col("rn_c") - F.col("rn_r")).cast("double")
                / F.lit(1000000000.0)
            ).alias("reward_margin"),
        )
    )


#: a judge (event_type) rates a unit (user) only with >= this many
#: observations — the abstention that makes the rating matrix
#: INCOMPLETE, which is what alpha handles and kappa cannot
_KA_MIN_OBS = 10
#: nominal quality categories on the judge's per-unit average value,
#: compared as exact decimals (sv < k*c), never the double average
_KA_LO, _KA_HI = 45, 55


@register(
    "agg_krippendorff_alpha",
    oracle=f"""
WITH cell AS (
  SELECT user_id, event_type, COUNT(*) AS c,
         SUM(CAST(value AS DECIMAL(20,10))) AS sv
  FROM events GROUP BY user_id, event_type
), rated AS (
  SELECT user_id,
         CASE WHEN sv < {_KA_LO} * c THEN 'low'
              WHEN sv < {_KA_HI} * c THEN 'mid'
              ELSE 'high' END AS cat
  FROM cell WHERE c >= {_KA_MIN_OBS}
), uc AS (
  SELECT user_id, cat, COUNT(*) AS nuc FROM rated GROUP BY user_id, cat
), um AS (
  SELECT user_id, SUM(nuc) AS mu, SUM(nuc * (nuc - 1)) AS agree_pairs
  FROM uc GROUP BY user_id
), pairable AS (SELECT * FROM um WHERE mu >= 2),
odiag AS (
  SELECT CAST(CAST(SUM(CAST(round(agree_pairs / (mu - 1), 12)
                            AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) AS od
  FROM pairable
), nc AS (
  SELECT uc.cat, SUM(uc.nuc) AS nc
  FROM uc JOIN pairable p ON p.user_id = uc.user_id
  GROUP BY uc.cat
), tot AS (
  SELECT CAST(SUM(nc) AS BIGINT) AS n,
         CAST(SUM(nc * nc) AS BIGINT) AS s2,
         COUNT(*) AS ncat
  FROM nc
)
SELECT CAST((SELECT COUNT(*) FROM pairable) AS BIGINT) AS n_units,
       CAST(tot.n AS BIGINT) AS n_ratings,
       CAST(tot.ncat AS BIGINT) AS n_categories,
       round((CAST(tot.n AS DOUBLE) - odiag.od) / CAST(tot.n AS DOUBLE),
             6) AS observed_disagreement,
       round((CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
              - CAST(tot.s2 AS DOUBLE))
             / (CAST(tot.n AS DOUBLE) * (CAST(tot.n AS DOUBLE) - 1)),
             6) AS expected_disagreement,
       round(1 - ((CAST(tot.n AS DOUBLE) - odiag.od)
                  / CAST(tot.n AS DOUBLE))
               / ((CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                   - CAST(tot.s2 AS DOUBLE))
                  / (CAST(tot.n AS DOUBLE)
                     * (CAST(tot.n AS DOUBLE) - 1))),
             6) AS krippendorff_alpha
FROM tot CROSS JOIN odiag
""",
    description="Krippendorff's nominal alpha over an INCOMPLETE "
    "multi-judge rating matrix: each event_type 'judges' each user "
    "with a low/mid/high category of its per-user average value "
    "(decimal-exact sv < k*c comparison), abstaining below "
    f"{_KA_MIN_OBS} observations — so units have varying judge counts, "
    "the case Cohen's kappa (agg_cohens_kappa) cannot score. alpha = "
    "1 - D_o/D_e from the coincidence matrix in closed form: the "
    "diagonal mass is sum_u sum_c n_uc(n_uc-1)/(m_u-1) (per-unit term "
    "rounded to 12 dp, folded as DECIMAL — denominator bounded by "
    "judges-1), marginals and n are exact integers, and both "
    "disagreements are single IEEE expressions over 1-row frames — "
    "the agreement statistic used to audit LLM-judge panels. Shape: "
    "two corpus-sized groupBys (user,type then user,cat); everything "
    "after is per-unit bounded by the 5-judge domain.",
    tags=("agg", "stats", "eval", "llm"),
)
def agg_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(20,10)")).alias("sv"),
        )
    )
    rated = cell.filter(F.col("c") >= _KA_MIN_OBS).select(
        "user_id",
        F.when(F.col("sv") < F.lit(_KA_LO) * F.col("c"), "low")
        .when(F.col("sv") < F.lit(_KA_HI) * F.col("c"), "mid")
        .otherwise("high")
        .alias("cat"),
    )
    uc = rated.groupBy("user_id", "cat").agg(F.count(F.lit(1)).alias("nuc"))
    um = uc.groupBy("user_id").agg(
        F.sum("nuc").alias("mu"),
        F.sum(F.col("nuc") * (F.col("nuc") - 1)).alias("agree_pairs"),
    )
    pairable = um.filter(F.col("mu") >= 2)
    odiag = pairable.agg(
        F.sum(
            F.round(
                F.col("agree_pairs") / (F.col("mu") - 1), 12
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("od"),
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
    )
    nc = (
        uc.join(pairable.select("user_id"), "user_id")
        .groupBy("cat")
        .agg(F.sum("nuc").alias("nc"))
    )
    tot = nc.agg(
        F.sum("nc").cast("bigint").alias("n"),
        F.sum(F.col("nc") * F.col("nc")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("ncat"),
    )
    nD = F.col("n").cast("double")
    d_o = (nD - F.col("od")) / nD
    d_e = (nD * nD - F.col("s2").cast("double")) / (nD * (nD - F.lit(1.0)))
    return (
        tot.crossJoin(F.broadcast(odiag))
        .select(
            F.col("n_units"),
            F.col("n").alias("n_ratings"),
            F.col("ncat").alias("n_categories"),
            F.round(d_o, 6).alias("observed_disagreement"),
            F.round(d_e, 6).alias("expected_disagreement"),
            F.round(F.lit(1.0) - d_o / d_e, 6).alias("krippendorff_alpha"),
        )
    )


#: pass@k success threshold on the event value and the k grid
_PK_THRESH = 90
_PK_KS = (1, 5, 10)


def _pass_at_k_product_sql(k: int) -> str:
    """1 - prod_{i=0..k-1} (n-c-i)/(n-i), left-associated explicitly so
    Spark and DuckDB run the identical IEEE op sequence."""
    terms = " * ".join(
        f"(CAST(n - c - {i} AS DOUBLE) / (n - {i}))" for i in range(k)
    )
    return f"CASE WHEN n - c < {k} THEN CAST(1.0 AS DOUBLE) ELSE 1.0 - {terms} END"


@register(
    "eval_pass_at_k",
    oracle=f"""
WITH per AS (
  SELECT user_id, COUNT(*) AS n,
         COUNT(*) FILTER (WHERE value >= {_PK_THRESH}) AS c
  FROM events GROUP BY user_id
),
scored AS (
  {" UNION ALL ".join(
      f'''SELECT {k} AS k,
         CAST(round({_pass_at_k_product_sql(k)}, 12)
              AS DECIMAL(24,12)) AS p
      FROM per WHERE n >= {k}'''
      for k in _PK_KS
  )}
)
SELECT k,
       CAST(COUNT(*) AS BIGINT) AS n_tasks,
       round(CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
         AS pass_at_k
FROM scored GROUP BY k
""",
    description="pass@k over (task=user, attempt=event, success=value "
    f">= {_PK_THRESH}): the unbiased estimator 1 - C(n-c,k)/C(n,k) "
    "(Chen et al. 2021, 'Evaluating Large Language Models Trained on "
    "Code') per task, averaged — THE metric for best-of-N sampling "
    "and RLHF candidate pools. The binomial ratio is evaluated as the "
    "explicit left-associated product of k falling-factorial terms "
    "(never lgamma/exp-sum-ln — libm-free, so Spark and DuckDB run "
    "the identical IEEE sequence), rounded to 12 dp per task and "
    "folded as DECIMAL. Only tasks with n >= k attempts are eligible "
    "per k (an under-sampled task has no unbiased pass@k and the "
    "n-c<k clamp would otherwise inflate it to exactly 1); eligible "
    "tasks with n-c < k score exactly 1, which IS the estimator's "
    "value there (k draws cannot all be failures). Shape: "
    "one corpus-sized groupBy(user), then a 3-row-per-task literal "
    "grid — no windows, no collects; at 100 TB it is one shuffle.",
    tags=("eval", "events", "llm", "agg"),
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("value") >= _PK_THRESH, 1)).alias("c"),
        )
    )
    scored = None
    for k in _PK_KS:
        prod = None
        for i in range(k):
            term = (F.col("n") - F.col("c") - F.lit(i)).cast("double") / (
                F.col("n") - F.lit(i)
            )
            prod = term if prod is None else prod * term
        pk = F.when(
            F.col("n") - F.col("c") < k, F.lit(1.0).cast("double")
        ).otherwise(F.lit(1.0) - prod)
        part = per.filter(F.col("n") >= k).select(
            F.lit(k).alias("k"),
            F.round(pk, 12).cast("decimal(24,12)").alias("p"),
        )
        scored = part if scored is None else scored.unionByName(part)
    return scored.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tasks"),
        F.round(
            F.sum("p").cast("double") / F.count(F.lit(1)), 6
        ).alias("pass_at_k"),
    )


@register(
    "eval_reward_calibration_ece",
    oracle=f"""
WITH {_G_SQL},
pp AS (
  SELECT g.vec_id, g.g + e.y AS p, e.y
  FROM g JOIN e ON e.vec_id = g.vec_id
  WHERE g.t = {_T_CHECKPOINTS}
), binned AS (
  SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin, p, y FROM pp
), b AS (
  SELECT bin, COUNT(*) AS n_bin, SUM(y) AS sy,
         CAST(CAST(SUM(CAST(round(p, 9) AS DECIMAL(18,9)))
                   AS VARCHAR) AS DOUBLE) AS sp
  FROM binned GROUP BY bin
), tot AS (SELECT CAST(SUM(n_bin) AS BIGINT) AS n FROM b),
scal AS (
  SELECT
    CAST(CAST(SUM(CAST(round(
        ABS(CAST(sy AS DOUBLE) / n_bin - sp / n_bin) * n_bin, 12)
      AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE)
      / (SELECT n FROM tot) AS ece,
    (SELECT CAST(CAST(SUM(CAST(round((p - y) * (p - y), 12)
                               AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE)
     FROM binned) / (SELECT n FROM tot) AS brier
  FROM b
)
SELECT b.bin,
       CAST(b.n_bin AS BIGINT) AS n_bin,
       round(b.sp / b.n_bin, 6) AS avg_conf,
       round(CAST(b.sy AS DOUBLE) / b.n_bin, 6) AS accuracy,
       round(ABS(CAST(b.sy AS DOUBLE) / b.n_bin - b.sp / b.n_bin), 6)
         AS gap,
       round(scal.ece, 6) AS ece,
       round(scal.brier, 6) AS brier
FROM b CROSS JOIN scal
""",
    description="Reliability diagram + expected calibration error of "
    "the deterministic reward model the influence family trains "
    "(llm174's final class-mean-direction checkpoint): p = "
    "sigmoid(w_T.x) is the model's positive-class probability (the "
    "9-dp libm residual g plus the label recovers p exactly), binned "
    "into 10 fixed-width confidence bins; per bin the mean confidence "
    "vs empirical accuracy and their gap, plus the n-weighted ECE and "
    "the Brier score as audit columns — the calibration check run on "
    "every reward model before its margins gate RLHF pairs "
    "(events_dpo_pairs). Determinism: p reuses the bit-reproducible "
    "residual pipeline (decimal class means, decimal margin folds, "
    "9-dp sigmoid); bin sums fold 9-dp decimals, ECE/Brier fold "
    "12-dp decimals; bin edges are exact double comparisons identical "
    "in both engines. Shape: one per-dimension aggregate + one "
    "per-vector fold (the g pipeline), then a 10-row bin table — "
    "no windows, no collects.",
    tags=("eval", "llm", "stats", "agg"),
)
def eval_reward_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, g = _g_frame(spark, sf_dir)
    pp = (
        g.filter(F.col("t") == _T_CHECKPOINTS)
        .join(emb.select("vec_id", "y"), "vec_id")
        .select((F.col("g") + F.col("y")).alias("p"), "y")
    )
    binned = pp.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        "y",
    )
    # ONE corpus-level aggregate: the per-bin Brier sum rides b's agg (a
    # decimal sum is exact and associative, so per-bin partials summed
    # across the 10 bins equal the former single ungrouped decimal sum
    # bit-for-bit), and ece/brier/n then come from one 10-row aggregate
    # over b instead of three separate aggregate+broadcast pairs
    # (r11: the extra corpus pass and two of the three broadcast
    # exchanges were pure AQE-job fixed cost).
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.sum("y").alias("sy"),
        F.sum(F.round("p", 9).cast("decimal(18,9)"))
        .cast("double")
        .alias("sp"),
        F.sum(
            F.round(
                (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")),
                12,
            ).cast("decimal(24,12)")
        ).alias("sq"),
    )
    consts = b.agg(
        (
            F.sum(
                F.round(
                    F.abs(
                        F.col("sy").cast("double") / F.col("n_bin")
                        - F.col("sp") / F.col("n_bin")
                    )
                    * F.col("n_bin"),
                    12,
                ).cast("decimal(24,12)")
            ).cast("double")
            / F.sum("n_bin")
        ).alias("ece"),
        (F.sum("sq").cast("double") / F.sum("n_bin")).alias("brier"),
    )
    return (
        b.crossJoin(F.broadcast(consts))
        .select(
            "bin",
            F.col("n_bin").cast("bigint").alias("n_bin"),
            F.round(F.col("sp") / F.col("n_bin"), 6).alias("avg_conf"),
            F.round(
                F.col("sy").cast("double") / F.col("n_bin"), 6
            ).alias("accuracy"),
            F.round(
                F.abs(
                    F.col("sy").cast("double") / F.col("n_bin")
                    - F.col("sp") / F.col("n_bin")
                ),
                6,
            ).alias("gap"),
            F.round("ece", 6).alias("ece"),
            F.round("brier", 6).alias("brier"),
        )
    )


#: ROUGE-2 F1 floor for an emitted pair — near-dup-grade overlap only,
#: keeping the pair table reviewable at any SF
_R2_MIN_F1 = 0.2


@register(
    "eval_rouge2_pairs",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, lang, CAST(round(n_chars, -2) AS BIGINT) AS len_bucket,
         {SQL_NORM.format(col='text')} AS s
  FROM documents
), words AS (
  SELECT doc_id, lang, len_bucket,
         list_filter(regexp_split_to_array(s, '\\s+'), _t -> _t <> '') AS w
  FROM norm
), g AS (
  SELECT doc_id, lang, len_bucket, gh, COUNT(*) AS c FROM (
    SELECT doc_id, lang, len_bucket,
           CAST('0x' || substr(md5(gram), 1, 15) AS BIGINT) AS gh
    FROM (
      SELECT doc_id, lang, len_bucket,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM words
    )
  ) GROUP BY doc_id, lang, len_bucket, gh
), tot AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb FROM g GROUP BY doc_id
), ov AS (
  SELECT a.doc_id AS ref_id, b.doc_id AS cand_id,
         CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS clip
  FROM g a JOIN g b
    ON b.lang = a.lang AND b.len_bucket = a.len_bucket
   AND b.gh = a.gh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT ref_id, cand_id, clip, rouge2_recall, rouge2_precision,
       round(f1, 6) AS rouge2_f1
FROM (
  SELECT o.ref_id, o.cand_id, o.clip,
         round(CAST(o.clip AS DOUBLE) / tr.nb, 6) AS rouge2_recall,
         round(CAST(o.clip AS DOUBLE) / tc.nb, 6) AS rouge2_precision,
         2.0 * (CAST(o.clip AS DOUBLE) / tr.nb)
             * (CAST(o.clip AS DOUBLE) / tc.nb)
             / (CAST(o.clip AS DOUBLE) / tr.nb
                + CAST(o.clip AS DOUBLE) / tc.nb) AS f1
  FROM ov o
  JOIN tot tr ON tr.doc_id = o.ref_id
  JOIN tot tc ON tc.doc_id = o.cand_id
)
WHERE f1 >= {_R2_MIN_F1}
""",
    description="ROUGE-2 scoring over blocked document pairs: word "
    "bigrams with MULTISET (clipped) counts — the summarization-eval "
    "convention, sum of min(count_ref, count_cand) per bigram — give "
    "per-pair recall/precision/F1, reference = lower doc_id; pairs "
    "below F1 0.2 are dropped. Distinct from the Jaccard family: "
    "clipping preserves repeated-phrase mass that set semantics "
    "discard, which is exactly what ROUGE measures. Shape: the pair "
    "generator is the same (lang, length-bucket)-blocked inverted-"
    "index join as dedup_ngram_jaccard (bigram equality IS the index; "
    "no all-pairs anywhere), per-doc bigram totals ride a separate "
    "tiny aggregate; everything is integer counts until the final "
    "rounded ratios, with the F1 expression written in the identical "
    "IEEE order in both engines.",
    tags=("eval", "llm", "text", "dedup"),
)
def eval_rouge2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX

    from news_ingestion_data_pipeline_spark.tables import spread

    # spread first: bigram explode + md5 hashing is map-heavy and must
    # not inherit a one-row-group scan's single partition
    norm = spread(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.round("n_chars", -2).cast("bigint").alias("len_bucket"),
        TX.normalize_text(F.col("text")).alias("s"),
    )
    w = TX.tokens(F.col("s"))
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = (
        norm.select(
            "doc_id", "lang", "len_bucket", F.explode(bigrams).alias("gram")
        )
        # 60-bit md5-prefix hash, identical in both engines (the
        # _SQL_SHINGLES trick): the join/shuffle key becomes a primitive
        # long instead of a two-word string, and any collision yields
        # identical results in Spark and DuckDB — parity by construction
        .select(
            "doc_id",
            "lang",
            "len_bucket",
            F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
            .cast("long")
            .alias("gh"),
        )
        .groupBy("doc_id", "lang", "len_bucket", "gh")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # Lineage break: the three consumers below (per-doc totals, both
    # self-join sides) each need a DIFFERENT partitioning of g — doc_id
    # vs (lang, len_bucket, gh) — so without a barrier each one replays
    # the tokenize + bigram-explode + md5 pipeline from the scan
    # (profiled r11: two ~60 CPU-s map stages writing byte-identical
    # shuffle output). The pinned frame is the per-doc bigram-count
    # table — the artifact a production ROUGE harness materializes.
    g = g.localCheckpoint()
    tot = g.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("nb"))
    a, b = g.alias("a"), g.alias("b")
    ov = (
        a.join(
            b,
            (F.col("b.lang") == F.col("a.lang"))
            & (F.col("b.len_bucket") == F.col("a.len_bucket"))
            & (F.col("b.gh") == F.col("a.gh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("ref_id"),
            F.col("b.doc_id").alias("cand_id"),
        )
        .agg(
            F.sum(F.least(F.col("a.c"), F.col("b.c")))
            .cast("bigint")
            .alias("clip")
        )
    )
    tr = tot.select(F.col("doc_id").alias("ref_id"), F.col("nb").alias("nbr"))
    tc = tot.select(
        F.col("doc_id").alias("cand_id"), F.col("nb").alias("nbc")
    )
    r = F.col("clip").cast("double") / F.col("nbr")
    p = F.col("clip").cast("double") / F.col("nbc")
    f1 = F.lit(2.0) * r * p / (r + p)
    return (
        ov.join(tr, "ref_id")
        .join(tc, "cand_id")
        .filter(f1 >= _R2_MIN_F1)
        .select(
            "ref_id",
            "cand_id",
            "clip",
            F.round(r, 6).alias("rouge2_recall"),
            F.round(p, 6).alias("rouge2_precision"),
            F.round(f1, 6).alias("rouge2_f1"),
        )
    )


_WZ = 1.959963984540054  # 97.5th normal quantile (95% two-sided)


@register(
    "events_duel_winrate_matrix",
    oracle=f"""
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
), pairs AS (
  SELECT CASE WHEN winner < loser THEN winner ELSE loser END AS item_a,
         CASE WHEN winner < loser THEN loser ELSE winner END AS item_b,
         CAST(SUM(CASE WHEN winner < loser THEN c ELSE 0 END) AS BIGINT)
           AS wins_a,
         CAST(SUM(CASE WHEN winner >= loser THEN c ELSE 0 END) AS BIGINT)
           AS wins_b
  FROM n GROUP BY 1, 2
), wil AS (
  SELECT item_a, item_b, wins_a, wins_b,
         wins_a + wins_b AS nd,
         CAST(wins_a AS DOUBLE) / (wins_a + wins_b) AS p,
         {_WZ} AS z
  FROM pairs
)
SELECT item_a, item_b, wins_a, wins_b,
       CAST(nd AS BIGINT) AS n_duels,
       round(p, 6) AS win_rate_a,
       round((p + z*z/(2*nd) - z * sqrt(p*(1-p)/nd + z*z/(4.0*nd*nd)))
             / (1 + z*z/nd), 6) AS wilson_lower_a,
       round((p + z*z/(2*nd) + z * sqrt(p*(1-p)/nd + z*z/(4.0*nd*nd)))
             / (1 + z*z/nd), 6) AS wilson_upper_a,
       CASE WHEN (p + z*z/(2*nd) - z * sqrt(p*(1-p)/nd + z*z/(4.0*nd*nd)))
                 / (1 + z*z/nd) > 0.5 THEN 'a_wins'
            WHEN (p + z*z/(2*nd) + z * sqrt(p*(1-p)/nd + z*z/(4.0*nd*nd)))
                 / (1 + z*z/nd) < 0.5 THEN 'b_wins'
            ELSE 'undecided' END AS verdict
FROM wil
""",
    description="Preference-data QA on the duel matrix feeding "
    "Bradley-Terry / DPO: per unordered item pair, both directions' "
    "duel counts, the win rate of the lexically-first item, and its "
    "95% Wilson interval — verdict 'a_wins'/'b_wins' only when the "
    "interval clears 0.5, else 'undecided'. The triage that tells a "
    "preference-data curator which comparisons are statistically "
    "decided (safe to mine pairs from) and which need more "
    "annotations. Duel counts are exact integers; sqrt is IEEE "
    "correctly-rounded, so the interval is bit-identical in both "
    "engines. Shape: one within-user self-join, then an items^2/2-row "
    "frame forever.",
    tags=("events", "stats", "preference", "eval"),
)
def events_duel_winrate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(F.col("value").cast("decimal(20,10)")).alias("sv"))
    )
    a, b = per.alias("a"), per.alias("b")
    n = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.sv") > F.col("b.sv")),
        )
        .select(
            F.col("a.event_type").alias("winner"),
            F.col("b.event_type").alias("loser"),
        )
        .groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        n.select(
            F.when(F.col("winner") < F.col("loser"), F.col("winner"))
            .otherwise(F.col("loser"))
            .alias("item_a"),
            F.when(F.col("winner") < F.col("loser"), F.col("loser"))
            .otherwise(F.col("winner"))
            .alias("item_b"),
            F.when(F.col("winner") < F.col("loser"), F.col("c"))
            .otherwise(F.lit(0))
            .alias("ca"),
            F.when(F.col("winner") >= F.col("loser"), F.col("c"))
            .otherwise(F.lit(0))
            .alias("cb"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("ca").cast("bigint").alias("wins_a"),
            F.sum("cb").cast("bigint").alias("wins_b"),
        )
    )
    nd = (F.col("wins_a") + F.col("wins_b")).cast("double")
    p = F.col("wins_a").cast("double") / (F.col("wins_a") + F.col("wins_b"))
    z = F.lit(_WZ)
    half = z * F.sqrt(p * (1 - p) / nd + z * z / (4.0 * nd * nd))
    denom = 1 + z * z / nd
    lower = (p + z * z / (2 * nd) - half) / denom
    upper = (p + z * z / (2 * nd) + half) / denom
    return pairs.select(
        "item_a",
        "item_b",
        "wins_a",
        "wins_b",
        (F.col("wins_a") + F.col("wins_b")).cast("bigint").alias("n_duels"),
        F.round(p, 6).alias("win_rate_a"),
        F.round(lower, 6).alias("wilson_lower_a"),
        F.round(upper, 6).alias("wilson_upper_a"),
        F.when(lower > 0.5, "a_wins")
        .when(upper < 0.5, "b_wins")
        .otherwise("undecided")
        .alias("verdict"),
    )


@register(
    "eval_reward_length_bias",
    oracle=f"""
WITH {_G_SQL},
pp AS (
  SELECT g.vec_id, round(g.g + e.y, 9) AS p
  FROM g JOIN e ON e.vec_id = g.vec_id
  WHERE g.t = {_T_CHECKPOINTS}
), joined AS (
  SELECT pp.vec_id, pp.p, d.n_chars,
         CAST(round(d.n_chars, -2) AS BIGINT) AS len_bucket
  FROM pp JOIN documents d ON d.doc_id = pp.vec_id
), sums AS (
  SELECT COUNT(*) AS n,
         CAST(CAST(SUM(CAST(p AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE)
           AS sx,
         CAST(SUM(n_chars) AS BIGINT) AS sy,
         CAST(CAST(SUM(CAST(round(p * p, 12) AS DECIMAL(24,12)))
                   AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(SUM(n_chars * n_chars) AS BIGINT) AS syy,
         CAST(CAST(SUM(CAST(round(p * n_chars, 12) AS DECIMAL(24,12)))
                   AS VARCHAR) AS DOUBLE) AS sxy
  FROM joined
), corr AS (
  SELECT CASE
    WHEN (n * sxx - sx * sx)
         * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy) > 0
    THEN round(
      (n * sxy - sx * sy)
      / sqrt((n * sxx - sx * sx)
             * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
      6)
    ELSE NULL END AS reward_length_corr
  FROM sums
)
SELECT j.len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(CAST(CAST(SUM(CAST(j.p AS DECIMAL(18,9))) AS VARCHAR)
                  AS DOUBLE) / COUNT(*), 6) AS mean_reward,
       corr.reward_length_corr
FROM joined j CROSS JOIN corr
GROUP BY j.len_bucket, corr.reward_length_corr
""",
    description="Reward-model LENGTH BIAS report — the standard RLHF "
    "diagnostic (reward models notoriously drift toward preferring "
    "longer outputs): per 100-char length bucket, the mean reward "
    "probability of the influence family's deterministic model "
    "(sigmoid of the final class-mean-direction checkpoint, the same "
    "9-dp-reproducible p as the calibration query), plus the overall "
    "Pearson correlation between reward and document length as a "
    "constant audit column. A |corr| near 0 clears the reward model "
    "for margin-gating DPO pairs; a large one means the margin "
    "threshold is silently a length filter. Determinism: p is the "
    "bit-reproducible residual pipeline; all folds are 9/12-dp "
    "decimals or exact integers; sqrt is IEEE correctly-rounded. "
    "Shape: the g pipeline plus one broadcast-joined per-bucket "
    "aggregate — no windows, no collects.",
    tags=("eval", "llm", "stats", "curation"),
)
def eval_reward_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, g = _g_frame(spark, sf_dir)
    pp = (
        g.filter(F.col("t") == _T_CHECKPOINTS)
        .join(emb.select("vec_id", "y"), "vec_id")
        .select(
            "vec_id", F.round(F.col("g") + F.col("y"), 9).alias("p")
        )
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    joined = pp.join(
        docs, pp["vec_id"] == docs["doc_id"]
    ).select(
        "p",
        "n_chars",
        F.round("n_chars", -2).cast("bigint").alias("len_bucket"),
    )
    # per-bucket moment sums FIRST (exact decimal/bigint partials), so the
    # corpus-level correlation sums are re-aggregates of the ~bounded
    # len-bucket frame instead of a second pass over `joined` — decimal
    # addition is exact and associative, so the regrouped totals (and the
    # correlation computed from them) are bit-identical (r11: removed one
    # aggregate pass + one broadcast exchange of pure AQE-job fixed cost).
    per_bucket = joined.groupBy("len_bucket").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum(F.col("p").cast("decimal(18,9)")).alias("sx_b"),
        F.sum("n_chars").cast("bigint").alias("sy_b"),
        F.sum(
            F.round(F.col("p") * F.col("p"), 12).cast("decimal(24,12)")
        ).alias("sxx_b"),
        F.sum(F.col("n_chars") * F.col("n_chars"))
        .cast("bigint")
        .alias("syy_b"),
        F.sum(
            F.round(F.col("p") * F.col("n_chars"), 12).cast("decimal(24,12)")
        ).alias("sxy_b"),
    )
    sums = per_bucket.agg(
        F.sum("n_b").alias("n"),
        F.sum("sx_b").cast("double").alias("sx"),
        F.sum("sy_b").cast("bigint").alias("sy"),
        F.sum("sxx_b").cast("double").alias("sxx"),
        F.sum("syy_b").cast("bigint").alias("syy"),
        F.sum("sxy_b").cast("double").alias("sxy"),
    )
    n = F.col("n")
    # zero-variance guard: a degenerate corpus where every reward (or
    # every length) is identical has no defined correlation — NULL, not
    # an ANSI divide-by-zero (surfaced by the 8x smoke fixture, whose
    # per-copy sign flips cancel the class-mean direction exactly)
    varprod = (n * F.col("sxx") - F.col("sx") * F.col("sx")) * (
        n * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy")
    )
    corr = sums.select(
        F.when(
            varprod > 0,
            F.round(
                (n * F.col("sxy") - F.col("sx") * F.col("sy"))
                / F.sqrt(varprod),
                6,
            ),
        ).alias("reward_length_corr")
    )
    return per_bucket.crossJoin(F.broadcast(corr)).select(
        "len_bucket",
        F.col("n_b").cast("bigint").alias("n_docs"),
        F.round(
            F.col("sx_b").cast("double") / F.col("n_b"), 6
        ).alias("mean_reward"),
        "reward_length_corr",
    )


#: best-of-n sample sizes for the reward-scaling curve
_BON_NS = (1, 4, 16)


def _bon_weight_sql(n: int) -> str:
    """w_i(n) = C(i-1, n-1)/C(N, n) = n * (i-1)...(i-n+1) / (N...(N-n+1)),
    written as an explicit left-associated product so both engines run
    the identical IEEE sequence (the pass@k discipline)."""
    if n == 1:
        return "(1.0 / nu)"
    # first factor cast to DOUBLE so the whole left-associated product
    # runs in floats (an INT64 product overflows by rank ~40 at n=16);
    # every factor is an exact small integer, so the double sequence is
    # identical to the Spark side's per-term double casts
    num = " * ".join(
        (f"(CAST(rk - {j} AS DOUBLE))" if j == 1 else f"(rk - {j})")
        for j in range(1, n)
    )
    den = " * ".join(
        (f"(CAST(nu - {j} AS DOUBLE))" if j == 1 else f"(nu - {j})")
        for j in range(1, n)
    )
    return (
        f"(CASE WHEN rk >= {n} THEN {n}.0 * ({num}) / (CAST(nu AS DOUBLE)"
        f" * ({den})) ELSE 0.0 END)"
    )


@register(
    "eval_best_of_n_reward",
    oracle=f"""
WITH ranked AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY user_id) AS nu
  FROM events
), eligible AS (
  SELECT * FROM ranked WHERE nu >= {max(_BON_NS)}
), per AS (
  {" UNION ALL ".join(
      f'''SELECT {n} AS n, user_id,
         CAST(CAST(SUM(CAST(round(value * {_bon_weight_sql(n)}, 12)
                            AS DECIMAL(24,12))) AS VARCHAR) AS DOUBLE)
           AS ebon
      FROM eligible GROUP BY user_id'''
      for n in _BON_NS
  )}
)
SELECT n,
       CAST(COUNT(*) AS BIGINT) AS n_tasks,
       round(CAST(CAST(SUM(CAST(round(ebon, 9) AS DECIMAL(18,9)))
                       AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
         AS mean_best_of_n
FROM per GROUP BY n
""",
    description="Best-of-n reward scaling curve: for each task (user) "
    "the EXPECTED maximum reward over a uniformly random n-subset of "
    "its attempts, computed exactly from order statistics — E[max] = "
    "sum_i value_(i) * C(i-1,n-1)/C(N,n) over the within-task "
    "ascending rank i — then averaged across tasks, for n in "
    f"{_BON_NS}. The curve that tells an RLHF pipeline how much "
    "reward best-of-n sampling buys before training on it "
    "(reward-model overoptimization shows up as this curve lying). "
    "The combinatorial weight is an explicit left-associated product "
    "(the pass@k discipline — no lgamma), per-term products round to "
    "12 dp and fold as DECIMAL, task means fold 9-dp decimals. "
    "Windows are PARTITIONED by user (bounded frames); tasks with "
    f"fewer than {max(_BON_NS)} attempts are excluded by the same "
    "rule in both engines. Shape: one shuffle on user_id, then a "
    "3-row-per-task literal grid.",
    tags=("eval", "events", "llm", "window"),
)
def eval_best_of_n_reward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("nu"),
    ).filter(F.col("nu") >= max(_BON_NS))
    per = None
    for n in _BON_NS:
        if n == 1:
            wcol = F.lit(1.0) / F.col("nu")
        else:
            num = None
            for j in range(1, n):
                term = (F.col("rk") - F.lit(j)).cast("double")
                num = term if num is None else num * term
            den = None
            for j in range(1, n):
                term = (F.col("nu") - F.lit(j)).cast("double")
                den = term if den is None else den * term
            wcol = F.when(
                F.col("rk") >= n,
                F.lit(float(n)) * num / (F.col("nu").cast("double") * den),
            ).otherwise(F.lit(0.0))
        part = (
            ranked.select(
                "user_id",
                F.round(F.col("value") * wcol, 12)
                .cast("decimal(24,12)")
                .alias("term"),
            )
            .groupBy("user_id")
            .agg(F.sum("term").cast("double").alias("ebon"))
            .select(F.lit(n).alias("n"), "user_id", "ebon")
        )
        per = part if per is None else per.unionByName(part)
    return per.groupBy("n").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tasks"),
        F.round(
            F.sum(F.round("ebon", 9).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_best_of_n"),
    )
