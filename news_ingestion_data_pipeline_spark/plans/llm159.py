"""Hundred-fifty-ninth wave: published corpus-curation methods as
first-class queries.

  * curation_gopher_quality_rules — the Gopher / MassiveText document
    quality rule battery (Rae et al. 2021, §A1.1): word-count range,
    mean-word-length range, max word length, stopword presence,
    alphabetic-word fraction, symbol-to-word ratio. Every predicate is
    stated in EXACT integer arithmetic (e.g. mean length in [3, 10]
    as 3·n <= Σlen <= 10·n), so no float can drift a keep decision
    between engines.
  * curation_dsir_importance — Data Selection via Importance
    Resampling (Xie et al. 2023): documents scored by the log ratio of
    a hashed-bigram target LM (here: the English slice) to the raw LM.
    Per-BUCKET log ratios (4096 hashed buckets, vocabulary-bounded) are
    rounded to 9 dp and summed per document as exact DECIMAL — the
    same partition-order-proof log discipline as text_unigram_logprob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SQL_TOKENS = (
    "list_filter(regexp_split_to_array(trim({col}), '\\s+'), _t -> _t <> '')"
)
_STOP_SQL = "', '".join(TX.QUALITY_STOPWORDS)

# Gopher bounds, adapted to this corpus' scale (the PAPER's 50..100k
# word range would keep everything here; the RULE SHAPES are the point)
_W_MIN, _W_MAX = 50, 100_000
_MWL_LO, _MWL_HI = 3, 10
_MAXWORD = 20


@register(
    "curation_gopher_quality_rules",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, {_SQL_TOKENS.format(col='lower(text)')} AS tk FROM documents
), feats AS (
  SELECT doc_id,
         len(tk) AS n_words,
         len(list_filter(tk, w -> w IN ('{_STOP_SQL}'))) AS n_stop,
         COALESCE(list_sum(list_transform(tk, w -> length(w))), 0) AS sum_len,
         COALESCE(list_max(list_transform(tk, w -> length(w))), 0) AS max_len,
         len(list_filter(tk, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
         len(list_filter(tk, w -> w = '#' OR w = '...')) AS n_sym
  FROM tok
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       (n_words >= {_W_MIN} AND n_words <= {_W_MAX}) AS ok_word_count,
       (sum_len >= {_MWL_LO} * n_words AND sum_len <= {_MWL_HI} * n_words
        AND n_words > 0) AS ok_mean_word_len,
       (max_len <= {_MAXWORD}) AS ok_max_word_len,
       (n_stop >= 2) AS ok_stopwords,
       (5 * n_alpha >= 4 * n_words) AS ok_alpha_fraction,
       (10 * n_sym <= n_words) AS ok_symbol_ratio,
       ((n_words >= {_W_MIN} AND n_words <= {_W_MAX})
        AND (sum_len >= {_MWL_LO} * n_words AND sum_len <= {_MWL_HI} * n_words
             AND n_words > 0)
        AND max_len <= {_MAXWORD}
        AND n_stop >= 2
        AND 5 * n_alpha >= 4 * n_words
        AND 10 * n_sym <= n_words) AS keep
FROM feats
""",
    description="Gopher/MassiveText quality rule battery (Rae et al. "
    "2021): per-document word-count range, mean word length in [3,10], "
    "max word length, >= 2 stopwords, >= 80% words containing an "
    "alphabetic char, symbol-to-word ratio <= 0.1 — plus the composite "
    "keep flag. Every threshold is an EXACT integer inequality (mean "
    "length as 3n <= SUMlen <= 10n, fractions cross-multiplied), so the "
    "keep decision is bit-identical across engines and partitionings. "
    "Shape: one map-side pass of array HOFs over the documents scan — "
    "zero shuffles, embarrassingly parallel at 100 TB.",
    tags=("curation", "llm", "text"),
)
def curation_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    d = spread(t(spark, sf_dir, "documents"))
    tk = TX.tokens(F.lower(F.col("text")))
    feats = d.select(
        "doc_id",
        F.size(tk).alias("n_words"),
        F.size(
            F.filter(tk, lambda w: w.isin(*TX.QUALITY_STOPWORDS))
        ).alias("n_stop"),
        F.coalesce(
            F.aggregate(
                F.transform(tk, F.length),
                F.lit(0),
                lambda acc, x: acc + x,
            ),
            F.lit(0),
        ).alias("sum_len"),
        F.coalesce(
            F.array_max(F.transform(tk, F.length)), F.lit(0)
        ).alias("max_len"),
        F.size(
            F.filter(tk, lambda w: w.rlike("[a-z]"))
        ).alias("n_alpha"),
        F.size(
            F.filter(tk, lambda w: (w == "#") | (w == "..."))
        ).alias("n_sym"),
    )
    ok_wc = (F.col("n_words") >= _W_MIN) & (F.col("n_words") <= _W_MAX)
    ok_mwl = (
        (F.col("sum_len") >= _MWL_LO * F.col("n_words"))
        & (F.col("sum_len") <= _MWL_HI * F.col("n_words"))
        & (F.col("n_words") > 0)
    )
    ok_maxw = F.col("max_len") <= _MAXWORD
    ok_stop = F.col("n_stop") >= 2
    ok_alpha = 5 * F.col("n_alpha") >= 4 * F.col("n_words")
    ok_sym = 10 * F.col("n_sym") <= F.col("n_words")
    return feats.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_maxw.alias("ok_max_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha_fraction"),
        ok_sym.alias("ok_symbol_ratio"),
        (ok_wc & ok_mwl & ok_maxw & ok_stop & ok_alpha & ok_sym).alias(
            "keep"
        ),
    )


_B = 4096  # hashed-bigram buckets (DSIR's hashed n-gram feature space)

_SQL_BG = f"""
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(tk)),
           i -> CAST('0x' || substr(md5(tk[CAST(i AS INT)] || ' ' ||
                                        tk[CAST(i AS INT) + 1]), 1, 3)
                AS BIGINT))) AS bkt
  FROM (SELECT doc_id, lang, {_SQL_TOKENS.format(col='lower(text)')} AS tk
        FROM documents)
"""


@register(
    "curation_dsir_importance",
    oracle=f"""
WITH bg AS ({_SQL_BG}),
raw AS (
  SELECT bkt, COUNT(*) AS c_r FROM bg GROUP BY bkt
), tgt AS (
  SELECT bkt, COUNT(*) AS c_t FROM bg WHERE lang = 'en' GROUP BY bkt
), tot AS (
  SELECT (SELECT COUNT(*) FROM bg) AS n_r,
         (SELECT COUNT(*) FROM bg WHERE lang = 'en') AS n_t
), lam AS (
  SELECT raw.bkt,
         CAST(round(
           log2((COALESCE(tgt.c_t, 0) + 1.0) / (tot.n_t + {_B}))
           - log2((raw.c_r + 1.0) / (tot.n_r + {_B})), 9)
         AS DECIMAL(28,12)) AS lam
  FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt CROSS JOIN tot
), scored AS (
  SELECT bg.doc_id, COUNT(*) AS n_bigrams, SUM(lam.lam) AS s
  FROM bg JOIN lam ON bg.bkt = lam.bkt
  GROUP BY bg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,12))) AS VARCHAR)
            AS DOUBLE) AS dsir_score,
       COALESCE(s.s >= 0, FALSE) AS selected
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
""",
    description="DSIR — Data Selection with Importance Resampling (Xie "
    "et al. 2023): each document scored by log p_target(x) - "
    "log p_raw(x) under hashed-bigram unigram LMs, the published recipe "
    "for selecting raw web data that 'looks like' a target corpus (here "
    "target = the English slice). Bigrams hash into 4096 buckets "
    "(md5-prefix, engine-replicable); per-bucket add-one-smoothed log "
    "ratios are rounded to 9 dp and summed per doc as exact DECIMAL — "
    "vocabulary-bounded logs, partition-order-proof totals (the "
    "text_unigram_logprob discipline). Shape at 100 TB: pass 1 builds "
    "the 4096-row lambda table (two hash-aggs), pass 2 is a map-side "
    "broadcast join + doc-keyed aggregate — the canonical two-pass "
    "train-then-score filter.",
    tags=("curation", "llm", "text"),
)
def curation_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    d = spread(t(spark, sf_dir, "documents"))
    tk = TX.tokens(F.lower(F.col("text")))
    bg = d.select(
        "doc_id",
        "lang",
        F.explode(
            TX.bind_once(
                tk,
                lambda tkb: F.transform(
                    F.sequence(F.lit(1), F.size(tkb) - 1),
                    lambda i: F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    " ",
                                    F.element_at(tkb, i),
                                    F.element_at(tkb, i + 1),
                                )
                            ),
                            1,
                            3,
                        ),
                        16,
                        10,
                    ).cast("bigint"),
                ),
            )
        ).alias("bkt"),
    ).localCheckpoint()  # pinned: the tokenize+md5 bigram explode is the
    # corpus-scale pass and FOUR consumers read it (raw/target counts,
    # totals, per-doc scores) — unpinned it re-ran once per consumer
    raw = bg.groupBy("bkt").agg(F.count(F.lit(1)).alias("c_r"))
    tgt = (
        bg.filter(F.col("lang") == "en")
        .groupBy("bkt")
        .agg(F.count(F.lit(1)).alias("c_t"))
    )
    tot = bg.agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_t"),
    )
    # bcast-ok: lam is bounded by the 4096 hash buckets — SF-independent.
    lam = F.broadcast(
        raw.join(tgt, "bkt", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bkt",
            F.round(
                F.log2(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_t") + F.lit(_B))
                )
                - F.log2(
                    (F.col("c_r") + F.lit(1.0)) / (F.col("n_r") + F.lit(_B))
                ),
                9,
            )
            .cast("decimal(28,12)")
            .alias("lam"),
        )
    )
    zero = F.lit(0).cast("decimal(28,12)")
    scored = (
        bg.join(lam, "bkt")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lam").alias("s"),
        )
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            F.coalesce(F.col("s"), zero).cast("double").alias("dsir_score"),
            F.coalesce(F.col("s") >= 0, F.lit(False)).alias("selected"),
        )
    )
