"""Hundred-fiftieth wave: decision-stump learning and chi-square
feature selection.

  * feature_gini_best_split — the first node of every tree ensemble:
    scan candidate thresholds (10k-wide value grid — a bounded set)
    for the split of order value that minimizes weighted Gini impurity
    of the URGENT-vs-rest label.  Prefix sums over the grid give every
    candidate's left/right class counts in one window pass — the
    histogram trick XGBoost/LightGBM use, relationally.
  * feature_chi2_term_selection — feature selection for text
    classification: every frequent term's presence/absence crossed
    with the 5-language label, chi-square scored from integer
    observed/expected counts, top 20 most class-informative terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.functions.text import normalize_text, tokens
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_GRID = 10000  # candidate thresholds every 10k of order value


@register(
    "feature_gini_best_split",
    oracle=f"""
WITH labeled AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) // {_GRID} AS bucket,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
  FROM orders
),
hist AS (
  SELECT bucket, COUNT(*) AS n, SUM(pos) AS np
  FROM labeled GROUP BY bucket
),
cum AS (
  SELECT bucket, n, np,
         SUM(n) OVER w AS nl, SUM(np) OVER w AS npl,
         SUM(n) OVER () AS nt, SUM(np) OVER () AS npt
  FROM hist
  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
cand AS (
  SELECT bucket,
         nl, nt - nl AS nr, npl, npt - npl AS npr,
         CAST(round(
           (CAST(nl AS DOUBLE) / nt)
             * (1.0 - (CAST(npl AS DOUBLE) / nl) * (CAST(npl AS DOUBLE) / nl)
                    - (1.0 - CAST(npl AS DOUBLE) / nl)
                      * (1.0 - CAST(npl AS DOUBLE) / nl))
           + (CAST(nt - nl AS DOUBLE) / nt)
             * (1.0 - (CAST(npt - npl AS DOUBLE) / (nt - nl))
                      * (CAST(npt - npl AS DOUBLE) / (nt - nl))
                    - (1.0 - CAST(npt - npl AS DOUBLE) / (nt - nl))
                      * (1.0 - CAST(npt - npl AS DOUBLE) / (nt - nl))), 9)
           AS DECIMAL(18,9)) AS gini9
  FROM cum
  WHERE nl > 0 AND nt - nl > 0
)
SELECT CAST((bucket + 1) * {_GRID} AS BIGINT) AS split_at,
       CAST(nl AS BIGINT) AS n_left,
       CAST(nr AS BIGINT) AS n_right,
       CAST(npl AS BIGINT) AS pos_left,
       CAST(npr AS BIGINT) AS pos_right,
       CAST(CAST(gini9 AS VARCHAR) AS DOUBLE) AS weighted_gini
FROM cand
ORDER BY gini9, bucket
LIMIT 1
""",
    description="Decision-stump split search — the first node of every "
    "gradient-boosted tree, relationally: order values histogram into "
    f"{_GRID}-wide buckets (the bounded candidate grid — the histogram "
    "trick XGBoost/LightGBM run per feature), one cumulative window "
    "yields every candidate threshold's left/right class counts, and "
    "weighted Gini impurity of the URGENT-vs-rest label picks the best "
    "cut (total (gini, bucket) order). Ratios are one IEEE chain per "
    "CANDIDATE (bounded set) snapped to 9-dp decimals. One fact pass + "
    "one grid-sized window — the shape that lets tree training scan "
    "thousands of features in parallel at 100 TB.",
    tags=("feature", "agg", "stats"),
)
def feature_gini_best_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    labeled = t(spark, sf_dir, "orders").select(
        F.expr(f"CAST(floor(o_totalprice) AS BIGINT) div {_GRID}").alias("bucket"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("pos"),
    )
    hist = labeled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("np")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = hist.select(
        "bucket",
        F.sum("n").over(w).alias("nl"),
        F.sum("np").over(w).alias("npl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("np").over(wt).alias("npt"),
    )
    nl, npl = F.col("nl").cast("double"), F.col("npl").cast("double")
    nt, npt = F.col("nt").cast("double"), F.col("npt").cast("double")
    nr, npr = nt - nl, npt - npl
    pl, pr = npl / nl, npr / nr

    def gini(p):
        return 1.0 - p * p - (1.0 - p) * (1.0 - p)

    weighted = (nl / nt) * gini(pl) + (nr / nt) * gini(pr)
    cand = cum.filter(
        (F.col("nl") > 0) & (F.col("nt") - F.col("nl") > 0)
    ).select(
        "bucket",
        "nl",
        "npl",
        (F.col("nt") - F.col("nl")).alias("nr_i"),
        (F.col("npt") - F.col("npl")).alias("npr_i"),
        F.round(weighted, 9).cast("decimal(18,9)").alias("gini9"),
    )
    return (
        cand.orderBy("gini9", "bucket")
        .limit(1)
        .select(
            ((F.col("bucket") + 1) * _GRID).cast("bigint").alias("split_at"),
            F.col("nl").cast("bigint").alias("n_left"),
            F.col("nr_i").cast("bigint").alias("n_right"),
            F.col("npl").cast("bigint").alias("pos_left"),
            F.col("npr_i").cast("bigint").alias("pos_right"),
            F.col("gini9").cast("double").alias("weighted_gini"),
        )
    )


_MIN_DF = 20
_TOPK = 20

_SQL_TOKS_NORM = (
    f"list_filter(regexp_split_to_array({SQL_NORM.format(col='text')}, "
    "'\\s+'), _t -> _t <> '')"
)


@register(
    "feature_chi2_term_selection",
    oracle=f"""
WITH presence AS (
  SELECT DISTINCT doc_id, lang, unnest(list_distinct({_SQL_TOKS_NORM})) AS term
  FROM documents
),
docs_per_lang AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
df AS (
  SELECT term, COUNT(*) AS df FROM presence GROUP BY term
  HAVING COUNT(*) >= {_MIN_DF}
),
obs AS (
  SELECT p.term, p.lang, COUNT(*) AS o
  FROM presence p JOIN df ON df.term = p.term
  GROUP BY p.term, p.lang
),
grid AS (
  SELECT d.term, l.lang, d.df, l.n_lang, (SELECT n FROM n_docs) AS n
  FROM df d CROSS JOIN docs_per_lang l
),
cells AS (
  SELECT g.term, g.lang, g.df,
         COALESCE(o.o, 0) AS o_pres,
         g.n_lang - COALESCE(o.o, 0) AS o_abs,
         CAST(g.df AS DOUBLE) * g.n_lang / g.n AS e_pres,
         CAST(g.n - g.df AS DOUBLE) * g.n_lang / g.n AS e_abs
  FROM grid g LEFT JOIN obs o ON o.term = g.term AND o.lang = g.lang
),
scored AS (
  SELECT term,
         SUM(CAST(round(
           (o_pres - e_pres) * (o_pres - e_pres) / e_pres
           + (o_abs - e_abs) * (o_abs - e_abs) / e_abs, 9)
           AS DECIMAL(28,9))) AS chi9,
         CAST(MAX(df) AS BIGINT) AS df
  FROM cells
  GROUP BY term
)
SELECT term, df,
       CAST(CAST(chi9 AS VARCHAR) AS DOUBLE) AS chi2
FROM scored
ORDER BY chi9 DESC, term
LIMIT {_TOPK}
""",
    description="Chi-square feature selection for text classification: "
    f"every term with document frequency >= {_MIN_DF} crossed with the "
    "5-language label (presence/absence cells, expected counts from the "
    "marginals), chi-square summed over the 10 cells with each cell "
    "term snapped to 9-dp decimals, top "
    f"{_TOPK} by (chi2, term) total order — the classic 'which features "
    "separate the classes' ranking run before training a lang/topic "
    "classifier (agg_chi_square_independence is the single-pair test; "
    "this is the selection sweep). One presence explode + "
    "vocabulary-sized arithmetic.",
    tags=("feature", "text", "stats"),
)
def feature_chi2_term_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    presence = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(tokens(normalize_text(F.col("text"))))
        ).alias("term"),
    ).distinct()
    docs_per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lang")
    )
    n_docs = docs.count()  # plan constant
    df = (
        presence.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= _MIN_DF)
    )
    obs = (
        presence.join(F.broadcast(df.select("term")), "term")
        .groupBy("term", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    grid = df.crossJoin(F.broadcast(docs_per_lang))
    cells = grid.join(obs, ["term", "lang"], "left").select(
        "term",
        "df",
        F.coalesce("o", F.lit(0)).alias("o_pres"),
        (F.col("n_lang") - F.coalesce("o", F.lit(0))).alias("o_abs"),
        (
            F.col("df").cast("double") * F.col("n_lang") / F.lit(n_docs)
        ).alias("e_pres"),
        (
            (F.lit(n_docs) - F.col("df")).cast("double")
            * F.col("n_lang")
            / F.lit(n_docs)
        ).alias("e_abs"),
    )
    term_cell = F.round(
        (F.col("o_pres") - F.col("e_pres"))
        * (F.col("o_pres") - F.col("e_pres"))
        / F.col("e_pres")
        + (F.col("o_abs") - F.col("e_abs"))
        * (F.col("o_abs") - F.col("e_abs"))
        / F.col("e_abs"),
        9,
    ).cast("decimal(28,9)")
    scored = cells.groupBy("term").agg(
        F.sum(term_cell).alias("chi9"),
        F.max("df").cast("bigint").alias("df"),
    )
    return (
        scored.orderBy(F.desc("chi9"), "term")
        .limit(_TOPK)
        .select("term", "df", F.col("chi9").cast("double").alias("chi2"))
    )
