"""Sixty-fourth wave: the dataset card and long-memory estimation.

curation_dataset_card is the one-row summary a corpus release ships with
(HuggingFace dataset-card numbers: sizes, token estimates, language mix,
duplication rate, length spread) — every number assembled from the
engine's own verified constructions.  agg_hurst_rs estimates long-range
dependence in the daily value series via rescaled-range analysis, the
classic H > 0.5 persistence test that complements
events_autocorrelation's short-lag view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "curation_dataset_card",
    oracle=f"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
         len(string_split(text, ' ')) AS n_tok,
         md5({SQL_NORM.format(col='text')}) AS f
  FROM documents
), summary AS (
  SELECT COUNT(*) AS n_docs,
         COUNT(DISTINCT source) AS n_sources,
         COUNT(DISTINCT lang) AS n_langs,
         SUM(n_chars) AS total_chars,
         SUM(n_tok) AS total_ws_tokens,
         COUNT(*) - COUNT(DISTINCT f) AS n_exact_dups
  FROM base
), lens AS (
  SELECT n_tok, ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM base
), pct AS (
  SELECT MIN(CASE WHEN rn = (n + 1) // 2 THEN n_tok END) AS med_tok,
         MIN(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN n_tok END)
           AS p95_tok
  FROM lens
)
SELECT CAST(s.n_docs AS BIGINT) AS n_docs,
       CAST(s.n_sources AS BIGINT) AS n_sources,
       CAST(s.n_langs AS BIGINT) AS n_langs,
       CAST(s.total_chars AS BIGINT) AS total_chars,
       CAST(s.total_ws_tokens AS BIGINT) AS total_ws_tokens,
       CAST(s.n_exact_dups AS BIGINT) AS n_exact_dups,
       round(CAST(s.n_exact_dups AS DOUBLE) / s.n_docs, 6) AS exact_dup_rate,
       CAST(p.med_tok AS BIGINT) AS median_tokens,
       CAST(p.p95_tok AS BIGINT) AS p95_tokens
FROM summary s CROSS JOIN pct p
""",
    description="The dataset card: the one-row release summary a training "
    "corpus ships with — document/source/language counts, character and "
    "whitespace-token mass (the budget number text_bpe_token_count "
    "refines), the exact-duplicate count and rate (dedup_exact_rows' "
    "normalized fingerprint), and exact median/p95 token lengths (order "
    "statistics over the doc domain). Every number is drawn from the "
    "engine's own verified constructions, so the card is consistent "
    "with the queries a consumer would run to check it. Shape: one "
    "scan computes per-doc features, then a distinct-count aggregate, "
    "a rank over docs, and 1-row glue — at 100 TB the rank becomes the "
    "histogram-rank rewrite and everything else is a single pass.",
    tags=("curation", "llm", "agg"),
)
def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX

    base = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tok"),
        TX.doc_fingerprint(F.col("text")).alias("f"),
    )
    summary = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tok").cast("bigint").alias("total_ws_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("f")).cast("bigint").alias("n_exact_dups"),
    )
    # exact median/p95 as histogram order statistics: k-th smallest =
    # min{v : cum(v) >= k} over the distinct-length histogram's two-pass
    # cumulative counts (operators/ranking.py) — no row-domain rank
    from news_ingestion_data_pipeline_spark.operators import ranking as RK

    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_tok").alias("tlo"),
        F.max("n_tok").alias("thi"),
    )
    hist = base.groupBy("n_tok").agg(F.count(F.lit(1)).alias("c"))
    cum = RK.distributed_prefix_sum(
        hist.crossJoin(F.broadcast(stats)),
        ["n_tok"],
        RK.range_bucket(F.col("n_tok"), F.col("tlo"), F.col("thi")),
        ["c"],
        inclusive=True,
    )
    pct = cum.agg(
        F.min(
            F.when(
                F.col("cum_c") >= F.floor((F.col("n") + 1) / 2),
                F.col("n_tok"),
            )
        ).cast("bigint").alias("med_tok"),
        F.min(
            F.when(
                F.col("cum_c") >= F.ceil(F.col("n") * 0.95).cast("bigint"),
                F.col("n_tok"),
            )
        ).cast("bigint").alias("p95_tok"),
    )
    return summary.crossJoin(F.broadcast(pct)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        "total_ws_tokens",
        "n_exact_dups",
        F.round(
            F.col("n_exact_dups").cast("double") / F.col("n_docs"), 6
        ).alias("exact_dup_rate"),
        F.col("med_tok").alias("median_tokens"),
        F.col("p95_tok").alias("p95_tokens"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis
# ---------------------------------------------------------------------------

_HURST_WINDOWS = [5, 10, 15]

_DAILY_SQL = """
  SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE)
           / COUNT(*) AS v,
         ROW_NUMBER() OVER (ORDER BY date_trunc('day', ts)) - 1 AS idx
  FROM events GROUP BY date_trunc('day', ts)
"""


def _rs_sql(w: int) -> str:
    # mean/ssd through DECIMAL sums (unordered block aggregates must be
    # order-independent); cumdev through the ORDERED running sum (both
    # engines accumulate in frame order — deterministic)
    return f"""
  SELECT {w} AS w,
         CAST(CAST(SUM(CAST(round(r_over_s, 9) AS DECIMAL(18,9))) AS VARCHAR)
              AS DOUBLE) / COUNT(*) AS rs
  FROM (
    SELECT blk,
           (MAX(cumdev) - MIN(cumdev))
             / sqrt(CAST(CAST(MAX(ssd) AS VARCHAR) AS DOUBLE) / {w}) AS r_over_s
    FROM (
      SELECT blk, idx,
             SUM(v - mean_v) OVER (PARTITION BY blk ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumdev,
             SUM(CAST(round((v - mean_v) * (v - mean_v), 12)
                      AS DECIMAL(24,12))) OVER (PARTITION BY blk) AS ssd
      FROM (
        SELECT idx, v, idx // {w} AS blk,
               CAST(CAST(SUM(CAST(round(v, 9) AS DECIMAL(18,9)))
                         OVER (PARTITION BY idx // {w}) AS VARCHAR) AS DOUBLE)
                 / {w} AS mean_v
        FROM daily
        WHERE idx < (SELECT COUNT(*) FROM daily) // {w} * {w}
      )
    )
    GROUP BY blk
    HAVING MAX(ssd) > 0
  )
"""


def _hurst_oracle() -> str:
    rs_ctes = ",\n".join(f"rs{w} AS ({_rs_sql(w)})" for w in _HURST_WINDOWS)
    pts = " UNION ALL ".join(
        f"SELECT round(ln({w}), 9) AS lw, round(ln(rs), 9) AS lrs FROM rs{w}"
        for w in _HURST_WINDOWS
    )
    rs_cols = ", ".join(
        f"round((SELECT rs FROM rs{w}), 6) AS rs_{w}" for w in _HURST_WINDOWS
    )
    return f"""
WITH daily AS ({_DAILY_SQL}),
{rs_ctes},
pts AS ({pts}),
fit AS (
  SELECT COUNT(*) AS k, SUM(lw) AS sx, SUM(lrs) AS sy,
         SUM(lw * lrs) AS sxy, SUM(lw * lw) AS sxx
  FROM pts
)
SELECT CAST(k AS BIGINT) AS n_window_sizes,
       round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS hurst_h,
       {rs_cols}
FROM fit
"""


@register(
    "agg_hurst_rs",
    oracle=_hurst_oracle(),
    description=f"Hurst exponent by rescaled-range analysis over the "
    f"daily mean-value series: for block sizes {_HURST_WINDOWS}, each "
    "full block contributes R/S (range of cumulative deviations over "
    "the block's standard deviation), and H is the log-log OLS slope "
    "of mean R/S against block size — H ≈ 0.5 is memoryless, H > 0.5 "
    "persistent trending, H < 0.5 mean-reverting; the long-memory "
    "diagnostic that events_autocorrelation's fixed short lags cannot "
    "see, and the reason naive day-over-day forecasts fail on "
    "persistent series. Determinism: block means and squared-deviation "
    "sums go through DECIMAL; the cumulative deviation uses the "
    "ORDERED running window (frame-order accumulation is identical in "
    "both engines); logs are evaluated on the bounded block-size/R-S "
    "domain and rounded to 9 dp. Shape: one daily pre-aggregate, then "
    "per-block windows over #days rows — trivially small after the "
    "first aggregate, however large the event stream.",
    tags=("agg", "stats", "timeseries"),
)
def agg_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
        .select(
            "v", (F.row_number().over(Window.orderBy("d")) - 1).alias("idx")
        )
        .localCheckpoint()
    )
    n_days = daily.count()
    rs_frames = []
    for w in _HURST_WINDOWS:
        full = daily.filter(F.col("idx") < (n_days // w) * w).withColumn(
            "blk", F.floor(F.col("idx") / w)
        )
        mean_w = (
            F.sum(F.round(F.col("v"), 9).cast("decimal(18,9)"))
            .over(Window.partitionBy("blk"))
            .cast("double")
            / w
        )
        dev = F.col("v") - F.col("mean_v")
        cum = (
            Window.partitionBy("blk")
            .orderBy("idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        blocks = (
            full.withColumn("mean_v", mean_w)
            .withColumn("cumdev", F.sum(dev).over(cum))
            .withColumn(
                "ssd",
                F.sum(F.round(dev * dev, 12).cast("decimal(24,12)")).over(
                    Window.partitionBy("blk")
                ),
            )
            .groupBy("blk")
            .agg(
                (
                    (F.max("cumdev") - F.min("cumdev"))
                    / F.sqrt(F.max("ssd").cast("double") / w)
                ).alias("r_over_s"),
                F.max("ssd").alias("ssd"),
            )
            .filter(F.col("ssd") > 0)
        )
        rs_frames.append(
            blocks.agg(
                F.lit(w).alias("w"),
                (
                    F.sum(F.round("r_over_s", 9).cast("decimal(18,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("rs"),
            )
        )
    rs = rs_frames[0]
    for fr in rs_frames[1:]:
        rs = rs.unionByName(fr)
    rs = rs.localCheckpoint()
    pts = rs.select(
        F.round(F.log(F.col("w").cast("double")), 9).alias("lw"),
        F.round(F.log("rs"), 9).alias("lrs"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lw").alias("sx"),
        F.sum("lrs").alias("sy"),
        F.sum(F.col("lw") * F.col("lrs")).alias("sxy"),
        F.sum(F.col("lw") * F.col("lw")).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    rs_cols = [
        F.round(
            F.min(F.when(F.col("w") == w, F.col("rs"))), 6
        ).alias(f"rs_{w}")
        for w in _HURST_WINDOWS
    ]
    rs_row = rs.agg(*rs_cols)
    return fit.crossJoin(F.broadcast(rs_row)).select(
        F.col("k").cast("bigint").alias("n_window_sizes"),
        F.round(slope, 6).alias("hurst_h"),
        *[F.col(f"rs_{w}") for w in _HURST_WINDOWS],
    )
