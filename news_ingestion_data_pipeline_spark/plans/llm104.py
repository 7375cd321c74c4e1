"""Hundred-fourth wave: period-to-date rollups, calendar/interval scalar
parity, and RAKE keyphrase extraction.

  * window_period_to_date — the BI staple: per order day, daily / MTD /
    YTD revenue, the month and year accumulations resetting at their
    calendar boundaries because the running frames PARTITION by the
    truncated period.  One daily hash-aggregate, then two frames over
    the same date order.
  * scalar_interval_suite — calendar arithmetic is where engines
    disagree silently (month-add clamping at end-of-month, ISO week of
    Jan 1, weekday numbering): add_months, last_day, quarter trunc,
    datediff, quarter/dayofyear/ISO week, Monday-based weekday — every
    one proven bit-identical against DuckDB's equivalents (with the
    numbering conversions made explicit, e.g. isodow-1 = weekday).
  * text_rake_keywords — RAKE: phrases are maximal stopword-free runs
    of a document's token sequence; word score = degree/freq over
    phrase co-occurrence; phrase score = sum of word scores; top
    phrase per document.  Islands over token positions + two hash
    aggregates + a per-doc window — the classic keyword extractor with
    no corpus-global state beyond word statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "window_period_to_date",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
       CAST(CAST(SUM(rev) OVER (PARTITION BY date_trunc('month', day)
                                ORDER BY day ROWS UNBOUNDED PRECEDING)
                 AS VARCHAR) AS DOUBLE) AS mtd_revenue,
       CAST(CAST(SUM(rev) OVER (PARTITION BY date_trunc('year', day)
                                ORDER BY day ROWS UNBOUNDED PRECEDING)
                 AS VARCHAR) AS DOUBLE) AS ytd_revenue
FROM daily
ORDER BY day
""",
    description="Period-to-date rollups (MTD / YTD revenue by order "
    "day) — the BI dashboard staple: one daily hash aggregate through "
    "exact DECIMAL, then running sums whose frames PARTITION by the "
    "truncated month/year so each period resets at its calendar "
    "boundary — no CASE arithmetic, the partitioning IS the reset. "
    "Both frames share the date sort. At 100 TB the daily table is "
    "tiny and the window state is one period's days.",
    tags=("window", "agg"),
)
def window_period_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day"), "o_totalprice"
    )
    daily = o.groupBy("day").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    wm = (
        Window.partitionBy(F.date_trunc("month", "day"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wy = (
        Window.partitionBy(F.date_trunc("year", "day"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(wm).cast("double").alias("mtd_revenue"),
        F.sum("rev").over(wy).cast("double").alias("ytd_revenue"),
    )


@register(
    "scalar_interval_suite",
    oracle="""
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d')
         AS plus_1m,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
         AS month_end,
       strftime(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE))
                AS DATE), '%Y-%m-%d') AS quarter_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since_95,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(dayofyear(o_orderdate) AS INT) AS doy,
       CAST(week(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
       CAST(isodow(o_orderdate) - 1 AS INT) AS weekday_mon0
FROM orders
ORDER BY o_orderkey
""",
    description="Calendar/interval scalar parity suite — the arithmetic "
    "engines disagree on silently, proven bit-identical per order "
    "date: month-add with end-of-month clamping (Jan 31 + 1 month = "
    "Feb 28/29 in BOTH engines' semantics), last_day, quarter "
    "truncation, day diffs against an epoch date, quarter/day-of-year, "
    "ISO week (week 53 spans year boundaries identically), and "
    "Monday-based weekday with the numbering conversion explicit "
    "(Spark weekday == DuckDB isodow - 1). Pure map — these are the "
    "expressions every partition key and cohort bucket is built from, "
    "so cross-engine agreement here underwrites half the registry.",
    tags=("scalar",),
)
def scalar_interval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("d")
    )
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months("d", 1), "yyyy-MM-dd").alias("plus_1m"),
        F.date_format(F.last_day("d"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(
            F.date_trunc("quarter", "d").cast("date"), "yyyy-MM-dd"
        ).alias("quarter_start"),
        F.datediff("d", F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        F.quarter("d").cast("int").alias("q"),
        F.dayofyear("d").cast("int").alias("doy"),
        F.weekofyear("d").cast("int").alias("iso_week"),
        F.expr("weekday(d)").cast("int").alias("weekday_mon0"),
    )


_STOP = "('the','a','of','and','to','in')"


@register(
    "text_rake_keywords",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, t.w, t.pos
  FROM documents,
       LATERAL (SELECT unnest(list_filter(regexp_split_to_array(
                         trim(lower(text)), '\\s+'), _x -> _x <> '')) AS w,
                       generate_subscripts(list_filter(
                         regexp_split_to_array(trim(lower(text)), '\\s+'),
                         _x -> _x <> ''), 1) AS pos) t
  WHERE length(trim(text)) > 0
), nonstop AS (
  SELECT doc_id, w, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM toks WHERE w NOT IN {_STOP}
), phrases AS (
  SELECT doc_id, island,
         string_agg(w, ' ' ORDER BY pos) AS phrase,
         COUNT(*) AS plen
  FROM nonstop GROUP BY doc_id, island
), word_stats AS (
  SELECT w,
         COUNT(*) AS freq,
         SUM(plen) AS deg
  FROM nonstop JOIN phrases USING (doc_id, island)
  GROUP BY w
), scored AS (
  SELECT p.doc_id, p.phrase,
         round(SUM(CAST(round(CAST(ws.deg AS DOUBLE) / ws.freq, 9)
                        AS DECIMAL(28,12))), 6) AS score
  FROM phrases p
  JOIN nonstop n ON n.doc_id = p.doc_id AND n.island = p.island
  JOIN word_stats ws ON ws.w = n.w
  GROUP BY p.doc_id, p.phrase, p.island
)
SELECT doc_id, phrase AS top_phrase,
       CAST(score AS DOUBLE) AS rake_score
FROM (
  SELECT doc_id, phrase, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, phrase) AS rn
  FROM scored
) WHERE rn = 1
ORDER BY doc_id
""",
    description="RAKE keyphrase extraction: phrases are maximal "
    "stopword-free runs of each document's token sequence (islands "
    "over token positions), a word's score is its phrase-degree over "
    "frequency (degree = total length of phrases it appears in, both "
    "corpus-wide hash aggregates), a phrase's score is the sum of its "
    "words' scores (per-occurrence, standard RAKE), and each document "
    "reports its top phrase under total (score DESC, phrase) order. "
    "Division results rounded to 9 decimals and summed through exact "
    "DECIMAL — the registry's float contract. Shape: one corpus "
    "tokenize pass, two word-level hash aggregates, one per-doc "
    "window — word stats are vocabulary-sized at 100 TB.",
    tags=("text", "llm"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX

    docs = t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = docs.select(
        "doc_id",
        F.posexplode(TX.tokens(F.lower("text"))).alias("pos0", "w"),
    ).select("doc_id", "w", (F.col("pos0") + 1).alias("pos"))
    stop = ["the", "a", "of", "and", "to", "in"]
    nonstop = toks.filter(~F.col("w").isin(stop)).withColumn(
        "island",
        F.col("pos")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
    )
    phrases = nonstop.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "w"))
                ),
                lambda s: s["w"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    word_stats = (
        nonstop.join(phrases, ["doc_id", "island"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("deg"),
        )
        .withColumn(
            "wscore",
            F.round(F.col("deg").cast("double") / F.col("freq"), 9).cast(
                "decimal(28,12)"
            ),
        )
    )
    scored = (
        phrases.join(nonstop, ["doc_id", "island"])
        .join(word_stats, "w")
        .groupBy("doc_id", "island", "phrase")
        .agg(F.round(F.sum("wscore"), 6).alias("score"))
    )
    best = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("score").desc(), "phrase"
            )
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "doc_id",
        F.col("phrase").alias("top_phrase"),
        F.col("score").cast("double").alias("rake_score"),
    )
