"""Fifth relational wave: arg-extremes (max_by/min_by), bitwise scalar
plumbing, first-touch attribution over the event stream, shuffle-free
bigram mining, and numeric histogram binning — each with a bit-exact
DuckDB oracle.

Reference parity: the reference has no analog for any of these
(SURVEY.md §2.12 — absent categories built Spark-native for the driver
contract); the event/text shapes extend the LLM-pipeline surface the
north star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import (
    dec,
    dsum,
    register,
    t,
)


@register(
    "agg_min_max_by",
    oracle="""
WITH mx AS (
  SELECT o_orderpriority, o_orderkey AS top_order, o_totalprice AS top_price,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
), mn AS (
  SELECT o_orderpriority, o_orderkey AS bottom_order,
         o_totalprice AS bottom_price,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn
  FROM orders
), c AS (
  SELECT o_orderpriority,
         COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_orderpriority
)
SELECT c.o_orderpriority, mx.top_order, mx.top_price,
       mn.bottom_order, mn.bottom_price, c.n_big, c.n_orders
FROM c
JOIN mx ON mx.o_orderpriority = c.o_orderpriority AND mx.rn = 1
JOIN mn ON mn.o_orderpriority = c.o_orderpriority AND mn.rn = 1
""",
    description="Arg-extreme aggregation: the orderkey carrying the max / "
    "min totalprice per priority class via max_by/min_by over a "
    "(totalprice, orderkey) struct — the struct's lexicographic order "
    "makes ties deterministic without a window. One partial+final hash "
    "aggregate, no sort, no join; the oracle needs three scans and two "
    "joins to express the same thing. count_if rides the same aggregate. "
    "At 100 TB this is a single shuffle of 5 groups, vs the window form's "
    "per-group total sort.",
    tags=("agg", "argmax"),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    ordkey = F.struct("o_totalprice", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", ordkey).alias("top_order"),
            F.max("o_totalprice").alias("top_price"),
            F.min_by("o_orderkey", ordkey).alias("bottom_order"),
            F.min("o_totalprice").alias("bottom_price"),
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "scalar_bitwise_suite",
    oracle="""
SELECT l_orderkey, l_partkey,
       l_orderkey & 255 AS low_byte,
       xor(l_orderkey, l_partkey) AS key_xor,
       l_partkey << 2 AS pk_shl2,
       l_orderkey >> 3 AS ok_shr3,
       CAST(bit_count(l_orderkey) AS INT) AS ok_popcount,
       CAST(l_orderkey % 2 = 0 AS BOOLEAN) AS ok_even
FROM lineitem
WHERE l_orderkey % 499 = 0
""",
    description="Bitwise scalar suite: AND-mask, XOR, shifts, popcount, "
    "parity — all JVM expression-tree primitives inside one "
    "WholeStageCodegen project over a pruned 2-column scan. These are the "
    "building blocks the hash/fingerprint operators (simhash, rolling "
    "hash) compose; verified standalone here.",
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ok, pk = F.col("l_orderkey"), F.col("l_partkey")
    return (
        t(spark, sf_dir, "lineitem")
        .filter(ok % 499 == 0)
        .select(
            "l_orderkey",
            "l_partkey",
            ok.bitwiseAND(F.lit(255)).alias("low_byte"),
            ok.bitwiseXOR(pk).alias("key_xor"),
            F.shiftleft(pk, 2).alias("pk_shl2"),
            F.shiftright(ok, 3).alias("ok_shr3"),
            F.bit_count(ok).alias("ok_popcount"),
            (ok % 2 == 0).alias("ok_even"),
        )
    )


@register(
    "events_first_touch",
    oracle="""
WITH firsts AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), per_user AS (
  SELECT user_id,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purch,
         COALESCE(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(18,2)) END),
                  0) AS purch_value
  FROM events GROUP BY user_id
)
SELECT f.event_type AS first_event_type,
       COUNT(*) AS n_users,
       COUNT(*) FILTER (WHERE p.n_purch > 0) AS n_converting,
       CAST(CAST(SUM(p.purch_value) AS VARCHAR) AS DOUBLE) AS total_purchase_value
FROM firsts f JOIN per_user p ON p.user_id = f.user_id
WHERE f.rn = 1
GROUP BY f.event_type
""",
    description="First-touch attribution: each user's chronologically "
    "first event type (min_by over a (ts, event_id) struct — no window, "
    "no per-user sort) credited with the user's purchase count and value. "
    "ONE groupBy(user_id) computes first-touch and the purchase rollup in "
    "the same partial+final aggregate, then a 5-group re-aggregate. "
    "Per-user money stays DECIMAL until the final scalar so the "
    "cross-user sum is partition-order independent. The oracle needs a "
    "window plus a join; the Spark plan is two hash aggregates.",
    tags=("events", "agg", "argmax"),
)
def events_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    is_purch = F.col("event_type") == "purchase"
    per_user = ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias(
            "first_event_type"
        ),
        F.count_if(is_purch).alias("n_purch"),
        F.coalesce(
            F.sum(F.when(is_purch, dec("value"))),
            F.lit(0).cast("decimal(18,2)"),
        ).alias("purch_value"),
    )
    return per_user.groupBy("first_event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(F.col("n_purch") > 0).alias("n_converting"),
        F.sum("purch_value").cast("double").alias("total_purchase_value"),
    )


@register(
    "text_bigrams_top",
    oracle="""
WITH words AS (
  SELECT lang, doc_id,
         unnest(string_split(text, ' ')) AS w,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT lang,
         w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS bigram
  FROM words
), counts AS (
  SELECT lang, bigram, COUNT(*) AS n
  FROM bg WHERE bigram IS NOT NULL GROUP BY lang, bigram
), ranked AS (
  SELECT lang, bigram, n,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n DESC, bigram) AS rn
  FROM counts
)
SELECT lang, bigram, n, rn FROM ranked WHERE rn <= 10
""",
    description="Top-10 adjacent word pairs per language. Bigrams form "
    "map-side with zip_with over two slices of the split array — no "
    "positional explode, no per-document window, no shuffle until the "
    "(lang, bigram) count. The oracle must explode to (word, position) "
    "rows and run a lead window per document — at 100 TB that per-doc "
    "window is a shuffle of every token; the zip_with form shuffles only "
    "distinct (lang, bigram) counts.",
    tags=("text", "ngram", "topk"),
)
def text_bigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counts = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.select("lang", "bigram", "n", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
    )


@register(
    "agg_price_histogram",
    oracle="""
SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
       CAST(floor(l_extendedprice / 10000) * 10000 AS DOUBLE) AS bucket_lo,
       COUNT(*) AS n_rows,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         AS sum_price
FROM lineitem
GROUP BY 1, 2
""",
    description="Fixed-width numeric histogram: arithmetic binning "
    "(floor(x/w)) computed map-side, then a partial+final aggregate over "
    "~10 buckets. The bin id is data, not a CASE ladder, so the same plan "
    "serves any width; min/max/exact-decimal-sum ride the same aggregate. "
    "This is the profiling primitive behind the corpus length/quality "
    "distributions, verified standalone.",
    tags=("agg", "histogram", "stats"),
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = F.floor(F.col("l_extendedprice") / 10000)
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            bucket.alias("bucket"),
            (bucket * 10000).cast("double").alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )
