"""Thirty-fourth wave: price-index economics and experiment hygiene —
a Laspeyres price index with exact fixed-point unit prices, an
equi-depth histogram (the zone-map twin of the equi-width one), and a
sample-ratio-mismatch chi-square screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "lineitem_price_index",
    oracle="""
WITH m AS (
  SELECT l_partkey,
         strftime(date_trunc('month', l_shipdate), '%Y-%m') AS mon,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS e_cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
), base AS (
  SELECT MIN(mon) AS mon0 FROM m
), p AS (
  -- unit price in exact micro-units, integer round-half-up:
  -- price_micros = round(1e4 * e_cents / q)
  SELECT l_partkey, mon,
         (2 * e_cents * 10000 + q) // (2 * q) AS p_micros, q
  FROM m
), b AS (
  SELECT l_partkey, p_micros AS p0, q AS q0
  FROM p, base WHERE mon = mon0
), idx AS (
  SELECT p.mon,
         SUM(p.p_micros * b.q0) AS num,
         SUM(b.p0 * b.q0) AS den,
         COUNT(*) AS n_parts
  FROM p JOIN b ON b.l_partkey = p.l_partkey
  GROUP BY p.mon
)
SELECT mon AS month,
       CAST(n_parts AS BIGINT) AS n_parts,
       round(100.0 * num / den, 4) AS laspeyres_index
FROM idx
ORDER BY month
""",
    description="Laspeyres price index over lineitem: monthly per-part "
    "unit prices weighted by the BASE month's quantity basket, index_t "
    "= 100 * sum(p_t*q_0)/sum(p_0*q_0) over parts traded in both the "
    "base and current month — the fixed-basket inflation measure (what "
    "CPI is). Unit prices are exact integer MICRO-units via round-half-"
    "up integer division (price_micros = round(1e4*cents/qty)), so the "
    "basket sums are pure bigint arithmetic — no order-dependent double "
    "accumulation anywhere; the only float op is the final ratio. "
    "Shape: one (part, month) hash aggregate over the fact table, a "
    "broadcast-sized base-month basket joined back, one month-level "
    "rollup. At 100 TB the base basket is the only state carried "
    "between periods — kilobytes per million parts.",
    tags=("agg", "timeseries", "stats"),
)
def lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            "l_partkey",
            F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias(
                "mon"
            ),
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("e_cents"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
        )
        # consumed twice (base basket + index join): persist the
        # (part, month) aggregate so the fact table aggregates ONCE —
        # the monthly rollup is the artifact a production index job
        # materializes between periods. Spill-safe (MEMORY_AND_DISK),
        # catalog-clearable.
        .persist()
    )
    base = m.agg(F.min("mon").alias("mon0"))
    p = m.withColumn(
        "p_micros", F.expr("(2 * e_cents * 10000 + q) div (2 * q)")
    )
    b = (
        # bcast-ok: base is the 1-row MIN(mon) aggregate
        p.crossJoin(F.broadcast(base))
        .where(F.col("mon") == F.col("mon0"))
        .select(
            "l_partkey",
            F.col("p_micros").alias("p0"),
            F.col("q").alias("q0"),
        )
    )
    idx = (
        p.join(b, "l_partkey")
        .groupBy("mon")
        .agg(
            F.sum(F.col("p_micros") * F.col("q0")).alias("num"),
            F.sum(F.col("p0") * F.col("q0")).alias("den"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )
    return idx.select(
        F.col("mon").alias("month"),
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.round(F.lit(100.0) * F.col("num") / F.col("den"), 4).alias(
            "laspeyres_index"
        ),
    )


_EQD_BUCKETS = 10


@register(
    "agg_equidepth_histogram",
    oracle=f"""
WITH ranked AS (
  SELECT l_extendedprice AS v,
         ntile({_EQD_BUCKETS}) OVER (ORDER BY l_extendedprice,
                                     l_orderkey, l_linenumber) AS bkt
  FROM lineitem
)
SELECT CAST(bkt AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(CAST(MIN(CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS lo,
       CAST(CAST(MAX(CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS hi,
       CAST(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         AS bucket_sum
FROM ranked
GROUP BY bkt
ORDER BY bucket
""",
    description=f"Equi-depth (equal-frequency) histogram of "
    f"l_extendedprice in {_EQD_BUCKETS} buckets — each bucket holds the "
    "same row count and the boundaries adapt to the distribution, which "
    "is what optimizers keep as statistics and what makes skewed-value "
    "zone maps useful (the equi-WIDTH twin is agg_price_histogram; "
    "equi-depth is the one that stays informative under skew). "
    "Assignment is NTILE semantics over the total order "
    "(value, orderkey, linenumber) so tied prices land "
    "deterministically — but computed WITHOUT the single-partition "
    "global-sort window: rows are range-bucketed on value (4096-way "
    "histogram, one hash aggregate), prefix offsets come from the tiny "
    "bucket histogram, ranks are per-bucket windows running in parallel, "
    "and the ANSI NTILE distribution is recovered arithmetically from "
    "(rank, count) — bit-identical to ntile() OVER (ORDER BY ...) at "
    "any scale (the agg_percentile_ranks two-pass decomposition). Then "
    "a 10-group aggregate with decimal-exact min/max/sum through the "
    "VARCHAR cast rule.",
    tags=("agg", "stats"),
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators.ranking import (
        distributed_row_number,
        ntile_from_rank,
    )

    HB = 4096
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    stats = li.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("cnt"),
    )
    li2 = li.crossJoin(F.broadcast(stats))
    vbucket = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("v") - F.col("mn"))
                    / ((F.col("mx") - F.col("mn")) / HB)
                ),
                F.lit(HB - 1),
            )
        )
        .cast("long")
    )
    ranked = distributed_row_number(
        li2, ["v", "l_orderkey", "l_linenumber"], vbucket, out="rn"
    ).select(
        "v",
        ntile_from_rank(F.col("rn"), F.col("cnt"), _EQD_BUCKETS).alias("bkt"),
    )
    vd = F.col("v").cast("decimal(18,2)")
    return (
        ranked.groupBy(F.col("bkt").cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(vd).cast("string").cast("double").alias("lo"),
            F.max(vd).cast("string").cast("double").alias("hi"),
            F.sum(vd).cast("string").cast("double").alias("bucket_sum"),
        )
        
    )


@register(
    "events_srm_check",
    oracle="""
WITH assign AS (
  SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
), counts AS (
  SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1,
         COUNT(*) AS n
  FROM assign
)
SELECT CAST(n0 AS BIGINT) AS n_control,
       CAST(n1 AS BIGINT) AS n_treatment,
       round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / n, 6) AS chi_square,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / n > 3.841 AS srm_flag
FROM counts
""",
    description="Sample-ratio-mismatch (SRM) screen for the hash-based "
    "50/50 experiment assignment (user_id % 2, the same deterministic "
    "split events_ab_test_z analyzes): chi-square goodness-of-fit "
    "against the intended ratio, which for two equal cells reduces to "
    "(n0-n1)^2/n, flagged at the 95% critical value 3.841. SRM is the "
    "mandatory pre-test before reading ANY experiment metric — a "
    "mismatched denominator invalidates the z-test downstream. One "
    "distinct-users aggregate, integer arithmetic, one division; "
    "map-side combinable and constant output regardless of scale.",
    tags=("events", "stats",),
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign = (
        t(spark, sf_dir, "events")
        .select("user_id", (F.col("user_id") % 2).alias("variant"))
        .distinct()
    )
    counts = assign.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        F.count(F.lit(1)).alias("n"),
    )
    chi = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / F.col("n")
    return counts.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("n1").cast("bigint").alias("n_treatment"),
        F.round(chi, 6).alias("chi_square"),
        (chi > 3.841).alias("srm_flag"),
    )
