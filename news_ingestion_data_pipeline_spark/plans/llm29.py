"""Twenty-ninth wave: language-model estimation and longitudinal
analytics — interpolated Kneser-Ney bigram probabilities (the n-gram LM
actually used before neural LMs, and still the dedup/quality scorer's
backbone), cohort lifetime-value curves, and a rolling OLS slope from
windowed decimal power sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_KN_D = 0.75
_KN_TOP = 20


@register(
    "text_kneser_ney_bigram",
    oracle=f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT toks[u.i] AS w1, toks[u.i + 1] AS w2
  FROM d, unnest(range(1, len(toks))) AS u(i)
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, SUM(c) AS cw1, COUNT(*) AS n1p_fw FROM c12 GROUP BY w1
), cont AS (
  SELECT w2, COUNT(*) AS n1p_bw FROM c12 GROUP BY w2
), total AS (
  SELECT COUNT(*) AS n_types FROM c12
)
SELECT c12.w1, c12.w2, CAST(c12.c AS BIGINT) AS bigram_count,
       round(
         greatest(c12.c - {_KN_D}, 0) / c1.cw1
         + ({_KN_D} * c1.n1p_fw / c1.cw1)
           * (CAST(cont.n1p_bw AS DOUBLE) / total.n_types), 6) AS p_kn
FROM c12
JOIN c1 ON c1.w1 = c12.w1
JOIN cont ON cont.w2 = c12.w2
CROSS JOIN total
ORDER BY bigram_count DESC, c12.w1, c12.w2
LIMIT {_KN_TOP}
""",
    description="Interpolated Kneser-Ney bigram probabilities over the "
    "corpus token stream: P(w2|w1) = max(c(w1,w2)-D,0)/c(w1) + lambda(w1)"
    "*P_cont(w2), with discount D=0.75, lambda(w1) = D*N1+(w1,.)/c(w1), "
    "and the continuation probability P_cont(w2) = N1+(.,w2)/|bigram "
    "types| — the Chen & Goodman (1998) formulation. Every ingredient is "
    "an integer COUNT from three hash aggregates over the bigram table "
    "(types, forward fan-out, backward fan-in), so the smoothed "
    "probability is a pure deterministic function both engines compute "
    "identically. This is the scorer behind perplexity filtering "
    "(text_unigram_logprob's big sibling) and the KN LM quality gates in "
    "C4-class pipelines. Scale shape: bigram extraction is one explode "
    "(no self-join), the three count tables shuffle on w1/w2/(w1,w2) "
    "with map-side combine, and the final joins are fact-to-vocab — "
    "vocab-sized build sides the optimizer broadcasts.",
    tags=("text", "llm"),
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(F.split("text", " ").alias("toks"))
    pairs = F.transform(
        F.slice(F.col("toks"), 1, F.size("toks") - 1),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(F.col("toks"), i + 2).alias("w2")
        ),
    )
    bg = d.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c").alias("cw1"), F.count(F.lit(1)).alias("n1p_fw")
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bw"))
    total = c12.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = (
        F.greatest(F.col("c") - _KN_D, F.lit(0.0)) / F.col("cw1")
        + (_KN_D * F.col("n1p_fw") / F.col("cw1"))
        * (F.col("n1p_bw").cast("double") / F.col("n_types"))
    )
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("bigram_count"),
            F.round(p_kn, 6).alias("p_kn"),
        )
        .orderBy(F.desc("bigram_count"), "w1", "w2")
        .limit(_KN_TOP)
    )


@register(
    "orders_cohort_ltv",
    oracle="""
WITH firsts AS (
  SELECT o_custkey,
         MIN(date_trunc('month', o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
), sized AS (
  SELECT cohort, COUNT(*) AS n_customers FROM firsts GROUP BY cohort
), rev AS (
  SELECT f.cohort,
         (EXTRACT(year FROM o.o_orderdate) - EXTRACT(year FROM f.cohort)) * 12
           + (EXTRACT(month FROM o.o_orderdate) - EXTRACT(month FROM f.cohort))
           AS months_since,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS m_rev
  FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, months_since,
         SUM(m_rev) OVER (PARTITION BY cohort ORDER BY months_since) AS c_rev
  FROM rev
)
SELECT strftime(cum.cohort, '%Y-%m') AS cohort_month,
       CAST(months_since AS INT) AS months_since,
       CAST(s.n_customers AS BIGINT) AS n_customers,
       CAST(CAST(c_rev AS VARCHAR) AS DOUBLE) AS cum_revenue,
       -- integer round-half-up in cents: immune to the double-rounding
       -- divergence when c_rev/n lands on an exact decimal half
       ((2 * CAST(c_rev * 100 AS BIGINT) + s.n_customers)
        // (2 * s.n_customers)) / 100.0 AS ltv_per_customer
FROM cum JOIN sized s ON s.cohort = cum.cohort
WHERE months_since <= 11
ORDER BY cohort_month, months_since
""",
    description="Cohort lifetime-value curves: customers cohorted by "
    "first-order month, then cumulative revenue per cohort member at "
    "each month-since-acquisition (0..11) — the longitudinal twin of "
    "events_retention_cohorts (which counts presence; this accumulates "
    "value). Revenue sums are exact DECIMAL (partition-order-proof), "
    "the cumulative is one window per cohort over at most 12 points, "
    "and the decimal->double projection goes through VARCHAR per the "
    "registry's cross-engine rule. Shape: two hash aggregates (first "
    "order per customer, revenue per cohort-month) + a cohort-sized "
    "window — the fact table is touched twice, never self-joined "
    "row-to-row.",
    tags=("agg", "events", "window"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    months_since = (
        (F.year("o_orderdate") - F.year("cohort")) * 12
        + (F.month("o_orderdate") - F.month("cohort"))
    ).alias("months_since")
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort", months_since)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m_rev"))
    )
    cum = rev.withColumn(
        "c_rev",
        F.sum("m_rev").over(
            Window.partitionBy("cohort").orderBy("months_since")
        ),
    )
    return (
        cum.join(sized, "cohort")
        .where(F.col("months_since") <= 11)
        .select(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            F.col("months_since").cast("int").alias("months_since"),
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.col("c_rev").cast("string").cast("double").alias("cum_revenue"),
            (
                F.expr(
                    "(2 * cast(c_rev * 100 as bigint) + n_customers)"
                    " div (2 * n_customers)"
                )
                / 100.0
            ).alias("ltv_per_customer"),
        )
        
    )


_SLOPE_W = 24


@register(
    "window_rolling_slope",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS y
  FROM events GROUP BY 1, 2
), idx AS (
  SELECT event_type, h, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
              AS DECIMAL(19,0)) AS x
  FROM hourly
), sums AS (
  SELECT event_type, h,
         CAST(COUNT(*) OVER w AS DECIMAL(38,0)) AS n,
         CAST(SUM(x) OVER w AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(19,0))) OVER w AS DECIMAL(38,0)) AS sy,
         CAST(SUM(x * CAST(y AS DECIMAL(19,0))) OVER w AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(x * x) OVER w AS DECIMAL(38,0)) AS sxx
  FROM idx
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN {_SLOPE_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(n AS BIGINT) AS n_window,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope
FROM sums
WHERE n >= 2
ORDER BY event_type, hour
""",
    description=f"Rolling OLS trend slope over the trailing {_SLOPE_W} "
    "hours of each event type's hourly count series — the monitoring "
    "primitive behind 'is this metric accelerating': slope = (n*Sxy - "
    "Sx*Sy)/(n*Sxx - Sx^2) where x is the hour index and every power "
    "sum is an exact DECIMAL accumulated by the window frame (ROWS "
    f"BETWEEN {_SLOPE_W - 1} PRECEDING AND CURRENT ROW) — the same "
    "power-sum discipline as window_bollinger_flags, extended to the "
    "regression numerator. No per-window refit, no UDF: the frame "
    "slides in O(1) amortized per row inside one partitioned sort. At "
    "100 TB the window operates on the HOURLY series (8760 rows/type/"
    "year), not raw events — the pre-aggregation is what makes rolling "
    "regression free at scale.",
    tags=("window", "timeseries", "stats"),
)
def window_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    idx = hourly.withColumn(
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("h"))
        .cast("decimal(19,0)"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-(_SLOPE_W - 1), 0)
    )
    yd = F.col("y").cast("decimal(19,0)")
    sums = idx.select(
        "event_type",
        "h",
        F.count(F.lit(1)).over(w).cast("decimal(38,0)").alias("n"),
        F.sum("x").over(w).cast("decimal(38,0)").alias("sx"),
        F.sum(yd).over(w).cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * yd).over(w).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("decimal(38,0)").alias("sxx"),
    )
    return (
        sums.where(F.col("n") >= 2)
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("n").cast("bigint").alias("n_window"),
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                ),
                6,
            ).alias("slope"),
        )
        
    )
