"""Fifteenth wave: distributional monitoring — Gini inequality of
customer spend and Jensen-Shannon drift between each source's word
distribution and the corpus — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "customer_gini_spend",
    oracle="""
WITH spend AS (
  SELECT c.c_custkey,
         CAST(CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))),
                            0) AS VARCHAR) AS DOUBLE) AS x
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
), ranked AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, c_custkey) AS i,
         COUNT(*) OVER () AS n
  FROM spend
), s AS (
  SELECT n,
         CAST(CAST(SUM(CAST(x AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           AS sum_x,
         CAST(CAST(SUM(CAST(i AS DECIMAL(18,0))
                       * CAST(x AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
           AS sum_ix
  FROM ranked GROUP BY n
)
SELECT n AS n_customers,
       round(sum_x, 2) AS total_spend,
       round(2.0 * sum_ix / (n * sum_x) - (n + 1.0) / n, 6) AS gini
FROM s
""",
    description="Gini coefficient of customer spend — the rank-weighted "
    "inequality measure (0 = equal, 1 = one whale), complementing the "
    "HHI's square-weighted concentration: G = 2*sum(i*x_(i))/(n*sum(x)) "
    "- (n+1)/n over the spend values in ascending (value, key) order. "
    "Customers with no orders enter at zero via the left join (the "
    "error everyone makes is dropping them and understating "
    "inequality). The rank product accumulates as exact DECIMAL so the "
    "rank-weighted sum is partition-order-proof; the global rank is the "
    "two-pass range-partitioned form (operators/ranking.py: spend-range "
    "buckets from a broadcast envelope, per-bucket local rank + prefix "
    "offsets — no single-partition sort at any SF).",
    tags=("agg", "stats", "customer"),
)
def customer_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                F.lit(0).cast("decimal(18,2)"),
            )
            .cast("double")
            .alias("x")
        )
    )
    env = spend.agg(F.min("x").alias("xlo"), F.max("x").alias("xhi"))
    ranked = RK.distributed_row_number(
        spend.crossJoin(F.broadcast(env)),
        ["x", "c_custkey"],
        RK.range_bucket(F.col("x"), F.col("xlo"), F.col("xhi")),
        out="i",
    ).select("x", "i")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("sum_x"),
        F.sum(
            F.col("i").cast("decimal(18,0)") * F.col("x").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("sum_ix"),
    )
    n = F.col("n")
    return s.select(
        n.alias("n_customers"),
        F.round("sum_x", 2).alias("total_spend"),
        F.round(
            2.0 * F.col("sum_ix") / (n * F.col("sum_x")) - (n + 1.0) / n, 6
        ).alias("gini"),
    )


@register(
    "text_source_divergence",
    oracle=r"""
WITH tok AS (
  SELECT source, unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), _t -> _t <> '')) AS w
  FROM documents WHERE length(trim(text)) > 0
), sc AS (
  SELECT source, w, COUNT(*) AS c FROM tok GROUP BY source, w
), st AS (
  SELECT source, SUM(c) AS n FROM sc GROUP BY source
), cc AS (
  SELECT w, SUM(c) AS c_all FROM sc GROUP BY w
), ct AS (
  SELECT SUM(c_all) AS n_all FROM cc
), terms AS (
  SELECT sc.source, sc.w,
         CAST(sc.c AS DOUBLE) / st.n AS p,
         CAST(cc.c_all AS DOUBLE) / ct.n_all AS q
  FROM sc JOIN st USING (source) JOIN cc USING (w) CROSS JOIN ct
), contrib AS (
  SELECT source, w,
         CAST(round(CASE WHEN p > 0
              THEN 0.5 * p * log2(2.0 * p / (p + q)) ELSE 0 END
            + CASE WHEN q > 0
              THEN 0.5 * q * log2(2.0 * q / (p + q)) ELSE 0 END, 9)
           AS DECIMAL(28,12)) AS jsd_term
  FROM terms
), missing AS (
  -- corpus words absent from this source: p = 0, only the q side remains
  SELECT st.source, cc.w,
         CAST(round(0.5 * (CAST(cc.c_all AS DOUBLE) / ct.n_all)
              * log2(2.0), 9) AS DECIMAL(28,12)) AS jsd_term
  FROM st CROSS JOIN cc CROSS JOIN ct
  WHERE NOT EXISTS (SELECT 1 FROM sc
                    WHERE sc.source = st.source AND sc.w = cc.w)
)
SELECT source,
       CAST(CAST(SUM(jsd_term) AS VARCHAR) AS DOUBLE) AS jsd_bits,
       COUNT(*) AS n_terms
FROM (SELECT * FROM contrib UNION ALL SELECT * FROM missing)
GROUP BY source
ORDER BY source
""",
    description="Jensen-Shannon divergence between each source's word "
    "distribution and the whole corpus — the distribution-drift monitor "
    "(train/serve skew, slice skew, 'did this feed change?'): JSD(P||Q) "
    "= 0.5*KL(P||M) + 0.5*KL(Q||M) with M the midpoint, symmetric and "
    "bounded [0,1] bits — including the q-only mass of corpus words a "
    "source never uses (the term everyone drops, understating drift). "
    "Per-(source, word) contributions are rounded to 9 dp and summed as "
    "exact DECIMAL — vocabulary-bounded log calls, partition-order-"
    "proof, the same treatment as the entropy/perplexity ops. Shape: "
    "three aggregates + one anti-join-style NOT EXISTS, all over the "
    "(source, word) key — at 100 TB the vocab side broadcasts.",
    tags=("llm", "text", "quality"),
)
def text_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(28,12)"
    tok = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(
            "source",
            F.explode(
            TX.tokens(F.lower("text"))  # empty-token-safe (tab-only docs)
        ).alias("w"),
        )
    )
    sc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    sc = sc.localCheckpoint()  # three consumers
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    cc = sc.groupBy("w").agg(F.sum("c").alias("c_all"))
    ct = cc.agg(F.sum("c_all").alias("n_all"))
    terms = (
        sc.join(st, "source")
        .join(F.broadcast(cc), "w")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            "w",
            (F.col("c").cast("double") / F.col("n")).alias("p"),
            (F.col("c_all").cast("double") / F.col("n_all")).alias("q"),
        )
    )
    m = F.col("p") + F.col("q")
    jsd_term = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log2(2.0 * F.col("p") / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log2(2.0 * F.col("q") / m))
        .otherwise(F.lit(0.0))
    )
    contrib = terms.select(
        "source", "w", F.round(jsd_term, 9).cast(dec).alias("jsd_term")
    )
    # corpus words absent from a source: p = 0 ⇒ 0.5 * q * log2(2)
    present = sc.select("source", "w")
    all_pairs = st.select("source").crossJoin(F.broadcast(cc)).crossJoin(
        F.broadcast(ct)
    )
    missing = (
        all_pairs.join(present, ["source", "w"], "left_anti")
        .select(
            "source",
            "w",
            F.round(
                0.5
                * (F.col("c_all").cast("double") / F.col("n_all"))
                * F.log2(F.lit(2.0)),
                9,
            )
            .cast(dec)
            .alias("jsd_term"),
        )
    )
    return (
        contrib.unionByName(missing)
        .groupBy("source")
        .agg(
            F.sum("jsd_term").cast("double").alias("jsd_bits"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        
    )
