"""Twenty-eighth wave: rank statistics — cross-source quantile
normalization (the batch-effect remover), Spearman rank correlation
with tie-averaged ranks, and Kendall's tau on grouped aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "curation_quantile_normalize",
    oracle="""
WITH d AS (
  SELECT doc_id, source, n_chars FROM documents
), src AS (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS p
  FROM d
), g AS (
  SELECT n_chars AS gv,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS j,
         COUNT(*) OVER () AS n
  FROM d
), pos AS (
  SELECT doc_id, source, n_chars,
         p * ((SELECT MAX(n) FROM g) - 1) + 1 AS pos
  FROM src
), interp AS (
  SELECT doc_id, source, n_chars,
         CAST(floor(pos) AS BIGINT) AS lo,
         LEAST(CAST(floor(pos) AS BIGINT) + 1,
               (SELECT MAX(n) FROM g)) AS hi,
         pos - floor(pos) AS frac
  FROM pos
)
SELECT i.doc_id, i.source, CAST(i.n_chars AS BIGINT) AS n_chars,
       round(glo.gv + i.frac * (ghi.gv - glo.gv), 4) AS norm_chars
FROM interp i
JOIN g glo ON glo.j = i.lo
JOIN g ghi ON ghi.j = i.hi
ORDER BY doc_id
""",
    description="Quantile normalization across sources — the batch-"
    "effect remover from bioinformatics, used in corpus mixing to make "
    "per-source length/quality distributions comparable: each document's "
    "within-source percent_rank is mapped onto the GLOBAL n_chars "
    "distribution by linear interpolation between the two bracketing "
    "global order statistics (exactly percentile_cont of the corpus at "
    "the doc's source-relative quantile). After this transform every "
    "source has the same marginal distribution, so a length-based "
    "quality threshold cuts each source at equivalent quantiles instead "
    "of penalizing verbose sources. Shape: one partitioned window per "
    "source, one two-pass range-partitioned global rank (operators/"
    "ranking.py — n_chars-range buckets, per-bucket local rank + "
    "broadcast prefix offsets, no single-partition sort), two equi-"
    "joins against the order-statistic table. All arithmetic is IEEE-"
    "identical double ops on exact integer inputs — no order-dependent "
    "accumulation.",
    tags=("curation", "stats", "llm"),
)
def curation_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    src = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.percent_rank()
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("p"),
    )
    genv = d.agg(F.min("n_chars").alias("clo"), F.max("n_chars").alias("chi"))
    g = RK.distributed_row_number(
        d.crossJoin(F.broadcast(genv)),
        ["n_chars", "doc_id"],
        RK.range_bucket(F.col("n_chars"), F.col("clo"), F.col("chi")),
        out="j",
    ).select(F.col("n_chars").alias("gv"), "j")
    n = d.agg(F.count(F.lit(1)).alias("n"))
    pos = F.col("p") * (F.col("n") - 1) + 1
    interp = (
        src.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.floor(pos).cast("bigint").alias("lo"),
            F.least(F.floor(pos).cast("bigint") + 1, F.col("n")).alias("hi"),
            (pos - F.floor(pos)).alias("frac"),
        )
    )
    glo = g.select(F.col("j").alias("lo"), F.col("gv").alias("gv_lo"))
    ghi = g.select(F.col("j").alias("hi"), F.col("gv").alias("gv_hi"))
    return (
        interp.join(glo, "lo")
        .join(ghi, "hi")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(
                F.col("gv_lo") + F.col("frac") * (F.col("gv_hi") - F.col("gv_lo")),
                4,
            ).alias("norm_chars"),
        )
        
    )




@register(
    "agg_spearman_corr",
    oracle="""
WITH r AS (
  SELECT CAST(rank() OVER (ORDER BY l_quantity) AS DECIMAL(19,1))
           + (CAST(COUNT(*) OVER (PARTITION BY l_quantity) AS DECIMAL(19,1))
              - 1) / 2 AS rx,
         CAST(rank() OVER (ORDER BY l_extendedprice) AS DECIMAL(19,1))
           + (CAST(COUNT(*) OVER (PARTITION BY l_extendedprice)
                   AS DECIMAL(19,1)) - 1) / 2 AS ry
  FROM lineitem
), s AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(rx) AS DECIMAL(38,1)) AS sx,
         CAST(SUM(ry) AS DECIMAL(38,1)) AS sy,
         CAST(SUM(rx * ry) AS DECIMAL(38,2)) AS sxy,
         CAST(SUM(rx * rx) AS DECIMAL(38,2)) AS sxx,
         CAST(SUM(ry * ry) AS DECIMAL(38,2)) AS syy
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_rows,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS spearman_rho
FROM s
""",
    description="Spearman rank correlation between lineitem quantity and "
    "extended price: tie-averaged (fractional) ranks — rank() + "
    "(tie_count-1)/2, a .5-granular exact DECIMAL — then Pearson on the "
    "ranks from the five raw power sums, all in exact decimal "
    "arithmetic so the only doubles are the final subtract/sqrt/divide "
    "(associative-safe, partition-order-proof; same discipline as "
    "events_autocorrelation). Spearman is the monotone-association "
    "measure that survives outliers and nonlinearity where Pearson "
    "(agg_linreg_by_group) does not. Ranks come from the range-bucketed "
    "two-pass rank helper (operators/ranking.distributed_avg_rank), not "
    "a row sort: aggregate to per-value counts, per-bucket prefix sums "
    "plus broadcast bucket offsets, and join the rank map back — the "
    "full table is never globally sorted AND no single task ever holds "
    "the whole value vocabulary (the price vocabulary is row-count-"
    "sized; the plain histogram window funneled it through one task), "
    "the same rewrite as agg_percentile_ranks.",
    tags=("agg", "stats"),
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    # Rank maps through the bucketed two-pass helper: the price vocabulary
    # is ~row-count-sized at bench SF, and the plain histogram-window form
    # funneled it through ONE task (measured 5.5 s single-task stage in
    # the profile) — range-bucketed prefix sums rank it fully in parallel
    # with the identical .5-granular exact rank values (guide §2.5: the
    # single-partition window is the straggler).
    env = li.agg(
        F.min("l_quantity").alias("qlo"),
        F.max("l_quantity").alias("qhi"),
        F.min("l_extendedprice").alias("plo"),
        F.max("l_extendedprice").alias("phi"),
    )
    lie = li.crossJoin(F.broadcast(env))
    rq = RK.distributed_avg_rank(
        lie,
        "l_quantity",
        RK.range_bucket(F.col("l_quantity"), F.col("qlo"), F.col("qhi")),
        out="rank_l_quantity",
    )
    rp = RK.distributed_avg_rank(
        lie,
        "l_extendedprice",
        RK.range_bucket(F.col("l_extendedprice"), F.col("plo"), F.col("phi")),
        out="rank_l_extendedprice",
    )
    r = (
        li.join(F.broadcast(rq), "l_quantity")
        .join(rp, "l_extendedprice")
        .select(
            F.col("rank_l_quantity").alias("rx"),
            F.col("rank_l_extendedprice").alias("ry"),
        )
    )
    s = r.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("rx").cast("decimal(38,1)").alias("sx"),
        F.sum("ry").cast("decimal(38,1)").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("decimal(38,2)").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("decimal(38,2)").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("decimal(38,2)").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(num / F.sqrt(dx * dy), 6).alias("spearman_rho"),
    )


@register(
    "agg_kendall_tau",
    oracle="""
WITH b AS (
  SELECT p_brand,
         CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)))
                   AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
         CAST(SUM(p_size) AS DOUBLE) / COUNT(*) AS avg_size
  FROM part GROUP BY p_brand
), pairs AS (
  SELECT CASE WHEN (x.avg_price - y.avg_price) * (x.avg_size - y.avg_size) > 0
              THEN 1 ELSE 0 END AS conc,
         CASE WHEN (x.avg_price - y.avg_price) * (x.avg_size - y.avg_size) < 0
              THEN 1 ELSE 0 END AS disc
  FROM b x JOIN b y ON x.p_brand < y.p_brand
)
SELECT CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_groups,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(SUM(disc) AS BIGINT) AS discordant,
       round(CAST(SUM(conc) - SUM(disc) AS DOUBLE) / COUNT(*), 6) AS kendall_tau
FROM pairs
""",
    description="Kendall's tau-a between per-brand average retail price "
    "and average size: aggregate part to 25 brand rows (decimal-exact "
    "averages), then count concordant vs discordant pairs over the "
    "brand self-join — tau = (C - D) / total pairs. The O(g^2) pair "
    "enumeration is on the GROUPED domain (25 rows -> 300 pairs), never "
    "the raw table, which is the scale discipline for Kendall: reduce "
    "first, compare second (row-level tau at 100 TB needs the merge-"
    "sort inversion count — out of scope; group-level tau is what "
    "monitoring dashboards actually chart). Completes the association "
    "family: Pearson (agg_linreg_by_group), Spearman "
    "(agg_spearman_corr), Kendall (this).",
    tags=("agg", "stats"),
)
def agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(
            (
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
            (F.sum("p_size").cast("double") / F.count(F.lit(1))).alias("avg_size"),
        )
    )
    x, y = b.alias("x"), b.alias("y")
    prod = (F.col("x.avg_price") - F.col("y.avg_price")) * (
        F.col("x.avg_size") - F.col("y.avg_size")
    )
    pairs = x.join(y, F.col("x.p_brand") < F.col("y.p_brand")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
    )
    ng = b.agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
    return ng.crossJoin(
        pairs.agg(
            F.sum("conc").cast("bigint").alias("concordant"),
            F.sum("disc").cast("bigint").alias("discordant"),
            F.round(
                (F.sum("conc") - F.sum("disc")).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("kendall_tau"),
        )
    ).select("n_groups", "concordant", "discordant", "kendall_tau")
