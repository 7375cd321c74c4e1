"""Twenty-third wave: mergeable sketch aggregates — a KMV (K-minimum-
values) distinct-count estimator and a Count-Min heavy-hitter sketch,
both built from deterministic md5 arithmetic so the *exact same sketch*
is recomputable in the DuckDB oracle (no epsilon hand-waving: the
estimate itself hash-matches).

Sketches are the 100 TB answer to "how many distinct / who is heavy"
when the exact answer needs an unbounded shuffle: a KMV sketch is k
numbers per partition (mergeable by min-merge), a CMS is a d×w counter
grid (mergeable by cell-wise add), so both reduce to map-side partial
aggregation + an O(k·partitions) driver-side merge instead of a full
repartition on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# h(key) = first 15 md5 hex chars as a big integer — uniform on
# [0, 16^15); dividing by 16^15 gives a deterministic uniform (0,1)
# hash both engines compute bit-identically.
_HEX_DEN = float(16**15)  # 2^60


def _h01(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(_HEX_DEN)
    )


def _sql_h01(expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"
        f" / {_HEX_DEN!r}"
    )


_KMV_K = 64


@register(
    "agg_kmv_distinct",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), hashed AS (
  SELECT {_sql_h01('k')} AS h FROM keys
), kth AS (
  SELECT h AS h_k, ROW_NUMBER() OVER (ORDER BY h) AS rn,
         COUNT(*) OVER () AS n_seen
  FROM hashed
  QUALIFY rn = LEAST({_KMV_K}, n_seen)
)
SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS exact_distinct,
       round(CASE WHEN n_seen < {_KMV_K}
                  THEN CAST(n_seen AS DOUBLE)
                  ELSE ({_KMV_K} - 1) / h_k END, 4) AS kmv_estimate,
       round(abs(CASE WHEN n_seen < {_KMV_K}
                      THEN CAST(n_seen AS DOUBLE)
                      ELSE ({_KMV_K} - 1) / h_k END
                 - (SELECT COUNT(*) FROM keys))
             / (SELECT COUNT(*) FROM keys), 4) AS rel_error
FROM kth
""",
    description="KMV (K-minimum-values / bottom-k) distinct-count sketch "
    f"over orders.o_custkey with k={_KMV_K}: hash every key to a uniform "
    "(0,1) value via md5, keep only the k smallest hashes, and estimate "
    "|D| = (k-1)/h_(k) from the kth order statistic — the estimator from "
    "Bar-Yossef et al. (2002). The hash is seedless md5 arithmetic, so "
    "the DuckDB oracle recomputes the *identical* sketch and the estimate "
    "itself hash-matches (stronger than an epsilon-bound check). Physical "
    "shape: orderBy(h).limit(k) compiles to TakeOrderedAndProject — every "
    "partition keeps only its local bottom-k, the driver merges k·P "
    "numbers, no full shuffle of the key column; at 100 TB the sketch is "
    "also unionable across days by min-merging two bottom-k sets. Exact "
    "count kept alongside as the verification baseline (at scale you'd "
    "drop it — it is the expensive thing the sketch replaces).",
    tags=("agg", "sketch", "approx"),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = t(spark, sf_dir, "orders").select("o_custkey").distinct()
    hashed = keys.select(_h01(F.col("o_custkey")).alias("h"))
    # Bottom-k via TakeOrderedAndProject (per-partition top-k, no shuffle
    # of the full key set), then the kth smallest = max of the k kept.
    kth = (
        hashed.orderBy("h")
        .limit(_KMV_K)
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("n_seen"))
    )
    exact = keys.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    est = F.when(
        F.col("n_seen") < _KMV_K, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1)) / F.col("h_k"))
    return (
        exact.crossJoin(kth)
        .select(
            "exact_distinct",
            F.round(est, 4).alias("kmv_estimate"),
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_error"),
        )
    )


_CMS_D = 3  # depth (independent hash rows)
_CMS_W = 128  # width (buckets per row)
_CMS_TOPN = 10


def _cms_bucket(seed: int, col):
    # One md5 per key serves all d rows: row r reads its own disjoint
    # 8-hex-char (32-bit) slice of the digest — pairwise-independent
    # enough for CMS and 3x cheaper than d digests per element.
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cms:"), col.cast("string"))),
                        1 + 8 * seed, 8),
            16,
            10,
        )
        .cast("long")
        % _CMS_W
    )


def _sql_cms_bucket(seed: int, expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5('cms:' || CAST({expr} AS VARCHAR)), "
        f"{1 + 8 * seed}, 8) AS BIGINT) % {_CMS_W}"
    )


@register(
    "agg_countmin_heavy_hitters",
    oracle=f"""
WITH cells AS (
  SELECT s.seed,
         CASE s.seed
           WHEN 0 THEN {_sql_cms_bucket(0, 'l_suppkey')}
           WHEN 1 THEN {_sql_cms_bucket(1, 'l_suppkey')}
           ELSE {_sql_cms_bucket(2, 'l_suppkey')} END AS bucket,
         COUNT(*) AS cell_cnt
  FROM lineitem CROSS JOIN (VALUES (0), (1), (2)) AS s(seed)
  GROUP BY 1, 2
), exact AS (
  SELECT l_suppkey, COUNT(*) AS exact_cnt
  FROM lineitem GROUP BY l_suppkey
  ORDER BY exact_cnt DESC, l_suppkey LIMIT {_CMS_TOPN}
), probes AS (
  SELECT e.l_suppkey, e.exact_cnt, s.seed,
         CASE s.seed
           WHEN 0 THEN {_sql_cms_bucket(0, 'e.l_suppkey')}
           WHEN 1 THEN {_sql_cms_bucket(1, 'e.l_suppkey')}
           ELSE {_sql_cms_bucket(2, 'e.l_suppkey')} END AS bucket
  FROM exact e CROSS JOIN (VALUES (0), (1), (2)) AS s(seed)
)
SELECT p.l_suppkey, p.exact_cnt,
       CAST(MIN(c.cell_cnt) AS BIGINT) AS cms_estimate,
       CAST(MIN(c.cell_cnt) - p.exact_cnt AS BIGINT) AS overcount
FROM probes p JOIN cells c ON c.seed = p.seed AND c.bucket = p.bucket
GROUP BY p.l_suppkey, p.exact_cnt
ORDER BY p.exact_cnt DESC, p.l_suppkey
""",
    description=f"Count-Min sketch (depth {_CMS_D} × width {_CMS_W}, "
    "seedless md5 row-hashes) over lineitem.l_suppkey, probed at the top-"
    f"{_CMS_TOPN} exact heavy hitters: estimate(key) = min over rows of "
    "the key's bucket counter, which upper-bounds the true count "
    "(overcount >= 0 always — Cormode & Muthukrishnan 2005). The grid is "
    f"{_CMS_D}×{_CMS_W} = {_CMS_D * _CMS_W} counters regardless of "
    "cardinality, built in ONE pass with map-side partial aggregation "
    "(explode to 3 seed rows, groupBy (seed, bucket) — the shuffle "
    "carries at most 384 groups per partition, not the key domain), and "
    "cell-wise addable across days/shards. The exact top-N pass exists "
    "only as the verification baseline and probe set; at 100 TB the probe "
    "set would come from the sketch's own candidate stream. Both engines "
    "recompute identical buckets from the md5 arithmetic, so estimates "
    "hash-match exactly.",
    tags=("agg", "sketch", "approx"),
)
def agg_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread BEFORE the md5/conv sketch hashing: the single-row-group
    # fixture scans as ~3 tasks and the 600k-row×3-seed digest+conv
    # chain was serialized there (profiled: one 3-task stage = the whole
    # query); the round-robin moves only l_suppkey ints. No-op on a
    # well-laid-out table.
    li = spread(t(spark, sf_dir, "lineitem").select("l_suppkey"))
    seeds = F.array([F.lit(s) for s in range(_CMS_D)])
    # md5 ONCE per element (before the seed explode); each sketch row
    # reads its own 32-bit slice of the shared digest.
    dig = F.md5(F.concat(F.lit("cms:"), F.col("l_suppkey").cast("string")))
    cells = (
        li.select(dig.alias("dig"))
        .select(F.col("dig"), F.explode(seeds).alias("seed"))
        .groupBy(
            "seed",
            (
                F.conv(
                    F.col("dig").substr(
                        F.lit(1) + F.col("seed") * 8, F.lit(8)
                    ),
                    16,
                    10,
                ).cast("long")
                % _CMS_W
            ).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    exact = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), "l_suppkey")
        .limit(_CMS_TOPN)
    )
    probes = exact.select(
        "l_suppkey", "exact_cnt", F.explode(seeds).alias("seed")
    ).withColumn(
        "bucket",
        F.when(F.col("seed") == 0, _cms_bucket(0, F.col("l_suppkey")))
        .when(F.col("seed") == 1, _cms_bucket(1, F.col("l_suppkey")))
        .otherwise(_cms_bucket(2, F.col("l_suppkey"))),
    )
    # 384-cell grid is broadcast-sized by construction.
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("l_suppkey", "exact_cnt")
        .agg(
            F.min("cell_cnt").cast("bigint").alias("cms_estimate"),
            (F.min("cell_cnt") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
        
    )
