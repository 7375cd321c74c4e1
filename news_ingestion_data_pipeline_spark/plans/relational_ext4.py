"""Fourth relational wave: exact multi-percentiles, deterministic nested
collection, and map-type scalar plumbing — analytics shapes the earlier
waves didn't cover, each with a bit-exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "agg_percentile_ranks",
    oracle="""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
)
SELECT l_returnflag,
       MAX(CASE WHEN rn = CAST(ceil(0.50 * cnt) AS BIGINT)
                THEN l_extendedprice END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.90 * cnt) AS BIGINT)
                THEN l_extendedprice END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT)
                THEN l_extendedprice END) AS p99,
       MAX(cnt) AS n_rows
FROM ranked
GROUP BY l_returnflag
""",
    description="Exact p50/p90/p99 per group via nearest-rank selection, "
    "computed with a two-pass histogram rank lookup instead of a per-group "
    "full sort: pass 1 hash-aggregates per-(group, range-bucket) counts "
    "(fully parallel, map-side partials — parallelism is NOT capped at "
    "#groups the way a partitionBy-window sort is), a tiny cumulative scan "
    "over the ~4k-bucket histogram locates the bucket holding each target "
    "rank, then pass 2 sorts ONLY the candidate buckets (~n/4096 rows "
    "each) to pick the exact k-th element. Nearest-rank semantics are "
    "engine-portable (native percentile primitives interpolate "
    "differently); equal values at the cut rank make in-bucket tie order "
    "irrelevant. At larger n the bucket count scales (or the lookup "
    "recurses into sub-histograms) so no task ever holds a full group.",
    tags=("agg", "stats"),
)
def agg_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = 4096
    g, v = "l_returnflag", "l_extendedprice"
    li = t(spark, sf_dir, "lineitem").select(g, v)
    stats = li.groupBy(g).agg(
        F.min(v).alias("mn"), F.max(v).alias("mx"), F.count(F.lit(1)).alias("cnt")
    )
    li2 = li.join(F.broadcast(stats), g)
    bucket = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(v) - F.col("mn")) / ((F.col("mx") - F.col("mn")) / B)),
                F.lit(B - 1),
            )
        )
        .cast("int")
    )
    hist = li2.groupBy(g, bucket.alias("b")).agg(F.count(F.lit(1)).alias("bc"))
    wcum = Window.partitionBy(g).orderBy("b")
    hist2 = (
        hist.withColumn("cum_end", F.sum("bc").over(wcum))
        .withColumn("cum_before", F.col("cum_end") - F.col("bc"))
    )
    targets = (
        stats.select(
            g,
            "cnt",
            F.explode(F.array(F.lit(0.50), F.lit(0.90), F.lit(0.99))).alias("p"),
        )
        .withColumn("k", F.ceil(F.col("p") * F.col("cnt")).cast("bigint"))
    )
    cand = (
        targets.join(hist2, g)
        .filter((F.col("cum_before") < F.col("k")) & (F.col("k") <= F.col("cum_end")))
        .select(g, "p", "k", "b", "cum_before")
    )
    # bcast-ok: cand is |groups| x 3 percentile target rows
    rows = li2.withColumn("b", bucket).join(F.broadcast(cand), [g, "b"])
    wrn = Window.partitionBy(g, "b", "p").orderBy(v)
    sel = (
        rows.withColumn("rn", F.row_number().over(wrn))
        .filter(F.col("rn") == F.col("k") - F.col("cum_before"))
        .select(g, "p", v)
    )
    out = sel.groupBy(g).agg(
        F.max(F.when(F.col("p") == 0.50, F.col(v))).alias("p50"),
        F.max(F.when(F.col("p") == 0.90, F.col(v))).alias("p90"),
        F.max(F.when(F.col("p") == 0.99, F.col(v))).alias("p99"),
    )
    return out.join(stats.select(g, F.col("cnt").alias("n_rows")), g)


@register(
    "agg_collect_sorted_lines",
    oracle="""
SELECT l_orderkey AS o_orderkey,
       array_to_string(
         list_sort(list(l_linenumber || ':'
                        || CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR))),
         ',') AS line_qtys,
       CAST(COUNT(*) AS INT) AS n_lines
FROM lineitem
WHERE l_orderkey % 997 = 0
GROUP BY l_orderkey
""",
    description="Nested-type collection with deterministic order: per-order "
    "line list assembled with collect_list + array_sort, serialized to one "
    "string. collect_list alone is partition-order-dependent — sorting the "
    "built array (sort key = the zero-padded linenumber prefix) restores "
    "determinism without a second shuffle. The modulo filter keeps the "
    "collected groups bounded (collect on an unfiltered 100 TB fact table "
    "would be a per-key memory bomb).",
    tags=("agg", "nested"),
)
def agg_collect_sorted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 997 == 0)
    # The fixture allows duplicate linenumbers per order, so the sort must
    # be over the full serialized entry (a total lexical order both engines
    # share), not the linenumber alone.
    entry = F.concat_ws(
        ":",
        F.col("l_linenumber").cast("string"),
        F.col("l_quantity").cast("decimal(18,2)").cast("string"),
    )
    return (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.array_sort(F.collect_list(entry)).alias("entries"),
            F.count(F.lit(1)).cast("int").alias("n_lines"),
        )
        .select(
            "o_orderkey",
            F.concat_ws(",", "entries").alias("line_qtys"),
            "n_lines",
        )
    )


@register(
    "scalar_map_suite",
    oracle="""
SELECT o_orderkey,
       o_orderpriority,
       CASE split_part(o_orderpriority, '-', 1)
         WHEN '1' THEN 100 WHEN '2' THEN 80 WHEN '3' THEN 50
         WHEN '4' THEN 20 ELSE 10 END AS priority_weight,
       CASE WHEN split_part(o_orderpriority, '-', 1) IN ('1','2','3','4')
            THEN TRUE ELSE FALSE END AS known_priority
FROM orders
WHERE o_orderkey % 101 = 0
""",
    description="Map-type scalar plumbing: a literal map<string,int> built "
    "with map_from_arrays, probed per row with element_at + coalesce "
    "default and contains-key. The map literal is a Catalyst constant — "
    "the lookup compiles into the project stage, equivalent to a CASE "
    "ladder (the oracle's form) but declared as data, not control flow.",
    tags=("scalar", "map"),
)
def scalar_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    weights = F.map_from_arrays(
        F.array(*[F.lit(k) for k in ("1", "2", "3", "4")]),
        F.array(*[F.lit(v) for v in (100, 80, 50, 20)]),
    )
    key = F.split(F.col("o_orderpriority"), "-")[0]
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.coalesce(F.element_at(weights, key), F.lit(10)).alias(
                "priority_weight"
            ),
            F.array_contains(F.map_keys(weights), key).alias("known_priority"),
        )
    )
