"""Hundred-fifth wave: native dynamic partition overwrite and the
null-skew outer-join split.

  * storage_dynamic_partition_overwrite — Spark's OWN partition-
    overwrite machinery (partitionOverwriteMode=dynamic), distinct
    from the repo's manifest engine: an overwrite batch containing
    only lang=en rows must replace exactly the en partition and leave
    every other partition's FILES byte-identical.  The rewritten flag
    is observed by diffing the per-partition file inventories across
    the commit and oracle-pinned to (lang = 'en').
  * join_null_skew_split — the outer-join scale trick: a join key
    that is mostly NULL (here: orders' optional promo code) hashes
    every null row to ONE reducer in a naive plan; since SQL NULLs
    never match anyway, the production plan splits null-key rows
    AROUND the join (map-side pass-through) and shuffles only the
    non-null minority, unioning after.  The query ships the split
    plan; the oracle is the plain outer join — identical answers,
    structurally skew-proof plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm105")


@register(
    "storage_dynamic_partition_overwrite",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       (lang = 'en') AS rewritten
FROM documents
GROUP BY lang
ORDER BY lang
""",
    description="Spark-native dynamic partition overwrite "
    "(partitionOverwriteMode=dynamic — the INSERT OVERWRITE semantics "
    "a Hive-layout warehouse runs on, distinct from this repo's "
    "manifest engine): the table is seeded partitioned by lang with "
    "version 'old'; an overwrite batch holding ONLY lang=en rows "
    "(version 'new') must replace exactly the en partition directory "
    "and leave every other partition's file inventory byte-identical. "
    "The rewritten flag is OBSERVED by diffing per-partition file "
    "sets across the commit — static overwrite mode (which would drop "
    "the other partitions) or a spurious rewrite hash-fails. Per-lang "
    "row fingerprints certify the merged content. At 100 TB this is "
    "the daily backfill primitive: the write cost is the touched "
    "partitions, never the table.",
    tags=("storage", "pipeline"),
)
def storage_dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob
    import hashlib
    import os
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/dyn_{sfx}"
    shutil.rmtree(path, ignore_errors=True)

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    v1 = docs.withColumn("version", F.lit("old"))
    v1.write.partitionBy("lang").parquet(path)

    def inventory():
        out = {}
        for d in glob.glob(f"{path}/lang=*"):
            lang = os.path.basename(d).split("=", 1)[1]
            out[lang] = {
                (f, os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d)
                if f.endswith(".parquet")
            }
        return out

    before = inventory()
    batch = (
        docs.filter(F.col("lang") == "en")
        .withColumn("version", F.lit("new"))
    )
    (
        batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang")
        .parquet(path)
    )
    after = inventory()
    rewritten = sorted(
        lang
        for lang in set(before) | set(after)
        if before.get(lang) != after.get(lang)
    )
    cur = spark.read.parquet(path)
    rewritten_lit = F.array(*[F.lit(x) for x in rewritten])
    return (
        cur.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum((F.col("version") == "new").cast("bigint"))
            .cast("bigint")
            .alias("n_new"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .withColumn("rewritten", F.array_contains(rewritten_lit, F.col("lang")))
        
    )


@register(
    "join_null_skew_split",
    oracle="""
WITH coded AS (
  SELECT o_orderkey, o_totalprice,
         CASE WHEN o_orderkey % 37 = 0
              THEN 'PROMO' || CAST(o_orderkey % 5 AS VARCHAR)
              ELSE NULL END AS promo_code
  FROM orders
), promos AS (
  SELECT DISTINCT 'PROMO' || CAST(r AS VARCHAR) AS promo_code,
         CAST(r AS BIGINT) * 5 AS discount_pct
  FROM (SELECT unnest(range(0, 5)) AS r)
)
SELECT coalesce(p.promo_code, 'none') AS promo_code,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN c.promo_code IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       CAST(MAX(p.discount_pct) AS BIGINT) AS discount_pct,
       CAST(CAST(SUM(CAST(c.o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM coded c LEFT JOIN promos p ON c.promo_code = p.promo_code
GROUP BY coalesce(p.promo_code, 'none')
ORDER BY promo_code
""",
    description="Null-skew outer-join split — the scale trick for a "
    "join key that is mostly NULL (97% of orders carry no promo "
    "code): SQL NULLs never match, yet a naive left join still "
    "shuffles every null row (to one reducer under hash partitioning "
    "— THE classic skew death). The shipped plan splits null-key rows "
    "around the join entirely (a map-side pass-through with null-"
    "typed dim columns) and joins only the non-null 3%, unioning "
    "after; the oracle is the plain outer join — identical answer, "
    "structurally skew-proof plan. The discount dim is broadcast; at "
    "100 TB the shuffle carries 3% of the table and no reducer ever "
    "sees the null mass.",
    tags=("join", "skew"),
)
def join_null_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    coded = o.withColumn(
        "promo_code",
        F.when(
            F.col("o_orderkey") % 37 == 0,
            F.concat(F.lit("PROMO"), (F.col("o_orderkey") % 5).cast("string")),
        ),
    )
    promos = spark.range(5).select(
        F.concat(F.lit("PROMO"), F.col("id").cast("string")).alias(
            "promo_code"
        ),
        (F.col("id") * 5).cast("bigint").alias("discount_pct"),
    )
    # split: null keys NEVER enter the join
    nulls = coded.filter(F.col("promo_code").isNull()).select(
        "o_orderkey",
        "o_totalprice",
        F.col("promo_code"),
        F.lit(None).cast("bigint").alias("discount_pct"),
        F.lit(None).cast("string").alias("matched_code"),
    )
    nonnull = (
        coded.filter(F.col("promo_code").isNotNull())
        .join(F.broadcast(promos), "promo_code", "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            "promo_code",
            "discount_pct",
            F.col("promo_code").alias("matched_code"),
        )
    )
    unioned = nulls.unionByName(nonnull)
    return (
        unioned.groupBy(
            F.coalesce(F.col("matched_code"), F.lit("none")).alias(
                "promo_code"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("matched_code").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_unmatched"),
            F.max("discount_pct").cast("bigint").alias("discount_pct"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        
    )
