"""Hundred-thirty-sixth wave: write-audit-publish and embedding
whitening.

  * pipeline_write_audit_publish — the WAP pattern (stage → audit →
    atomic publish): a candidate snapshot of cleaned orders lands in a
    staging directory, a data-quality audit runs AGAINST THE STAGED
    FILES (row count, null keys, referential orphans, revenue
    reconciliation vs source), and only a fully-green audit flips the
    published pointer.  Readers resolve the pointer, never the staging
    path — so a failed audit leaves the previous publication intact.
    Output = the audit report + what the published pointer now serves.
  * sim_embedding_whitening — the retrieval post-processing step:
    per-dimension mean/std of the embedding matrix, plus exact decimal
    sums of the z-scored values certifying the whitening transform
    itself (sum_z ~ 0 and sumsq_z ~ n per dim, to the last snapped
    digit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm136")


@register(
    "pipeline_write_audit_publish",
    oracle="""
WITH staged AS (
  SELECT * FROM orders WHERE o_totalprice > 0 AND o_custkey IS NOT NULL
),
audit AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS null_keys,
         SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS orphans,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS staged_rev
  FROM staged LEFT JOIN customer c ON staged.o_custkey = c.c_custkey
),
src AS (
  SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
              AS DOUBLE) AS src_rev
  FROM orders WHERE o_totalprice > 0 AND o_custkey IS NOT NULL
)
SELECT a.n_rows AS staged_rows,
       CAST(a.null_keys AS BIGINT) AS null_keys,
       CAST(a.orphans AS BIGINT) AS orphans,
       CAST(a.null_keys = 0 AND a.orphans = 0
            AND a.staged_rev = s.src_rev AS BOOLEAN) AS audit_green,
       a.n_rows AS published_rows,
       a.staged_rev AS published_revenue
FROM audit a CROSS JOIN src s
""",
    description="Write-Audit-Publish: cleaned orders stage to an "
    "unpublished directory; the audit runs against the STAGED FILES "
    "(count, null keys, customer-orphan referential check, exact-decimal "
    "revenue reconciliation vs the source) and only a green audit CAS-"
    "writes the published pointer file — a red audit leaves the prior "
    "publication untouched (asserted in tests by auditing a corrupted "
    "candidate). The reader path resolves the pointer and reports what "
    "consumers actually see, so the oracle certifies the full stage → "
    "audit → publish → read cycle. This is the manifest-pointer "
    "machinery (operators/upsert.py) promoted to the quality-gated "
    "release flow production lakes run.",
    tags=("pipeline", "storage", "quality"),
)
def pipeline_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = f"{_ROOT}/wap_{sfx}"
    staging = f"{base}/staging"
    pointer = f"{base}/_PUBLISHED"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)

    staged_df = (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_totalprice") > 0) & F.col("o_custkey").isNotNull())
    )
    staged_df.write.mode("overwrite").parquet(staging)

    cust = t(spark, sf_dir, "customer").select("c_custkey")
    staged = spark.read.parquet(staging)
    audit_row = (
        staged.join(
            cust, staged.o_custkey == cust.c_custkey, "left"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("null_keys"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).alias("orphans"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("staged_rev"),
        )
        .collect()[0]  # audit verdict gates the publish side effect
    )
    src_rev = (
        staged_df.agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        ).collect()[0][0]
    )
    green = (
        audit_row.null_keys == 0
        and audit_row.orphans == 0
        and audit_row.staged_rev == src_rev
    )
    if green:
        tmp = pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(staging)
        os.replace(tmp, pointer)  # atomic publish

    with open(pointer) as fh:
        published_path = fh.read().strip()
    published = spark.read.parquet(published_path).agg(
        F.count(F.lit(1)).alias("published_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("published_revenue"),
    )
    return published.select(
        F.lit(audit_row.n_rows).cast("bigint").alias("staged_rows"),
        F.lit(audit_row.null_keys).cast("bigint").alias("null_keys"),
        F.lit(audit_row.orphans).cast("bigint").alias("orphans"),
        F.lit(bool(green)).alias("audit_green"),
        F.col("published_rows").cast("bigint").alias("published_rows"),
        "published_revenue",
    )


@register(
    "sim_embedding_whitening",
    oracle="""
WITH ev AS (
  SELECT vec_id, i.i AS dim, e.v[i.i] AS x
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) e,
       LATERAL (SELECT unnest(range(1, 65)) AS i) i
),
stats AS (
  SELECT dim,
         COUNT(*) AS n,
         CAST(round(AVG(x), 9) AS DECIMAL(18,9)) AS mu9,
         CAST(round(sqrt((SUM(x * x) - SUM(x) * SUM(x) / COUNT(*))
                         / (COUNT(*) - 1)), 9) AS DECIMAL(18,9)) AS sd9
  FROM ev GROUP BY dim
),
z AS (
  SELECT ev.dim,
         CAST(round((ev.x - CAST(CAST(s.mu9 AS VARCHAR) AS DOUBLE))
                    / CAST(CAST(s.sd9 AS VARCHAR) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS z6
  FROM ev JOIN stats s ON s.dim = ev.dim
)
SELECT z.dim,
       CAST(CAST(s.mu9 AS VARCHAR) AS DOUBLE) AS mean_dim,
       CAST(CAST(s.sd9 AS VARCHAR) AS DOUBLE) AS std_dim,
       CAST(CAST(SUM(z.z6) AS VARCHAR) AS DOUBLE) AS sum_z,
       CAST(CAST(SUM(z.z6 * z.z6) AS VARCHAR) AS DOUBLE) AS sumsq_z
FROM z JOIN stats s ON s.dim = z.dim
GROUP BY z.dim, s.mu9, s.sd9
ORDER BY z.dim
""",
    description="Embedding whitening (per-dimension standardization — "
    "the cheap retrieval-quality fix when dimensions have wildly "
    "different scales): per-dim mean and std from power sums snapped to "
    "9 dp, then every value z-scored against the snapped parameters and "
    "the z-scores themselves certified by exact decimal sums per dim "
    "(sum_z ~ 0, sumsq_z ~ n-1 scale — computed, not assumed). AVG(x) "
    "order drift is absorbed by the 9-dp snap; everything after is "
    "decimal-exact. Scale shape: one posexplode + one (dim) aggregate; "
    "the transform itself is a map-side expression against 64 broadcast "
    "parameters.",
    tags=("similarity", "stats"),
)
def sim_embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            ),
        )
        .select((F.col("pos") + 1).alias("dim"), "x")
    )
    stats = ev.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        "dim",
        F.round(F.col("sx") / F.col("n"), 9)
        .cast("decimal(18,9)")
        .alias("mu9"),
        F.round(
            F.sqrt(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
                / (F.col("n") - 1)
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("sd9"),
    )
    z = ev.join(F.broadcast(stats), "dim").select(
        "dim",
        "mu9",
        "sd9",
        F.round(
            (F.col("x") - F.col("mu9").cast("double"))
            / F.col("sd9").cast("double"),
            6,
        )
        .cast("decimal(18,6)")
        .alias("z6"),
    )
    return (
        z.groupBy("dim", "mu9", "sd9")
        .agg(
            F.sum("z6").cast("double").alias("sum_z"),
            F.sum(F.col("z6") * F.col("z6")).cast("double").alias("sumsq_z"),
        )
        .select(
            "dim",
            F.col("mu9").cast("double").alias("mean_dim"),
            F.col("sd9").cast("double").alias("std_dim"),
            "sum_z",
            "sumsq_z",
        )
        
    )
