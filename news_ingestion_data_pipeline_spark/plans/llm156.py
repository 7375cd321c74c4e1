"""Hundred-fifty-sixth wave: deterministic sampled integrity audit.

Full-table checksums (storage_table_checksum) are the gold standard
but cost a full scan per audited system; the production compromise is
a DETERMINISTIC sample audit — both systems independently select the
same ~1% of rows by hashing the key (no RNG, no coordination) and
compare checksums over just that slice.  A mismatch localizes
corruption to the sampled keys; the 99% unscanned rows cost nothing.

  * pipeline_sampled_integrity_audit — lineitem rows where
    md5(orderkey, linenumber) lands in the 1% bucket: sample size,
    order-pinned md5-of-row-md5s, and exact decimal sample revenue —
    the triplet two estates compare to certify replication without
    full scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "pipeline_sampled_integrity_audit",
    oracle="""
WITH sampled AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
         md5(l_orderkey || ':' || l_linenumber || ':' ||
             CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || ':' ||
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR))
           AS row_md5
  FROM lineitem
  WHERE CAST('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 4)
             AS BIGINT) % 100 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
       md5(string_agg(row_md5, ''
             ORDER BY l_orderkey, l_linenumber, row_md5)) AS sample_checksum,
       CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) AS sample_revenue
FROM sampled
""",
    description="Deterministic 1% integrity audit: rows self-select by "
    "key hash (md5(orderkey, linenumber) mod 100 == 0 — no RNG, no "
    "coordination, so two independent systems pick the IDENTICAL "
    "sample), each row collapses to an md5 over its audited fields "
    "(quantity as integer, price as exact decimal string), and the "
    "sample reports count + order-pinned checksum + exact decimal "
    "revenue. The replication-verification compromise production "
    "estates run nightly where full checksums "
    "(storage_table_checksum) are a per-system full scan: 1% of the "
    "I/O, corruption still localizes to sampled keys. One pushed-down "
    "filter + one aggregate.",
    tags=("pipeline", "quality", "storage"),
)
def pipeline_sampled_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    row_md5 = F.md5(
        F.concat_ws(
            ":",
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_quantity").cast("bigint").cast("string"),
            price.cast("string"),
        )
    )
    sampled = li.filter(bucket == 0).select(
        "l_orderkey",
        "l_linenumber",
        price.alias("price"),
        row_md5.alias("row_md5"),
    )
    return sampled.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "l_orderkey", "l_linenumber", "row_md5"
                            )
                        )
                    ),
                    lambda s: s["row_md5"],
                ),
                "",
            )
        ).alias("sample_checksum"),
        F.sum("price").cast("double").alias("sample_revenue"),
    )
