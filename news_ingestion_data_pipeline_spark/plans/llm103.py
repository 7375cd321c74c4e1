"""Hundred-third wave: dead-letter replay and partition-spec evolution.

  * pipeline_dlq_replay — what actually happens to quarantined rows:
    wave 100 proved the corrupt lines land in the DLQ with their raw
    text; this wave REPLAYS them — apply the fix rules (strip the
    spurious trailing column, default the unparseable numeric),
    re-parse, and union with the clean rows — and proves full recovery:
    every original key is present exactly once, with the defaulted
    values accounted.  The replay touches only the (tiny) DLQ; the
    clean path is never reprocessed.
  * storage_partition_spec_evolution — the Iceberg spec-evolution
    story: a table starts partitioned by lang (gen1), later writes land
    under a finer (lang, source) spec (gen2), and readers must see ONE
    table across both layouts.  Hive-style partition discovery reads
    each generation; per-lang generation counts are observed from the
    actual file paths (_metadata) and oracle-pinned against the
    id-split rule — a reader that dropped either generation, or
    double-counted the overlap, hash-fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm103")


@register(
    "pipeline_dlq_replay",
    oracle="""
WITH cls AS (
  SELECT doc_id, lang, n_chars,
         (doc_id % 23 = 11) AS extra_col,
         (doc_id % 19 = 7 AND doc_id % 23 <> 11) AS bad_int
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN bad_int THEN 0 ELSE n_chars END) AS BIGINT)
         AS sum_chars,
       CAST(SUM(CASE WHEN extra_col OR bad_int THEN 1 ELSE 0 END) AS BIGINT)
         AS n_replayed,
       CAST(SUM(CASE WHEN bad_int THEN 1 ELSE 0 END) AS BIGINT)
         AS n_defaulted
FROM cls
GROUP BY lang
ORDER BY lang
""",
    description="Dead-letter-queue replay — the second half of the "
    "quarantine story (wave 100 routes corrupt CSV lines to the DLQ "
    "with their raw text): fix rules run ONLY over the quarantined "
    "lines (strip the spurious ',x' trailing column; default the "
    "unparseable numeric to 0), the repaired lines re-parse through "
    "the same schema, and the union with the untouched clean rows is "
    "proven complete — per-lang totals equal the source with exactly "
    "the defaulted cells differing, and replayed/defaulted counts are "
    "pinned. At 100 TB the replay cost is proportional to the DLQ "
    "(per-mille of the data), not the table — the clean path is never "
    "reprocessed.",
    tags=("pipeline", "scan"),
)
def pipeline_dlq_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/dlq_{sfx}"
    shutil.rmtree(path, ignore_errors=True)

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(","),
        F.col("lang"),
        F.lit(","),
        F.when(
            (F.col("doc_id") % 19 == 7) & (F.col("doc_id") % 23 != 11),
            F.lit("NA"),
        ).otherwise(F.col("n_chars").cast("string")),
        F.when(F.col("doc_id") % 23 == 11, F.lit(",x")).otherwise(F.lit("")),
    )
    d.select(line.alias("value")).write.text(path)

    parsed = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .localCheckpoint(eager=True)
    )
    clean = parsed.filter(F.col("_corrupt_record").isNull()).select(
        "doc_id", "lang", "n_chars", F.lit(False).alias("replayed"),
        F.lit(False).alias("defaulted"),
    )
    # fix rules over the RAW quarantined lines only
    raw = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw")
    )
    fixed = raw.select(
        F.regexp_replace(F.col("raw"), r",x$", "").alias("line")
    ).select(
        F.split("line", ",").alias("p")
    ).select(
        F.element_at("p", 1).cast("long").alias("doc_id"),
        F.element_at("p", 2).alias("lang"),
        F.when(F.element_at("p", 3) == "NA", F.lit(0))
        .otherwise(F.element_at("p", 3).cast("long"))
        .alias("n_chars"),
        F.lit(True).alias("replayed"),
        (F.element_at("p", 3) == "NA").alias("defaulted"),
    )
    full = clean.unionByName(fixed)
    return (
        full.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(F.col("replayed").cast("bigint"))
            .cast("bigint")
            .alias("n_replayed"),
            F.sum(F.col("defaulted").cast("bigint"))
            .cast("bigint")
            .alias("n_defaulted"),
        )
        
    )


@register(
    "storage_partition_spec_evolution",
    oracle="""
WITH split AS (
  SELECT doc_id, lang, source,
         (doc_id * 2 <= (SELECT MAX(doc_id) FROM documents)) AS gen1
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN gen1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gen1,
       CAST(SUM(CASE WHEN gen1 THEN 0 ELSE 1 END) AS BIGINT) AS n_gen2,
       CAST(COUNT(DISTINCT CASE WHEN NOT gen1 THEN source END) AS BIGINT)
         AS n_gen2_sources,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM split
GROUP BY lang
ORDER BY lang
""",
    description="Partition-spec evolution (the Iceberg story a "
    "Hive-layout table can't tell natively): generation 1 of the table "
    "is written partitioned by lang only; later writes land under the "
    "EVOLVED finer spec (lang, source); one logical table spans both "
    "layouts. The reader unions partition-discovered scans of each "
    "generation, recovering the partition columns from directory "
    "names; per-lang generation counts are observed from the ACTUAL "
    "file paths (_metadata.file_path containing 'source=' or not) and "
    "pinned against the id-split rule, with row fingerprints over the "
    "whole table. At 100 TB old data is never rewritten on a spec "
    "change — new partitions just get finer pruning.",
    tags=("storage", "scan"),
)
def storage_partition_spec_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    g1 = f"{_ROOT}/spec_g1_{sfx}"
    g2 = f"{_ROOT}/spec_g2_{sfx}"
    for p in (g1, g2):
        shutil.rmtree(p, ignore_errors=True)

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    gen1 = docs.filter(F.col("doc_id") * 2 <= mx)
    gen2 = docs.filter(F.col("doc_id") * 2 > mx)
    gen1.write.partitionBy("lang").parquet(g1)
    gen2.write.partitionBy("lang", "source").parquet(g2)

    r1 = spark.read.parquet(g1).withColumn(
        "from_gen2",
        F.col("_metadata.file_path").contains("source="),
    )
    r2 = spark.read.parquet(g2).withColumn(
        "from_gen2",
        F.col("_metadata.file_path").contains("source="),
    )
    merged = r1.unionByName(r2)
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum((~F.col("from_gen2")).cast("bigint"))
            .cast("bigint")
            .alias("n_gen1"),
            F.sum(F.col("from_gen2").cast("bigint"))
            .cast("bigint")
            .alias("n_gen2"),
            F.countDistinct(
                F.when(F.col("from_gen2"), F.col("source"))
            )
            .cast("bigint")
            .alias("n_gen2_sources"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        
    )
