"""Fifth wave: the incremental-pipeline endgame — snapshot time travel
over the manifest-commit table, a streaming foreachBatch upsert sink
(the reference's watermark-loop-plus-upsert made streaming-native),
runtime (dynamic) partition pruning, and a Python UDTF — each with a
DuckDB oracle.

Reference parity note: the reference's core loop is incremental fetch →
keyed upsert (ingestion.ipynb cell 3 + database_utils/database_methods.py:68-107);
`stream_foreachbatch_upsert` is that loop on Structured Streaming
micro-batches, and `pipeline_upsert_timetravel` exposes the version
history the manifest protocol already retains.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t, ts_str
from news_ingestion_data_pipeline_spark.tables import local_df
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm5")


def _sfx(sf_dir: str) -> str:
    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "pipeline_upsert_timetravel",
    oracle="""
WITH v1 AS (
  SELECT doc_id FROM documents WHERE doc_id % 3 != 0
), updates AS (
  SELECT doc_id FROM documents WHERE doc_id % 2 = 0
), cur AS (
  SELECT doc_id, 'new' AS version FROM updates
  UNION ALL
  SELECT doc_id, 'old' AS version FROM v1
  WHERE doc_id NOT IN (SELECT doc_id FROM updates)
)
SELECT 'current' AS snapshot, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN version = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM cur
UNION ALL
SELECT 'previous' AS snapshot, COUNT(*) AS n_rows,
       CAST(0 AS BIGINT) AS n_new,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM v1
ORDER BY snapshot
""",
    description="Snapshot time travel (VERSION AS OF - 1) over the "
    "manifest-commit upsert table: two MERGEs build two immutable "
    "snapshots; the commit protocol's GC deliberately retains the "
    "predecessor alongside the current pointer (operators/upsert.py), so "
    "the previous version stays readable — the miniature of Delta/"
    "Iceberg time travel that incremental pipelines use for audits and "
    "rollback. The query reads BOTH versions through the manifest and "
    "emits integer-exact fingerprints of each; the oracle reconstructs "
    "both states relationally, certifying that snapshot N-1 is exactly "
    "the pre-merge table (isolation: the second MERGE mutated nothing "
    "in place).",
    tags=("pipeline", "storage", "upsert"),
)
def pipeline_upsert_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = f"{_ROOT}/timetravel_{_sfx(sf_dir)}"
    UP.drop_table(path)
    docs = t(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("Article_id"), F.lit("old").alias("version")
    )
    updates = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("Article_id"), F.lit("new").alias("version")
    )
    UP.upsert_articles(spark, path, v1)
    UP.upsert_articles(spark, path, updates)

    def fingerprint(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("snapshot"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("version") == "new").cast("long")).alias("n_new"),
            F.sum("Article_id").alias("sum_ids"),
        ).select("snapshot", "n_rows", "n_new", "sum_ids")

    cur = UP.read_articles(spark, path)
    prev = UP.read_previous_snapshot(spark, path)
    return fingerprint(cur, "current").unionByName(
        fingerprint(prev, "previous")
    )


@register(
    "stream_foreachbatch_upsert",
    oracle="""
SELECT user_id, event_id AS last_event_id,
       event_type AS last_event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
FROM (
  SELECT user_id, event_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
    description="Streaming foreachBatch MERGE sink — the reference's "
    "incremental loop (watermark fetch -> keyed upsert, "
    "database_utils/database_methods.py:68-107) as Structured Streaming: "
    "the events corpus is re-laid as four files, streamed one file per "
    "micro-batch (maxFilesPerTrigger=1 under AvailableNow), and each "
    "batch MERGEs its per-user latest row into the manifest-commit "
    "table with LATEST-WINS-BY-(ts, event_id) semantics — so the final "
    "table is identical no matter how rows split across batches (the "
    "conditional-merge upgrade over blind update-wins that out-of-order "
    "ingestion at scale requires). The drained table hash-matches the "
    "batch latest-row-per-user oracle: end-to-end exactly-once-ish over "
    "four real commits.",
    tags=("streaming", "pipeline", "upsert"),
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    sfx = _sfx(sf_dir)
    src = f"{_ROOT}/events_4files_{sfx}"
    table = f"{_ROOT}/latest_by_user_{sfx}"
    UP.drop_table(table)

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    ev.repartition(4).write.mode("overwrite").parquet(src)

    def upsert_batch(batch: DataFrame, _batch_id: int) -> None:
        latest = (
            batch.groupBy("user_id")
            .agg(F.max(F.struct("ts_us", "event_id", "event_type")).alias("m"))
            .select(
                F.col("user_id").alias("Article_id"),
                F.col("m.ts_us").alias("ts_us"),
                F.col("m.event_id").alias("event_id"),
                F.col("m.event_type").alias("event_type"),
            )
        )
        target = UP.read_articles(batch.sparkSession, table)
        if target is not None:
            # latest-wins conditional merge: re-rank union by (ts, id)
            latest = (
                target.unionByName(latest)
                .groupBy("Article_id")
                .agg(F.max(F.struct("ts_us", "event_id", "event_type")).alias("m"))
                .select(
                    "Article_id",
                    F.col("m.ts_us").alias("ts_us"),
                    F.col("m.event_id").alias("event_id"),
                    F.col("m.event_type").alias("event_type"),
                )
            )
        UP.upsert_articles(batch.sparkSession, table, latest)

    name = f"stream_febu_{sfx}"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    q = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, ts_us long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(upsert_batch)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return UP.read_articles(spark, table).select(
        F.col("Article_id").alias("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        ts_str(F.timestamp_micros(F.col("ts_us"))).alias("last_ts"),
    )


@register(
    "join_dpp_runtime_pruned",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
ORDER BY event_type
""",
    description="Dynamic (runtime) partition pruning: the fact side is a "
    "partitionBy(event_type) layout, the dim side is a tiny "
    "category-mapping table filtered at runtime — the partition filter "
    "is NOT known at planning time (it depends on which event_types the "
    "filtered dim yields), so Spark injects a "
    "dynamicpruningexpression subquery that broadcasts the dim first "
    "and prunes fact partitions before the scan. The sibling of "
    "scan_partition_pruned for the join-shaped case every star-schema "
    "query at 100 TB hits: fact partitions on date/category, dim filter "
    "decides which partitions exist in the plan. A test asserts the "
    "pruning expression is present in the physical plan.",
    tags=("join", "storage", "pruning"),
)
def join_dpp_runtime_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{_ROOT}/events_by_type_dpp_{_sfx(sf_dir)}"
    (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(path)
    )
    dim = local_df(
        spark,
        [
            ("view", "engagement"),
            ("click", "engagement"),
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("error", "ops"),
        ],
        "event_type string, category string",
    )
    fact = spark.read.parquet(path)
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("category") == "conversion")),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        
    )


@register(
    "sql_udtf_split",
    oracle=r"""
WITH arr AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\s+'), _t -> _t <> '') AS l
  FROM documents WHERE length(trim(text)) > 0
), w AS (
  SELECT doc_id, unnest(l) AS word, generate_subscripts(l, 1) - 1 AS pos
  FROM arr
)
SELECT word, COUNT(*) AS n_occurrences,
       CAST(SUM(pos) AS BIGINT) AS sum_pos
FROM w GROUP BY word
ORDER BY n_occurrences DESC, word
LIMIT 20
""",
    description="Python UDTF (user-defined TABLE function, Spark 4 API "
    "surface): a tokenizer that yields one (word, pos) row per token, "
    "invoked through SQL's LATERAL table-function join. This is "
    "deliberately the SLOW path — a row-at-a-time Python generator — "
    "registered to cover the API; the plan-equivalent fast path is the "
    "codegen'd explode(split(...)) used by every text_* query (see "
    "text_token_stats). The oracle recomputes the same tokenization "
    "relationally, proving the UDTF's emitted table (positions "
    "included) is exactly the declarative result.",
    tags=("sql", "udtf", "text"),
)
def sql_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            if text is None or not text.strip():
                return
            for i, w in enumerate(text.split()):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    t(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
SELECT s.word, COUNT(*) AS n_occurrences, SUM(s.pos) AS sum_pos
FROM docs_udtf d, LATERAL split_words(d.text) s
GROUP BY s.word
ORDER BY n_occurrences DESC, word
LIMIT 20
"""
    )
