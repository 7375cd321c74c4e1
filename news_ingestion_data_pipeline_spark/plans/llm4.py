"""Fourth wave: incremental-corpus and graph operators — the
delta-vs-index LSH dedup a continuously-ingested training corpus runs,
distributed triangle counting over a co-presence graph, and a
sort-clustered (zone-map) layout whose scan skips row groups by min/max
stats — each with a DuckDB oracle.

Reference parity note: the reference (NeerajBassi/news_ingestion_data_pipeline)
has an incremental-ingest LOOP (watermark cutoff, §2.9) but no content
dedup at all; `dedup_incremental_minhash` is that incremental shape
applied to the near-dedup index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import dedup as DD
from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.registry import dsum, register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root


@register(
    "dedup_incremental_minhash",
    oracle=OSQL.minhash_incremental_oracle(num_hashes=32, bands=8),
    description="Incremental MinHash-LSH dedup — the production shape of "
    "continuous corpus ingestion: the corpus' band-entry table is the "
    "persistent LSH INDEX, and each new batch (here the deterministic "
    "30% slice doc_id % 10 < 3) signs only its own documents and "
    "equi-joins its band entries against index + batch, never "
    "index-vs-index (that work happened when those docs were ingested). "
    "Candidate volume is O(delta x bands) instead of O(corpus x bands) "
    "per run; the emitted `vs` column says whether a new doc duplicates "
    "the corpus ('index') or its own batch ('delta') — the routing "
    "decision an ingest pipeline acts on. Same 32-permutation/8-band "
    "construction (and generated oracle SQL) as dedup_minhash_candidates.",
    tags=("llm", "dedup", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    docs = spread(t(spark, sf_dir, "documents"))
    sigs = DD.minhash_signatures(docs, num_hashes=32).withColumn(
        "is_delta", (F.col("id") % 10) < 3
    )
    return DD.lsh_band_pairs_incremental(sigs, num_hashes=32, bands=8)


@register(
    "graph_triangle_count",
    oracle="""
WITH presence AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 600000000 AS bkt, user_id
  FROM events
), sized AS (
  SELECT event_type, bkt FROM presence
  GROUP BY event_type, bkt HAVING COUNT(*) <= 30
), p AS (
  SELECT presence.* FROM presence JOIN sized USING (event_type, bkt)
), edges AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM p a JOIN p b
    ON a.event_type = b.event_type AND a.bkt = b.bkt AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
  HAVING COUNT(*) >= 2
)
SELECT COUNT(*) AS n_triangles,
       (SELECT COUNT(*) FROM edges) AS n_edges
FROM edges e1
JOIN edges e2 ON e2.u = e1.v
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
""",
    description="Distributed triangle counting (the clustering-coefficient "
    "/ community-density primitive) over a co-presence graph: users are "
    "linked when they appear in the same (event_type, 10-minute) bucket "
    "at least twice. The construction carries two scale guards mirrored "
    "in the oracle: buckets capped at 30 members (df-style skew cap — no "
    "quadratic blowup from a hot bucket) and edges deduped before "
    "counting. Counting uses the oriented-edge identity: every triangle "
    "u<v<w is found exactly once by joining e(u,v)+e(v,w)+e(u,w) — "
    "ordinary equi-joins on edge endpoints, no BNLJ; at scale the edge "
    "table is range-partitioned by u and the two joins shuffle "
    "O(edges^1.5) in the worst case (the AGM bound), far below the "
    "unoriented 3x overcount join.",
    tags=("graph", "events"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 600000000").alias("bkt"),
        "user_id",
    )
    presence = ev.distinct()
    sized = (
        presence.groupBy("event_type", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= 30)
        .select("event_type", "bkt")
    )
    p = presence.join(sized, ["event_type", "bkt"])
    a, b = p.alias("a"), p.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("u", "v")
        .localCheckpoint()  # three consumers; truncate the 2-join lineage
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri.crossJoin(edges.agg(F.count(F.lit(1)).alias("n_edges")))


@register(
    "scan_zonemap_skip",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Sort-clustered layout + zone-map (row-group min/max) "
    "skipping: lineitem is rewritten range-partitioned AND sorted on "
    "l_shipdate, so every parquet row group covers a narrow date band; "
    "the date-range read then pushes its predicate to the scan "
    "(PushedFilters) and parquet statistics eliminate non-overlapping "
    "row groups before decoding a single page — the finer-grained "
    "sibling of Hive partition pruning, and the reason a 100 TB fact "
    "table is kept sorted on its dominant filter column. The oracle runs "
    "the same filter on the unsorted source, certifying the rewrite "
    "loses nothing; tests/test_storage.py asserts the pushed filters "
    "and that skipping actually reduced rows read.",
    tags=("scan", "storage", "pruning"),
)
def scan_zonemap_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    path = (
        scratch_root("storage") + "/lineitem_zonemap_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    (
        t(spark, sf_dir, "lineitem")
        .select("l_shipdate", "l_returnflag", "l_quantity")
        .repartitionByRange(8, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    li = spark.read.parquet(path).filter(
        (F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        
    )
