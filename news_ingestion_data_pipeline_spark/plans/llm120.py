"""Hundred-twentieth wave: ViT patchification and bipartite co-purchase
projection.

  * multimodal_image_patches — the vision-transformer preprocessing
    stage: decode each image (REAL BMP codec) and tile it into
    non-overlapping 8×8 patches, one row per patch with integer pixel
    statistics.  The oracle replays every patch sum/min/max from the
    closed-form pixel formula, so one wrong pixel anywhere in the
    decode→tile chain fails the hash.
  * graph_bipartite_projection — customer–part co-purchase projection:
    the weighted one-mode graph over customers who bought >= 2 common
    parts, with hub parts (bought by > 20 customers) pruned BEFORE the
    pair join — the step that keeps bipartite projections from going
    quadratic on popular hubs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_N_IMG = 100
_PATCH = 8


@register(
    "multimodal_image_patches",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         64 + (doc_id % 3) * 8 AS h,
         64 + (doc_id % 4) * 8 AS w
  FROM documents WHERE doc_id < {_N_IMG}
), px AS (
  SELECT doc_id, h, w, unnest(range(0, h * w * 3)) AS p FROM d
), vals AS (
  SELECT doc_id,
         (p // 3) // w // {_PATCH} AS py,
         ((p // 3) % w) // {_PATCH} AS px,
         (3 * doc_id + (p % 3) + (p // 3)) % 256 AS v
  FROM px
)
SELECT doc_id AS media_id,
       CAST(py AS INT) AS py,
       CAST(px AS INT) AS px,
       CAST(SUM(v) AS BIGINT) AS psum,
       CAST(MIN(v) AS INT) AS pmin,
       CAST(MAX(v) AS INT) AS pmax
FROM vals
GROUP BY doc_id, py, px
ORDER BY media_id, py, px
""",
    description="ViT-style patchification through the REAL BMP codec: "
    f"decode, tile into non-overlapping {_PATCH}x{_PATCH} patches (dims "
    "are multiples of 8 by construction), one row per patch with integer "
    "sum/min/max over all channels — the patch-embedding precursor every "
    "vision-transformer data pipeline runs. The oracle regenerates every "
    "pixel from the closed-form formula (pixel = (3·doc + c + y·w + x) "
    "mod 256, flattened index p = (y·w + x)·3 + c) and re-aggregates per "
    "tile, so the full decode→tile→stat chain is certified bit-exact. "
    "Scale shape: decode and tiling never leave the Arrow batch; the "
    "shuffle carries 6 integers per patch.",
    tags=("multimodal",),
)
def multimodal_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_IMG)
    media = mm.synthesize_media_real(docs).repartition(8, "media_id")
    return mm.extract_patches(media, patch=_PATCH, decoder="real")


_HUB_CAP = 20
_MIN_SHARED = 2


@register(
    "graph_bipartite_projection",
    oracle=f"""
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
pruned AS (
  SELECT cust, part FROM cp
  WHERE part IN (
    SELECT part FROM cp GROUP BY part HAVING COUNT(*) <= {_HUB_CAP}
  )
)
SELECT a.cust AS cust_a, b.cust AS cust_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_parts
FROM pruned a JOIN pruned b
  ON a.part = b.part AND a.cust < b.cust
GROUP BY a.cust, b.cust
HAVING COUNT(*) >= {_MIN_SHARED}
ORDER BY cust_a, cust_b
""",
    description="Bipartite projection of the customer–part purchase graph "
    "onto customers: weighted edges between customers sharing >= "
    f"{_MIN_SHARED} distinct parts, with hub parts (> {_HUB_CAP} distinct "
    "buyers) pruned BEFORE the self-join — the pruning that keeps "
    "projections from going quadratic on popular items (a part bought by "
    "100k customers would alone emit 5e9 pairs). The co-purchase edge "
    "list feeds the recommendation / community siblings "
    "(graph_label_propagation, graph_link_prediction). Scale shape: one "
    "distinct pass, one counting aggregate for the hub filter, and a "
    "part-keyed equi-join whose fan-out is capped by construction.",
    tags=("graph", "join"),
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part")
        )
        .distinct()
    )
    small = (
        cp.groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_buyers"))
        .filter(F.col("n_buyers") <= _HUB_CAP)
        .select("part")
    )
    pruned = cp.join(small, "part").localCheckpoint()  # both join sides
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(
            b,
            (F.col("a.part") == F.col("b.part"))
            & (F.col("a.cust") < F.col("b.cust")),
        )
        .groupBy(F.col("a.cust").alias("cust_a"), F.col("b.cust").alias("cust_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_parts"))
        .filter(F.col("n_shared_parts") >= _MIN_SHARED)
        
    )
