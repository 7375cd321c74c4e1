"""Hundred-twelfth wave: cross-video frame dedup and PQ codebook
training.

  * multimodal_frame_containment_dedup — video near-dup detection by
    shared frame fingerprints: sample frames from every framepack
    container, md5 the decoded frame bytes, and emit video PAIRS that
    share >= 2 identical frames.  The video analog of containment
    text-dedup: a re-encoded / re-cut upload shares most frames with
    its source even when container bytes differ entirely.
  * sim_pq_train_codebooks — the training half of the PQ index
    (sim_pq_adc_topk consumes such codebooks): split the 64-d space
    into 4 subspaces, seed 16 centroids per subspace (vec_id < 16,
    RNG-free), one Lloyd assignment step per subspace.  Output is the
    exact integer partition certificate (count + id-sum per cell),
    same contract as sim_kmeans_assign.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_FRAME_BASE = """WITH d AS (
  SELECT doc_id, (doc_id % 6) * 500 + 1000 AS duration_ms
  FROM documents ORDER BY doc_id LIMIT 200
), fr AS (
  SELECT doc_id, unnest(range(0, duration_ms // 500)) AS f FROM d
), fb AS (
  SELECT doc_id, f, unnest(range(0, 192)) AS k FROM fr
), hx AS (
  SELECT doc_id, f, k,
    printf('%02x',
      (3 * doc_id + 17 * f + (k % 3) + (k // 24) * 16 + ((k % 24) // 3)) % 256)
      AS hex2
  FROM fb
), frames AS (
  SELECT doc_id AS media_id, CAST(f AS INT) AS frame_no,
         md5(string_agg(hex2, '' ORDER BY k)) AS frame_md5
  FROM hx GROUP BY doc_id, f
)"""


@register(
    "multimodal_frame_containment_dedup",
    oracle=f"""{_FRAME_BASE}
SELECT a.media_id AS media_a, b.media_id AS media_b,
       CAST(COUNT(DISTINCT a.frame_md5) AS BIGINT) AS n_shared_frames
FROM frames a JOIN frames b
  ON a.frame_md5 = b.frame_md5 AND a.media_id < b.media_id
GROUP BY a.media_id, b.media_id
HAVING COUNT(DISTINCT a.frame_md5) >= 2
ORDER BY media_a, media_b
""",
    description="Cross-video duplicate detection by shared frame "
    "fingerprints: decode-sample frames from each framepack container "
    "(REAL BMP codec path, 500 ms stride), md5 each frame's pixel bytes, "
    "equi-join videos on the fingerprint, keep pairs sharing >= 2 "
    "distinct frames. The synthetic corpus collides by construction "
    "(pixel base 3*doc+17*frame wraps mod 256), which the oracle replays "
    "from the closed-form pixel formula. Scale shape: the only shuffle "
    "after the decode stage carries (16-byte hash, media_id) — the "
    "equi-join on the hash is the banded-LSH pattern with an exact band, "
    "and frame payloads never leave the decode executors.",
    tags=("multimodal", "dedup"),
)
def multimodal_frame_containment_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = spread(t(spark, sf_dir, "documents")).orderBy("doc_id").limit(200)
    media = mm.synthesize_media_real(docs, kind="video").repartition(
        8, "media_id"
    )
    frames = mm.sample_frames(media, every_ms=500, decoder="real").select(
        "media_id", F.md5(F.lower(F.hex("frame_payload"))).alias("frame_md5")
    )
    a, b = frames.alias("a"), frames.alias("b")
    return (
        a.join(
            b,
            (F.col("a.frame_md5") == F.col("b.frame_md5"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.countDistinct("a.frame_md5").alias("n_shared_frames"))
        .filter(F.col("n_shared_frames") >= 2)
        
    )


_M_SUB = 4
_SUB_DIM = 16
_K_CENT = 16


def _pq_sqdist_sql(sub: int) -> str:
    # left-associative sum over this subspace's dims, matching Spark's fold
    lo = sub * _SUB_DIM
    return " + ".join(
        f"(e.v[{lo + i}] - c.v[{lo + i}]) * (e.v[{lo + i}] - c.v[{lo + i}])"
        for i in range(1, _SUB_DIM + 1)
    )


def _pq_oracle() -> str:
    blocks = []
    for s in range(_M_SUB):
        blocks.append(f"""
  SELECT {s} AS subspace, e.vec_id, c.vec_id AS cent_id,
         {_pq_sqdist_sql(s)} AS d
  FROM e CROSS JOIN cent c""")
    union = "\n  UNION ALL".join(blocks)
    return f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id, v FROM e WHERE vec_id < {_K_CENT}),
dists AS ({union}
),
assigned AS (
  SELECT subspace, vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY subspace, vec_id
                            ORDER BY d, cent_id) AS rn
  FROM dists
)
SELECT subspace, cent_id,
       CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM assigned WHERE rn = 1
GROUP BY subspace, cent_id
ORDER BY subspace, cent_id
"""


@register(
    "sim_pq_train_codebooks",
    oracle=_pq_oracle(),
    description="Product-quantization codebook training (the index-build "
    "half of sim_pq_adc_topk): the 64-d embedding space split into 4 "
    "contiguous 16-d subspaces, 16 seeded centroids per subspace "
    "(vec_id < 16, RNG-free), one Lloyd assignment step per subspace — "
    "squared-L2 over the subvector via a left-associative fold with "
    "engine-identical IEEE order, argmin by total (distance, id) order. "
    "Output is the integer partition certificate (count + id-sum per "
    "(subspace, centroid) cell), so the oracle verifies every one of the "
    "4x500 assignments exactly. Scale shape: all m codebooks train in ONE "
    "pass — broadcast k*m centroids, map-side argmin per subspace, a "
    "k*m-row aggregate; vectors are never shuffled.",
    tags=("similarity", "iterative"),
)
def sim_pq_train_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("vec_id") < _K_CENT).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    crossed = e.crossJoin(F.broadcast(cent))
    per_sub = []
    for s in range(_M_SUB):
        sub_e = F.slice("v", s * _SUB_DIM + 1, _SUB_DIM)
        sub_c = F.slice("cv", s * _SUB_DIM + 1, _SUB_DIM)
        d = F.aggregate(
            F.zip_with(sub_e, sub_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        per_sub.append(
            crossed.select(
                F.lit(s).alias("subspace"), "vec_id", "cent_id", d.alias("d")
            )
        )
    dists = per_sub[0]
    for df in per_sub[1:]:
        dists = dists.unionByName(df)
    best = dists.groupBy("subspace", "vec_id").agg(
        F.min(F.struct("d", "cent_id")).alias("m")
    )
    return (
        best.select("subspace", "vec_id", F.col("m.cent_id").alias("cent_id"))
        .groupBy("subspace", "cent_id")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        
    )
