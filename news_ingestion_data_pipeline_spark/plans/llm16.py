"""Sixteenth wave: Holt double-exponential forecasting (coupled
level+trend state as a bit-exact struct fold) and perceptual-hash
image clustering (visual exact-dup detection over the real decode
path) — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_A = "0.3"  # level smoothing
_OMA = "0.7"  # 1 - _A, spelled explicitly: the decimal literal and the
# Python float must denote the SAME double (1 - 0.3 in IEEE is one ulp
# off from double(0.7))
_G = "0.1"  # trend smoothing
_OMG = "0.9"  # 1 - _G, same reasoning
_N_TAIL = 30


@register(
    "events_holt_forecast",
    oracle=f"""
WITH ordered AS (
  SELECT event_type,
         list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY event_type
), tail AS (
  SELECT event_type,
         len(vals) AS n_total,
         vals[greatest(len(vals) - {_N_TAIL} + 1, 1):len(vals)] AS xs
  FROM ordered
), folded AS (
  SELECT event_type, n_total, len(xs) AS n_points,
    list_reduce(
      list_prepend([xs[1], CAST(0.0 AS DOUBLE)],
        list_transform(xs[2:len(xs)], x -> [x, CAST(0.0 AS DOUBLE)])),
      (acc, x) -> [
        {_A} * x[1] + {_OMA} * (acc[1] + acc[2]),
        {_G} * (({_A} * x[1] + {_OMA} * (acc[1] + acc[2])) - acc[1])
          + {_OMG} * acc[2]
      ]) AS st
  FROM tail
)
SELECT event_type, n_points,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[1] + st[2], 6) AS forecast_next
FROM folded
ORDER BY event_type
""",
    description="Holt double-exponential smoothing (level + trend) over "
    "each type's trailing 30 values, forecasting one step ahead — the "
    "trend-aware upgrade of the EWMA: the coupled recurrence "
    "l' = a*x + (1-a)(l+b), b' = g*(l'-l) + (1-g)*b runs as ONE left "
    "fold whose accumulator is a two-element DOUBLE array seeded [x1, 0] (array state, not struct: DuckDB evaluates struct-literal fields sequentially against an in-place-updated accumulator, so a struct 'b' would see the already-updated 'l' — array element construction is snapshot-consistent in both engines). Both "
    "engines execute the identical IEEE op sequence (Spark aggregate "
    "with a struct accumulator; DuckDB list_reduce over struct-wrapped "
    "elements), so level/trend/forecast are bit-exact with no epsilon — "
    "the same cross-engine fold contract as the EWMA and CUSUM, "
    "extended to multi-variable state. Bounded tail = bounded state; "
    "the unbounded streaming form is the stateful-processor shape.",
    tags=("events", "timeseries", "forecast"),
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, oma, g, omg = float(_A), float(_OMA), float(_G), float(_OMG)
    ordered = (
        t(spark, sf_dir, "events")
        .select(
            "event_type", F.struct("ts", "event_id", "value").alias("x")
        )
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("x")), lambda s: s["value"]
            ).alias("vals")
        )
    )
    n = F.size("vals")
    xs = F.slice(
        F.col("vals"),
        F.greatest(n - F.lit(_N_TAIL) + 1, F.lit(1)),
        F.lit(_N_TAIL),
    )
    tail = ordered.select("event_type", xs.alias("xs"))

    def step(acc, x):
        l, b = F.element_at(acc, 1), F.element_at(acc, 2)
        new_l = a * x + oma * (l + b)
        new_b = g * ((a * x + oma * (l + b)) - l) + omg * b
        return F.array(new_l, new_b)

    st = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.array(F.element_at("xs", 1), F.lit(0.0)),
        step,
    )
    return tail.select(
        "event_type",
        F.size("xs").alias("n_points"),
        F.round(F.element_at(st, 1), 6).alias("level"),
        F.round(F.element_at(st, 2), 6).alias("trend"),
        F.round(F.element_at(st, 1) + F.element_at(st, 2), 6).alias(
            "forecast_next"
        ),
    )


def _phash_cluster_oracle() -> str:
    """Clusters of identical phash over the first 100 real images —
    derived from the same closed-form replay as the image-features
    oracle, reduced to the phash column."""
    base = OSQL.multimodal_image_features_oracle().replace(
        "FROM documents\n)", "FROM documents WHERE doc_id < 100\n)"
    )
    # keep the CTE chain, swap the final projection for the clustering
    head, _, _tail = base.rpartition("SELECT a.doc_id AS media_id,")
    return (
        head
        + """SELECT CAST(ph.phash AS BIGINT) AS phash,
       COUNT(*) AS n_images,
       MIN(ph.doc_id) AS min_media_id,
       MAX(ph.doc_id) AS max_media_id
FROM ph GROUP BY ph.phash
ORDER BY n_images DESC, phash"""
    )


@register(
    "multimodal_phash_clusters",
    oracle=_phash_cluster_oracle(),
    description="Visual duplicate clustering by perceptual hash: the "
    "64-bit block-sum phash from the REAL BMP decode path groups "
    "images whose content is structurally identical (the image analog "
    "of exact text dedup's md5 fingerprint — phash survives uniform "
    "brightness shifts the way text normalization survives case). One "
    "decode pass (Arrow mapInPandas), one hash-aggregate on the 8-byte "
    "key — the cheapest first stage of an image dedup pipeline, before "
    "hamming-banded near-dup joins (the simhash machinery applies "
    "verbatim to phash at that stage). The synthetic gradient corpus "
    "makes phash collide heavily BY CONSTRUCTION — which is exactly "
    "what the clustering output surfaces and the codec-replay oracle "
    "certifies, bit for bit.",
    tags=("llm", "multimodal", "dedup"),
)
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    media = mm.synthesize_media_real(docs).repartition(8, "media_id")
    feats = mm.extract_image_features(media, decoder="real")
    return (
        feats.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("media_id").alias("min_media_id"),
            F.max("media_id").alias("max_media_id"),
        )
        
    )
