"""Ninety-second wave: temporal segmentation over decoded media.

Two compositions a multimodal training-data pipeline runs after the
per-window / per-frame feature extraction the registry already proves
(`multimodal_audio_windows`, `multimodal_frame_sample`):

  * voice-activity segments — threshold the 250 ms RMS windows and
    collapse consecutive voiced windows into segments (gaps-and-islands
    over win_no), the step that turns raw audio into trainable speech
    clips with start/duration metadata.
  * shot-boundary detection — per-frame brightness from the REAL
    framepack->BMP decode path, first-difference along the frame axis,
    boundary where the jump exceeds a threshold, cumulative shot ids.
    This is the standard intensity-delta shot detector; smarter
    detectors swap the feature, not the plan.

Both stay on the proven real-codec plans: the Spark side re-reads the
registered window/frame constructions (Arrow mapInPandas decode), the
segmentation itself is pure window-function + hash-aggregate work, and
the oracle regenerates the identical features closed-form.  At 100 TB
the windows/frames are already distributed per media row; lag/islands
partition BY media_id so no state ever crosses one medium's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t

#: RMS threshold splitting the synthetic windows roughly in half
#: (observed range ~4.2k..29.3k, median ~17.5k)
_VAD_RMS = 17000.0

_AUDIO_WINDOWS_CTE = """
d AS (
  SELECT doc_id, (doc_id % 8) * 250 + 500 AS duration_ms
  FROM documents ORDER BY doc_id LIMIT 200
), s AS (
  SELECT doc_id, unnest(range(0, 8 * duration_ms)) AS i FROM d
), v AS (
  SELECT doc_id, CAST(i // 2000 AS INT) AS win_no,
    (31 * doc_id + 7 * i) % 65536 - 32768 AS smp
  FROM s
), win AS (
  SELECT doc_id AS media_id, win_no,
         CAST(win_no * 250 AS INT) AS win_start_ms,
         sqrt(CAST(CAST(SUM(smp * smp) AS VARCHAR) AS DOUBLE) / 2000) AS rms
  FROM v GROUP BY doc_id, win_no
)"""


@register(
    "multimodal_audio_vad_segments",
    oracle=f"""
WITH {_AUDIO_WINDOWS_CTE}, voiced AS (
  SELECT media_id, win_no, win_start_ms, rms,
         win_no - ROW_NUMBER() OVER (PARTITION BY media_id
                                     ORDER BY win_no) AS island
  FROM win WHERE rms > {_VAD_RMS}
), seg AS (
  SELECT media_id, island,
         MIN(win_start_ms) AS start_ms,
         MAX(win_start_ms) + 250 AS end_ms,
         COUNT(*) AS n_windows,
         MAX(rms) AS peak_rms
  FROM voiced GROUP BY media_id, island
)
SELECT media_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY start_ms)
            AS BIGINT) AS seg_no,
       CAST(start_ms AS INT) AS start_ms,
       CAST(end_ms AS INT) AS end_ms,
       CAST(n_windows AS BIGINT) AS n_windows,
       peak_rms
FROM seg
ORDER BY media_id, seg_no
""",
    description="Voice-activity segments from the REAL-codec audio "
    "pipeline: the registered 250 ms RMS windows (WAV bytes decoded by "
    "the RIFF walker, Arrow mapInPandas) are thresholded at "
    "rms > 17000 and consecutive voiced windows collapse into segments "
    "via gaps-and-islands (win_no - row_number per media), emitting "
    "start/end ms, window count, and peak RMS per segment — the step "
    "that turns raw audio into trainable speech clips. RMS values are "
    "exact (integer sum-of-squares -> one sqrt) so the threshold "
    "comparison is bit-identical cross-engine. Islands partition BY "
    "media_id: at 100 TB no window state crosses one medium's rows and "
    "the segment aggregate is a per-media hash-agg.",
    tags=("multimodal", "llm", "streaming"),
)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    win = REGISTRY["multimodal_audio_windows"].fn(spark, sf_dir)
    voiced = (
        win.filter(F.col("rms") > _VAD_RMS)
        .withColumn(
            "island",
            F.col("win_no")
            - F.row_number().over(
                Window.partitionBy("media_id").orderBy("win_no")
            ),
        )
    )
    seg = voiced.groupBy("media_id", "island").agg(
        F.min("win_start_ms").alias("start_ms"),
        (F.max("win_start_ms") + 250).alias("end_ms"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.max("rms").alias("peak_rms"),
    )
    return (
        seg.withColumn(
            "seg_no",
            F.row_number()
            .over(Window.partitionBy("media_id").orderBy("start_ms"))
            .cast("bigint"),
        )
        .select(
            "media_id",
            "seg_no",
            F.col("start_ms").cast("int").alias("start_ms"),
            F.col("end_ms").cast("int").alias("end_ms"),
            "n_windows",
            "peak_rms",
        )
        
    )


#: brightness-jump threshold (observed inter-frame diffs 192..3648)
_SHOT_DIFF = 3000


@register(
    "multimodal_shot_boundaries",
    oracle=f"""
WITH d AS (
  SELECT doc_id, (doc_id % 6) * 500 + 1000 AS duration_ms
  FROM documents ORDER BY doc_id LIMIT 200
), fr AS (
  SELECT doc_id, unnest(range(0, duration_ms // 500)) AS f FROM d
), fb AS (
  SELECT doc_id, f, unnest(range(0, 192)) AS k FROM fr
), sums AS (
  SELECT doc_id AS media_id, CAST(f AS INT) AS frame_no,
         CAST(f * 500 AS INT) AS frame_ms,
         SUM((3 * doc_id + 17 * f + (k % 3) + (k // 24) * 16
              + ((k % 24) // 3)) % 256) AS bsum
  FROM fb GROUP BY doc_id, f
), diffs AS (
  SELECT media_id, frame_no, frame_ms,
         CAST(bsum AS BIGINT) AS brightness,
         CAST(abs(bsum - lag(bsum) OVER (PARTITION BY media_id
                                         ORDER BY frame_no)) AS BIGINT)
           AS jump
  FROM sums
)
SELECT media_id, frame_no, frame_ms, brightness, jump,
       coalesce(jump > {_SHOT_DIFF}, FALSE) AS is_boundary,
       CAST(SUM(CASE WHEN coalesce(jump > {_SHOT_DIFF}, FALSE)
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY media_id ORDER BY frame_no
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS shot_no
FROM diffs
ORDER BY media_id, frame_no
""",
    description="Shot-boundary detection over the REAL framepack->BMP "
    "decode path: each sampled frame's 8x8 crop (the bytes "
    "multimodal_frame_sample md5-verifies) is reduced to an integer "
    "brightness sum — an exact 192-byte aggregate over hex pairs, "
    "JVM-side — then lag() gives the inter-frame jump, a jump > 3000 "
    "marks a boundary, and a running sum of boundary flags numbers the "
    "shots. The standard intensity-delta shot detector: smarter "
    "features (histograms, embeddings) swap the brightness column, not "
    "the plan. lag/cumsum partition BY media_id, so at 100 TB the only "
    "ordered state is one medium's few frames.",
    tags=("multimodal", "llm"),
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = mm.synthesize_media_real(docs, kind="video").repartition(
        8, "media_id"
    )
    frames = mm.sample_frames(media, every_ms=500, decoder="real")
    hx = F.lower(F.hex("frame_payload"))
    brightness = F.aggregate(
        F.sequence(F.lit(0), F.lit(191)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.conv(F.substr(hx, i * 2 + 1, F.lit(2)), 16, 10).cast("bigint"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_no")
    b = frames.select(
        "media_id",
        "frame_no",
        "frame_ms",
        brightness.alias("brightness"),
    ).withColumn(
        "jump", F.abs(F.col("brightness") - F.lag("brightness").over(w))
    )
    flag = F.coalesce(F.col("jump") > _SHOT_DIFF, F.lit(False))
    return (
        b.withColumn("is_boundary", flag)
        .withColumn(
            "shot_no",
            F.sum(flag.cast("int"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        
    )
