"""Multimodal columns: opaque binary payloads + typed metadata, processed
with Arrow-batched ``mapInPandas`` (SURVEY.md §2.12; north-star item).

Design for 100 TB of media:

  * media rows = ``binary`` payload + a typed ``meta`` struct; Spark never
    interprets the payload — filters/joins/partitioning run on the metadata
    columns, so predicate pushdown and column pruning skip payload bytes
    entirely when a query touches only metadata (parquet column chunks).
  * decode / feature-extract / resize / frame-sample are ``mapInPandas``
    stages: Arrow moves payload batches to Python once per batch (not per
    row); batch size is bounded by ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` so a batch of payloads fits executor memory.
  * payloads are spread with a repartition on media_id before heavy decode
    stages — media files skew wildly in size, and AQE can't split a single
    pathological input row-group.

STUB BOUNDARY: this container has no image/audio/video codec libraries, so
``DECODERS`` ships a deterministic fake (payload-seeded PRNG pixels) and a
clearly-marked ``NotImplementedError`` real path. The Spark-side plumbing —
schemas, UDF signatures, batch iteration, explode shapes — is real and
tested; swapping in Pillow/ffmpeg later changes only ``_decode_real``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, "
    "duration_ms:int, codec:string>"
)

FEATURE_SCHEMA_DDL = (
    "media_id bigint, kind string, height int, width int, channels int, "
    "mean_0 double, mean_1 double, mean_2 double, std_0 double, "
    "phash bigint"
)

FRAME_SCHEMA_DDL = (
    "media_id bigint, frame_no int, frame_ms int, frame_payload binary"
)


def synthesize_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """documents → deterministic fake media rows (test/bench corpus).

    Payload = utf-8 text bytes (opaque to Spark either way); meta is derived
    deterministically from doc_id so every engine/run agrees.
    """
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.pmod("doc_id", F.lit(32)) * 8 + 64).cast("int").alias("width"),
            (F.pmod("doc_id", F.lit(16)) * 8 + 64).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod("doc_id", F.lit(20)) * 500 + 1000).cast("int").alias("duration_ms"),
            F.lit(f"fake-{kind}").alias("codec"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# codec boundary
# ---------------------------------------------------------------------------

def _decode_real(payload: bytes, meta: dict) -> np.ndarray:
    raise NotImplementedError(
        "real media decoding needs codec libraries (Pillow / libav) that are "
        "not in this runtime; wire them here — callers are codec-agnostic"
    )


def _decode_fake(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in decoder: payload-seeded PRNG pixel block of the
    metadata-declared shape. Same payload+meta → same array, everywhere."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    h, w, c = meta["height"], meta["width"], meta["channels"]
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


DECODERS = {"fake": _decode_fake, "real": _decode_real}


def _phash64(img: np.ndarray) -> int:
    """64-bit perceptual-style hash: 8×8 block-mean grid vs its median.
    Pure numpy — no codec dependency."""
    gray = img.mean(axis=2)
    h, w = gray.shape
    blocks = gray[: h - h % 8, : w - w % 8].reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    bits = (blocks > np.median(blocks)).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------

def extract_image_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode each payload and emit per-image statistics + a 64-bit phash.

    One Arrow batch in, one out; decode cost dominates, so parallelism =
    input partitions — repartition upstream to the cluster's core count.
    """
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for _, row in pdf.iterrows():
                img = decode(bytes(row["payload"]), row["meta"])
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "height": img.shape[0],
                        "width": img.shape[1],
                        "channels": img.shape[2],
                        "mean_0": float(img[..., 0].mean()),
                        "mean_1": float(img[..., 1].mean()),
                        "mean_2": float(img[..., 2].mean()),
                        "std_0": float(img[..., 0].std()),
                        "phash": _phash64(img),
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.split()[0]: [] for f in FEATURE_SCHEMA_DDL.split(", ")}
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA_DDL)


def resize_images(media: DataFrame, out_w: int, out_h: int, decoder: str = "fake") -> DataFrame:
    """Decode → nearest-neighbor resize (pure numpy) → re-emit payload bytes
    with updated meta. Output schema == input schema, so stages compose."""
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                img = decode(bytes(row["payload"]), row["meta"])
                yi = (np.arange(out_h) * img.shape[0] // out_h)
                xi = (np.arange(out_w) * img.shape[1] // out_w)
                resized = img[yi][:, xi]
                meta = dict(row["meta"])
                meta.update(width=out_w, height=out_h)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "payload": resized.tobytes(),
                        "meta": meta,
                    }
                )
            yield pd.DataFrame(rows) if rows else pdf.iloc[0:0]

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA_DDL)


def sample_frames(media: DataFrame, every_ms: int = 500, decoder: str = "fake") -> DataFrame:
    """Video rows → one row per sampled frame (1:N explode via mapInPandas).

    Frame payloads are decoder output per timestamp; the *shape* — frame_no
    sequencing, ms offsets, per-frame binary — is the real contract a
    training-data pipeline consumes."""
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                duration = int(row["meta"]["duration_ms"])
                for i, ms in enumerate(range(0, duration, every_ms)):
                    frame_meta = dict(row["meta"])
                    frame = decode(bytes(row["payload"]) + ms.to_bytes(4, "big"), frame_meta)
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_no": i,
                            "frame_ms": ms,
                            "frame_payload": frame[:8, :8].tobytes(),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "frame_no", "frame_ms", "frame_payload"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA_DDL)


AUDIO_WINDOW_SCHEMA_DDL = (
    "media_id bigint, win_no int, win_start_ms int, rms double, "
    "zero_crossings int, peak int"
)


def _decode_audio_fake(payload: bytes, meta: dict, n_samples: int) -> np.ndarray:
    """Deterministic stand-in PCM decoder: payload-seeded PRNG int16
    waveform. Same payload+meta → same samples, everywhere."""
    seed = int.from_bytes(hashlib.md5(b"pcm" + payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(-(1 << 15), 1 << 15, size=n_samples, dtype=np.int64)


def extract_audio_features(
    media: DataFrame, window_ms: int = 250, decoder: str = "fake"
) -> DataFrame:
    """Audio rows → one row per fixed-length analysis window (1:N) with
    RMS energy, zero-crossing count, and peak amplitude — the windowed
    feature shape a speech/audio training pipeline computes before
    filtering segments.

    Pure-numpy DSP over the decoded PCM block; the codec boundary is the
    same DECODERS stub contract as images (real libav decode drops in
    without touching the Spark plumbing). Window math is integer-exact;
    RMS is one sqrt per window.
    """
    if decoder == "real":
        _decode_real(b"", {})  # raises NotImplementedError at plan-build time

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                rate, duration = int(meta["sample_rate"]), int(meta["duration_ms"])
                samples = _decode_audio_fake(
                    bytes(row["payload"]), meta, rate * duration // 1000
                )
                win = rate * window_ms // 1000
                for i in range(0, max(len(samples) - win + 1, 1), win):
                    seg = samples[i : i + win]
                    if len(seg) == 0:
                        continue
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "win_no": i // win,
                            "win_start_ms": i * 1000 // rate,
                            "rms": float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))),
                            "zero_crossings": int(np.sum(np.abs(np.diff(np.sign(seg))) > 1)),
                            "peak": int(np.max(np.abs(seg))),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "win_no": pd.Series(dtype="int32"),
                    "win_start_ms": pd.Series(dtype="int32"),
                    "rms": pd.Series(dtype="float64"),
                    "zero_crossings": pd.Series(dtype="int32"),
                    "peak": pd.Series(dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA_DDL)
