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

CODEC BOUNDARY: ``DECODERS["real"]`` decodes actual BMP/PPM image bytes and
``AUDIO_DECODERS["real"]`` actual WAV/PCM-s16le bytes via the pure-numpy
parsers in ``operators/codecs.py`` — no codec library needed. A
deterministic fake (payload-seeded PRNG pixels) remains for plumbing tests
and for formats the numpy parsers don't cover; Pillow/libav would slot into
``codecs.py`` without touching any Spark plumbing here.

Feature math is integer-exact where possible (integer pixel/sample sums,
one IEEE division at the end) so results are bit-identical across engines
and oracle-checkable — see plans/oracle_sqlgen.py for the DuckDB twins.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import codecs

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


# Deterministic pixel/sample formulas for the REAL-payload synthetic corpus.
# Chosen to be closed-form (doc_id + coordinate arithmetic mod 2^k) so a SQL
# oracle can regenerate the decoded content and certify the whole
# encode→decode→feature path end to end.

def _real_image_dims(doc_id: int) -> tuple[int, int]:
    """(h, w), both divisible by 8 (clean phash blocks) and by 4 (no BMP
    row padding ambiguity — though the codec handles padding anyway)."""
    return 64 + (doc_id % 3) * 8, 64 + (doc_id % 4) * 8


def _real_image(doc_id: int, w: int, h: int, frame: int = 0) -> np.ndarray:
    """pixel(y, x, c) = (3·doc_id + 17·frame + c + y·w + x) mod 256."""
    p = np.arange(h * w, dtype=np.int64).reshape(h, w)
    base = 3 * doc_id + 17 * frame
    return ((base + p[:, :, None] + np.arange(3, dtype=np.int64)[None, None, :]) % 256).astype(
        np.uint8
    )


_REAL_AUDIO_RATE = 8000


def _real_audio(doc_id: int, n_samples: int) -> np.ndarray:
    """sample(i) = ((31·doc_id + 7·i) mod 65536) − 32768, int16 range."""
    i = np.arange(n_samples, dtype=np.int64)
    return ((31 * doc_id + 7 * i) % 65536) - 32768


_REAL_FRAME_W = 16
_REAL_FRAME_INTERVAL_MS = 500


def synthesize_media_real(documents: DataFrame, kind: str = "image") -> DataFrame:
    """documents → media rows with REAL encoded payloads (BMP / WAV /
    framepack-of-BMPs), deterministic from doc_id via the formulas above.

    Encoding runs in mapInPandas (payload construction is per-row Python by
    nature); everything downstream — decode, features — exercises the real
    codec path.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                if kind == "image":
                    h, w = _real_image_dims(did)
                    payload = codecs.encode_bmp(_real_image(did, w, h))
                    meta = dict(width=w, height=h, channels=3, sample_rate=0,
                                duration_ms=0, codec="bmp24")
                elif kind == "audio":
                    duration_ms = (did % 8) * 250 + 500
                    n = _REAL_AUDIO_RATE * duration_ms // 1000
                    payload = codecs.encode_wav(_real_audio(did, n), _REAL_AUDIO_RATE)
                    meta = dict(width=0, height=0, channels=1,
                                sample_rate=_REAL_AUDIO_RATE,
                                duration_ms=duration_ms, codec="pcm_s16le")
                elif kind == "video":
                    duration_ms = (did % 6) * 500 + 1000
                    n_frames = -(-duration_ms // _REAL_FRAME_INTERVAL_MS)
                    frames = [
                        codecs.encode_bmp(
                            _real_image(did, _REAL_FRAME_W, _REAL_FRAME_W, frame=f)
                        )
                        for f in range(n_frames)
                    ]
                    payload = codecs.encode_framepack(frames, _REAL_FRAME_INTERVAL_MS)
                    meta = dict(width=_REAL_FRAME_W, height=_REAL_FRAME_W, channels=3,
                                sample_rate=0, duration_ms=duration_ms,
                                codec="framepack/bmp24")
                else:
                    raise ValueError(f"unknown kind {kind!r}")
                rows.append(
                    {"media_id": did, "kind": kind, "payload": payload, "meta": meta}
                )
            yield pd.DataFrame(rows) if rows else pdf.iloc[0:0]

    return documents.select("doc_id").mapInPandas(batches, schema=MEDIA_SCHEMA_DDL)


# ---------------------------------------------------------------------------
# codec boundary
# ---------------------------------------------------------------------------

def _decode_real(payload: bytes, meta: dict) -> np.ndarray:
    """Real image decode: BMP or PPM by magic bytes (pure numpy,
    operators/codecs.py). Unknown containers raise — loudly, not a fake."""
    if payload[:2] == b"BM":
        return codecs.decode_bmp(payload)
    if payload[:2] == b"P6":
        return codecs.decode_ppm(payload)
    raise ValueError(
        f"unsupported image container (magic {payload[:2]!r}); "
        "BMP and P6 PPM decode natively — other formats need Pillow wired "
        "into operators/codecs.py"
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
    """64-bit perceptual-style hash: 8×8 block-sum grid vs the middle pair
    of its sorted values (integer-exact median comparison). Pure integer
    numpy — no codec dependency, no float rounding, so the same arithmetic
    is expressible in a SQL oracle.

    Equivalent to comparing block MEANS against their median when blocks
    are equal-sized (they are: the image is cropped to multiples of 8), but
    computed on channel-summed integer block sums so ties resolve
    identically everywhere.
    """
    h, w = img.shape[:2]
    gray3 = img[: h - h % 8, : w - w % 8].sum(axis=2, dtype=np.int64)
    hh, ww = gray3.shape
    blocks = gray3.reshape(8, hh // 8, 8, ww // 8).sum(axis=(1, 3)).flatten()
    mid = np.sort(blocks)
    m2 = int(mid[31]) + int(mid[32])            # 2 × median of 64 values
    val = 0
    for b in blocks:
        val = (val << 1) | int(2 * int(b) > m2)
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------

def extract_image_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode each payload and emit per-image statistics + a 64-bit phash.

    One Arrow batch in, one out; decode cost dominates, so parallelism =
    input partitions — repartition upstream to the cluster's core count.

    Means/std are integer pixel sums with one IEEE division (and one sqrt)
    at the end — bit-identical across engines, hence oracle-checkable.
    """
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta)
                hgt, wid, nch = img.shape
                npx = hgt * wid
                chan = img.reshape(npx, nch).astype(np.int64)
                s = chan.sum(axis=0)
                ss0 = int((chan[:, 0] ** 2).sum())
                s0 = int(s[0])
                mean0 = s0 / npx
                out.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "height": hgt,
                        "width": wid,
                        "channels": nch,
                        "mean_0": mean0,
                        "mean_1": int(s[1]) / npx if nch > 1 else mean0,
                        "mean_2": int(s[2]) / npx if nch > 2 else mean0,
                        "std_0": math.sqrt(ss0 / npx - (s0 / npx) * (s0 / npx)),
                        "phash": _phash64(img),
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.split()[0]: [] for f in FEATURE_SCHEMA_DDL.split(", ")}
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA_DDL)


def resize_images(media: DataFrame, out_w: int, out_h: int, decoder: str = "fake") -> DataFrame:
    """Decode → nearest-neighbor resize (pure numpy) → re-emit payload with
    updated meta. Output schema == input schema, so stages compose; with the
    real decoder the output payload is a real BMP (re-encoded), so a second
    real decode stage composes too.
    """
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta)
                yi = (np.arange(out_h) * img.shape[0] // out_h)
                xi = (np.arange(out_w) * img.shape[1] // out_w)
                resized = img[yi][:, xi]
                new_meta = dict(meta)
                new_meta.update(width=out_w, height=out_h)
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "payload": codecs.encode_bmp(resized)
                        if decoder == "real"
                        else resized.tobytes(),
                        "meta": new_meta,
                    }
                )
            yield pd.DataFrame(rows) if rows else pdf.iloc[0:0]

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA_DDL)


def sample_frames(media: DataFrame, every_ms: int = 500, decoder: str = "fake") -> DataFrame:
    """Video rows → one row per sampled frame (1:N explode via mapInPandas).

    Real path: the payload is a framepack container (operators/codecs.py) —
    header parse → pick the frame covering each sample timestamp → decode
    that one still (BMP) → emit its 8×8 top-left crop as the frame payload.
    Fake path: decoder output seeded by payload+timestamp (plumbing tests).
    """
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload)
                duration = int(meta["duration_ms"])
                if decoder == "real":
                    frames, interval = codecs.decode_framepack(payload)
                    for i, ms in enumerate(range(0, duration, every_ms)):
                        idx = min(ms // interval, len(frames) - 1)
                        frame = decode(frames[idx], meta)
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_no": i,
                                "frame_ms": ms,
                                "frame_payload": frame[:8, :8].tobytes(),
                            }
                        )
                else:
                    for i, ms in enumerate(range(0, duration, every_ms)):
                        frame = decode(payload + ms.to_bytes(4, "big"), meta)
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_no": i,
                                "frame_ms": ms,
                                "frame_payload": frame[:8, :8].tobytes(),
                            }
                        )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "frame_no", "frame_ms", "frame_payload"]
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA_DDL)


AUG_SCHEMA_DDL = (
    "media_id bigint, aug string, out_h int, out_w int, crop_payload binary"
)


def augment_images(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Deterministic training-time image augmentation (1:N via
    mapInPandas): horizontal flip and center-crop-half variants per
    image, each emitting its output dims plus the augmented image's 8×8
    top-left crop bytes — enough to verify the index transform
    byte-for-byte without shipping whole images through the shuffle.

    Real path decodes through the BMP/PPM parser first, so augmentation
    exercises decode → transform end to end; numpy slicing only (flip is
    a negative-stride view, crop a sub-view — no pixel copies until the
    8×8 verification crop is materialized).
    """
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta)
                h, w = img.shape[0], img.shape[1]
                variants = (
                    ("flip", img[:, ::-1, :]),
                    (
                        "crop",
                        img[
                            h // 4 : h // 4 + h // 2,
                            w // 4 : w // 4 + w // 2,
                            :,
                        ],
                    ),
                )
                for aug, a in variants:
                    rows.append(
                        {
                            "media_id": media_id,
                            "aug": aug,
                            "out_h": a.shape[0],
                            "out_w": a.shape[1],
                            "crop_payload": a[:8, :8].tobytes(),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["media_id", "aug", "out_h", "out_w", "crop_payload"]
            )

    return media.mapInPandas(batches, schema=AUG_SCHEMA_DDL)


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


def _decode_audio_real(payload: bytes, meta: dict, n_samples: int) -> np.ndarray:
    """Real WAV/PCM-s16le decode (operators/codecs.py); sample count and
    rate come from the RIFF header, not the metadata."""
    samples, _rate = codecs.decode_wav(payload)
    return samples.astype(np.int64)


AUDIO_DECODERS = {"fake": _decode_audio_fake, "real": _decode_audio_real}


def extract_audio_features(
    media: DataFrame, window_ms: int = 250, decoder: str = "fake"
) -> DataFrame:
    """Audio rows → one row per fixed-length analysis window (1:N) with
    RMS energy, zero-crossing count, and peak amplitude — the windowed
    feature shape a speech/audio training pipeline computes before
    filtering segments.

    Pure-numpy DSP over the decoded PCM block; RMS is an integer
    sum-of-squares with one division + sqrt (oracle-exact); crossings and
    peak are integers.
    """
    decode_pcm = AUDIO_DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                rate, duration = int(meta["sample_rate"]), int(meta["duration_ms"])
                samples = decode_pcm(bytes(payload), meta, rate * duration // 1000)
                win = rate * window_ms // 1000
                for i in range(0, max(len(samples) - win + 1, 1), win):
                    seg = samples[i : i + win]
                    if len(seg) == 0:
                        continue
                    ss = int((seg.astype(np.int64) ** 2).sum())
                    rows.append(
                        {
                            "media_id": media_id,
                            "win_no": i // win,
                            "win_start_ms": i * 1000 // rate,
                            "rms": math.sqrt(ss / len(seg)),
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


RESAMPLE_SCHEMA_DDL = (
    "media_id bigint, n_in bigint, n_out bigint, rate_out int, "
    "sumsq_out bigint, checksum_out bigint, payload_out binary"
)


def resample_audio(media: DataFrame, factor: int = 4) -> DataFrame:
    """Integer-factor audio decimation through the REAL WAV codec path:
    decode PCM-s16le, boxcar-average each ``factor`` block (computed in
    the unsigned 0..65535 domain so the floor division is sign-free and
    engine-portable), re-ENCODE at rate/factor, and emit integer
    certificates over every output sample (Σs², Σ(j+1)·s_j) plus the new
    payload. Mirrors a speech pipeline's 16k→8k/8k→2k downsample stage;
    the decode→DSP→encode round trip all happens executor-side in one
    Arrow batch — only certificates and the (smaller) payload cross the
    shuffle."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = codecs.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                n_in = len(s)
                n_out = n_in // factor
                blocks = (s[: n_out * factor] + 32768).reshape(-1, factor)
                out = blocks.sum(axis=1) // factor - 32768
                rate_out = rate // factor
                payload_out = codecs.encode_wav(
                    out.astype(np.int64), rate_out
                )
                j = np.arange(1, n_out + 1, dtype=np.int64)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "n_in": n_in,
                        "n_out": int(n_out),
                        "rate_out": rate_out,
                        "sumsq_out": int((out * out).sum()),
                        "checksum_out": int((j * out).sum()),
                        "payload_out": payload_out,
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "n_in": pd.Series(dtype="int64"),
                    "n_out": pd.Series(dtype="int64"),
                    "rate_out": pd.Series(dtype="int32"),
                    "sumsq_out": pd.Series(dtype="int64"),
                    "checksum_out": pd.Series(dtype="int64"),
                    "payload_out": pd.Series(dtype="object"),
                }
            )

    return media.mapInPandas(batches, schema=RESAMPLE_SCHEMA_DDL)


PATCH_SCHEMA_DDL = (
    "media_id bigint, py int, px int, psum bigint, pmin int, pmax int"
)


def extract_patches(media: DataFrame, patch: int = 8, decoder: str = "real") -> DataFrame:
    """ViT-style patchification: decode each image and emit one row per
    non-overlapping patch×patch tile with integer pixel statistics
    (sum / min / max over all channels). The dims are multiples of 8 by
    construction, so tiling is exact. Decode + tiling stay executor-side
    in one Arrow batch; only the per-patch integer stats cross the
    shuffle — the same metadata/payload split as the other codec ops."""
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                img = decode(bytes(payload), meta).astype(np.int64)
                h, w = img.shape[0], img.shape[1]
                for py in range(h // patch):
                    for px in range(w // patch):
                        tile = img[
                            py * patch : (py + 1) * patch,
                            px * patch : (px + 1) * patch,
                        ]
                        rows.append(
                            {
                                "media_id": int(media_id),
                                "py": py,
                                "px": px,
                                "psum": int(tile.sum()),
                                "pmin": int(tile.min()),
                                "pmax": int(tile.max()),
                            }
                        )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {
                    "media_id": pd.Series(dtype="int64"),
                    "py": pd.Series(dtype="int32"),
                    "px": pd.Series(dtype="int32"),
                    "psum": pd.Series(dtype="int64"),
                    "pmin": pd.Series(dtype="int32"),
                    "pmax": pd.Series(dtype="int32"),
                }
            )

    return media.mapInPandas(batches, schema=PATCH_SCHEMA_DDL)
