"""Multimodal plumbing tests: schemas, mapInPandas batch shapes, composition
(resize→features), frame explode counts, determinism of the fake codec, and
the NotImplementedError gate on the real one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import multimodal as mm
from news_ingestion_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    return mm.synthesize_media(docs).repartition(4, "media_id").cache()


def test_media_schema(media):
    assert media.columns == ["media_id", "kind", "payload", "meta"]
    row = media.first()
    assert row["meta"]["channels"] == 3
    assert isinstance(row["payload"], (bytes, bytearray))


def test_feature_extraction_shape_and_determinism(media):
    feats = mm.extract_image_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 40
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    for mid, r in rows.items():
        assert (r["height"], r["width"]) == (meta[mid]["height"], meta[mid]["width"])
        assert 0 <= r["mean_0"] <= 255
    # deterministic across independent runs
    again = {r["media_id"]: r for r in mm.extract_image_features(media).collect()}
    assert all(again[k]["phash"] == rows[k]["phash"] for k in rows)


def test_resize_composes_with_features(media):
    resized = mm.resize_images(media, 32, 24)
    feats = mm.extract_image_features(resized)
    for r in feats.collect():
        assert (r["height"], r["width"]) == (24, 32)
    m = resized.first()["meta"]
    assert (m["width"], m["height"]) == (32, 24)


def test_frame_sampling_counts(media):
    video = media.withColumn("kind", F.lit("video"))
    frames = mm.sample_frames(video, every_ms=500)
    per = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()}
    for mid, n in per.items():
        assert n == -(-durations[mid] // 500)  # ceil(duration/500)
    fr = frames.filter(F.col("media_id") == min(per)).orderBy("frame_no").collect()
    assert [f["frame_ms"] for f in fr] == [i * 500 for i in range(len(fr))]


def test_real_decoder_roundtrips():
    import numpy as np

    from news_ingestion_data_pipeline_spark.operators import codecs

    rng = np.random.default_rng(7)
    for h, w in [(64, 64), (24, 32), (10, 7)]:  # incl. BMP row padding cases
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.DECODERS["real"](codecs.encode_bmp(img), {}), img)
        assert np.array_equal(mm.DECODERS["real"](codecs.encode_ppm(img), {}), img)
    samples = rng.integers(-(1 << 15), 1 << 15, 4000).astype(np.int16)
    decoded, rate = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert rate == 8000 and np.array_equal(decoded, samples)
    with pytest.raises(ValueError):
        mm.DECODERS["real"](b"GIF89a...", {})


def test_real_pipeline_end_to_end(spark):
    """synthesize real BMPs -> real decode -> features; and resize composes
    through a real re-encode."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(12)
    media = mm.synthesize_media_real(docs)
    feats = {r["media_id"]: r for r in mm.extract_image_features(media, decoder="real").collect()}
    assert len(feats) == 12
    for mid, r in feats.items():
        h, w = mm._real_image_dims(mid)
        assert (r["height"], r["width"]) == (h, w)
        img = mm._real_image(mid, w, h)
        assert r["mean_0"] == int(img[..., 0].astype("int64").sum()) / (h * w)
        assert r["phash"] == mm._phash64(img)
    resized = mm.resize_images(media, 32, 24, decoder="real")
    for r in mm.extract_image_features(resized, decoder="real").collect():
        assert (r["height"], r["width"]) == (24, 32)


def test_real_audio_and_frames(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    audio = mm.synthesize_media_real(docs, kind="audio")
    wins = mm.extract_audio_features(audio, window_ms=250, decoder="real").collect()
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in audio.collect()}
    from collections import Counter

    counts = Counter(r["media_id"] for r in wins)
    assert all(counts[mid] == dur // 250 for mid, dur in durations.items())
    video = mm.synthesize_media_real(docs, kind="video")
    frames = mm.sample_frames(video, every_ms=500, decoder="real").collect()
    vdur = {r["media_id"]: r["meta"]["duration_ms"] for r in video.collect()}
    fcounts = Counter(r["media_id"] for r in frames)
    assert all(fcounts[mid] == -(-dur // 500) for mid, dur in vdur.items())
    # frame payload is the decoded 8x8 crop of the right per-frame image
    import numpy as np

    f0 = next(r for r in frames if r["frame_no"] == 1)
    expect = mm._real_image(f0["media_id"], 16, 16, frame=1)[:8, :8].tobytes()
    assert bytes(f0["frame_payload"]) == expect


def test_audio_windows_shape_and_determinism(spark):
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").orderBy("doc_id").limit(20)
    media = mm.synthesize_media(docs, kind="audio")
    out1 = mm.extract_audio_features(media, window_ms=250).collect()
    out2 = mm.extract_audio_features(media, window_ms=250).collect()
    assert len(out1) > 0
    # deterministic: same payloads -> identical windows
    key = lambda r: (r.media_id, r.win_no)  # noqa: E731
    assert {key(r): (r.rms, r.zero_crossings, r.peak) for r in out1} == {
        key(r): (r.rms, r.zero_crossings, r.peak) for r in out2
    }
    # window sequencing: contiguous win_no from 0, 250ms apart at 16kHz
    rows = sorted((r for r in out1 if r.media_id == out1[0].media_id), key=lambda r: r.win_no)
    assert [r.win_no for r in rows] == list(range(len(rows)))
    assert all(b.win_start_ms - a.win_start_ms == 250 for a, b in zip(rows, rows[1:]))
    # n windows = duration/250 for each media row (duration from meta)
    metas = {r.media_id: r.meta["duration_ms"] for r in media.select("media_id", "meta").collect()}
    from collections import Counter
    counts = Counter(r.media_id for r in out1)
    for mid, dur in metas.items():
        assert counts[mid] == dur // 250
    # physical sanity: rms <= peak, peak within int16 magnitude
    assert all(0 <= r.rms <= r.peak <= (1 << 15) for r in out1)
