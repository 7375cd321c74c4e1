"""Invariants for wave 98 (image augmentation, BPE compression eval)."""

from __future__ import annotations

import hashlib

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_augment_variants_match_numpy(spark):
    from news_ingestion_data_pipeline_spark.operators.multimodal import (
        _real_image,
        _real_image_dims,
    )

    rows = {
        (r.media_id, r.aug): r
        for r in REGISTRY["multimodal_augment_variants"].fn(spark, SF_SMOKE).collect()
    }
    # two variants per media row
    ids = {m for m, _ in rows}
    assert len(rows) == 2 * len(ids)
    for did in sorted(ids)[:20]:
        h, w = _real_image_dims(did)
        img = _real_image(did, w, h)
        flip = img[:, ::-1, :]
        crop = img[h // 4 : h // 4 + h // 2, w // 4 : w // 4 + w // 2, :]
        for aug, a in (("flip", flip), ("crop", crop)):
            r = rows[(did, aug)]
            assert (r.out_h, r.out_w) == a.shape[:2]
            blob = a[:8, :8].tobytes()
            assert r.crop_md5 == hashlib.md5(blob.hex().encode()).hexdigest()
            assert r.crop_sum == int(np.frombuffer(blob, dtype=np.uint8).sum())


def test_bpe_compression_eval_consistency(spark):
    rows = REGISTRY["curation_bpe_compression_eval"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    langs = {d.lang for d in docs if d.text.strip()}
    assert {r.lang for r in rows} == langs
    for r in rows:
        # merges only ever SHRINK token counts: tokens <= chars,
        # and 3 merges can at best halve-ish — chars/token in [1, 2.5]
        assert r.total_tokens <= r.total_chars
        assert 1.0 <= r.chars_per_token <= 2.5
        assert r.n_distinct_words <= r.total_words
        want = round(r.total_chars / r.total_tokens, 6)
        assert abs(r.chars_per_token - want) < 1e-9
