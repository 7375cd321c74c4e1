"""Invariants for wave 117 (audio resample, ANY/ALL subqueries)."""

from __future__ import annotations

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_resample_payload_roundtrips_codec(spark):
    from news_ingestion_data_pipeline_spark.operators import (
        codecs,
        multimodal as mm,
    )
    from news_ingestion_data_pipeline_spark.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").orderBy("doc_id").limit(8)
    media = mm.synthesize_media_real(docs, kind="audio")
    out = mm.resample_audio(media, factor=4).collect()
    assert len(out) == 8
    for r in out:
        assert r.rate_out == 2000
        assert r.n_out == r.n_in // 4
        samples, rate = codecs.decode_wav(bytes(r.payload_out))
        assert rate == 2000 and len(samples) == r.n_out
        s = samples.astype(np.int64)
        assert int((s * s).sum()) == r.sumsq_out
        # replay the decimation from the closed-form PCM
        i = np.arange(r.n_in, dtype=np.int64)
        src = (31 * r.media_id + 7 * i) % 65536 - 32768
        blocks = (src[: r.n_out * 4] + 32768).reshape(-1, 4)
        expect = blocks.sum(axis=1) // 4 - 32768
        assert np.array_equal(s, expect)


def test_resample_guard():
    import pytest

    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    with pytest.raises(ValueError):
        mm.resample_audio(None, factor=0)


def test_any_all_reduce_to_extremes(spark):
    rows = REGISTRY["subquery_any_all"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    urgent = [o.o_totalprice for o in orders if o.o_orderpriority == "1-URGENT"]
    mx, mn = max(urgent), min(urgent)
    custseg = {
        c.c_custkey: c.c_mktsegment
        for c in spark.read.parquet(f"{SF_SMOKE}/customer.parquet").collect()
    }
    from collections import defaultdict

    exp = defaultdict(lambda: [0, 0, 0])
    for o in orders:
        seg = custseg.get(o.o_custkey)
        if seg is None:
            continue
        exp[seg][0] += 1
        exp[seg][1] += o.o_totalprice > mx
        exp[seg][2] += o.o_totalprice > mn
    assert {r.c_mktsegment: [r.n_orders, r.n_gt_all_urgent, r.n_gt_any_urgent] for r in rows} == dict(exp)
