"""Invariants for wave 130 (crypto-shredding)."""

from __future__ import annotations

import hashlib

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def _keystream_xor(hex_str: str, prefix: str) -> str:
    n_chunks = (len(hex_str) + 7) // 8
    padded = hex_str + "0" * 8
    out = []
    for i in range(1, n_chunks + 1):
        a = int(padded[(i - 1) * 8 : (i - 1) * 8 + 8], 16)
        b = int(hashlib.md5(f"{prefix}-{i}".encode()).hexdigest()[:8], 16)
        out.append(f"{a ^ b:08x}")
    return "".join(out)


def test_crypto_shred_roundtrip_and_erasure(spark):
    rows = {
        r.doc_id: r
        for r in REGISTRY["pipeline_crypto_shred"].fn(spark, SF_SMOKE).collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n_erased = 0
    for d in docs:
        r = rows[d.doc_id]
        h = d.text.encode().hex()
        cipher = _keystream_xor(h, f"key-{d.source}")
        if d.source == "src7":
            n_erased += 1
            assert r.erased is True
            assert r.roundtrip_ok is False
            assert r.recovered_md5 == hashlib.md5(cipher.encode()).hexdigest()
            # the ciphertext is NOT the plaintext hex: shredded data is dark
            assert cipher != h
        else:
            assert r.erased is False
            assert r.roundtrip_ok is True
            rec = _keystream_xor(cipher, f"key-{d.source}")[: len(h)]
            assert rec == h
            assert r.recovered_md5 == hashlib.md5(h.encode()).hexdigest()
    assert n_erased > 0
