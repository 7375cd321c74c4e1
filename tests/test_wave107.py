"""Invariants for wave 107 (chunked reassembly, curriculum shards)."""

from __future__ import annotations

import hashlib

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_chunked_reassembly_checksums(spark):
    rows = REGISTRY["multimodal_chunked_blob_reassembly"].fn(spark, SF_SMOKE).collect()
    docs = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        b = docs[r.doc_id].encode()
        assert r.checksum_ok
        assert r.n_bytes == len(b)
        assert r.n_chunks == -(-len(b) // 16)
        assert r.reassembled_md5 == hashlib.md5(b).hexdigest()


def test_curriculum_shards_tile_monotonically(spark):
    rows = sorted(
        REGISTRY["curation_curriculum_shards"].fn(spark, SF_SMOKE).collect(),
        key=lambda r: r.shard,
    )
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    n = len(docs)
    assert [r.shard for r in rows] == list(range(1, 9))
    assert sum(r.n_docs for r in rows) == n
    # ANSI NTILE sizes: first n%8 shards get one extra row
    q, rem = divmod(n, 8)
    assert [r.n_docs for r in rows] == [q + 1] * rem + [q] * (8 - rem)
    # difficulty ranges tile: shard k's max <= shard k+1's min
    for a, b in zip(rows, rows[1:]):
        assert a.max_difficulty <= b.min_difficulty
    assert rows[0].min_difficulty == min(d.n_chars for d in docs)
    assert rows[-1].max_difficulty == max(d.n_chars for d in docs)
