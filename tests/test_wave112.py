"""Invariants for wave 112 (frame containment dedup, PQ training)."""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_frame_dedup_pairs_follow_pixel_arithmetic(spark):
    rows = REGISTRY["multimodal_frame_containment_dedup"].fn(
        spark, SF_SMOKE
    ).collect()
    assert rows, "synthetic corpus collides by construction"
    for r in rows:
        assert r.media_a < r.media_b
        assert r.n_shared_frames >= 2
        # frames collide iff 3*d_a + 17*f_a == 3*d_b + 17*f_b (mod 256),
        # so the doc-id gap must admit an integer frame shift:
        # 3*(d_b-d_a) == 17*(f_a-f_b) (mod 256) for some |shift| <= 6.
        gap = (3 * (r.media_b - r.media_a)) % 256
        admissible = {(17 * s) % 256 for s in range(-6, 7)}
        assert gap in admissible, (r.media_a, r.media_b, gap)


def test_pq_codebooks_full_partition_per_subspace(spark):
    rows = REGISTRY["sim_pq_train_codebooks"].fn(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r.subspace, []).append(r)
    assert set(by_sub) == {0, 1, 2, 3}
    total_ids = n_vecs * (n_vecs - 1) // 2
    for sub, cells in by_sub.items():
        assert sum(c.n_assigned for c in cells) == n_vecs
        assert sum(c.sum_vec_id for c in cells) == total_ids
        assert all(0 <= c.cent_id < 16 for c in cells)
    # subspaces see different geometry -> at least two distinct partitions
    sigs = {
        tuple(sorted((c.cent_id, c.n_assigned) for c in cells))
        for cells in by_sub.values()
    }
    assert len(sigs) >= 2
