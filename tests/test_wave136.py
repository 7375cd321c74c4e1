"""Invariants for wave 136 (write-audit-publish, whitening)."""

from __future__ import annotations

import os

import numpy as np

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from news_ingestion_data_pipeline_spark.scratch import scratch_root


def test_wap_publishes_green_audit(spark):
    row = REGISTRY["pipeline_write_audit_publish"].fn(spark, SF_SMOKE).collect()[0]
    assert row.audit_green is True
    assert row.null_keys == 0 and row.orphans == 0
    assert row.published_rows == row.staged_rows > 0


def test_wap_red_audit_keeps_prior_publication(spark):
    import hashlib

    # run the green cycle to establish a publication
    REGISTRY["pipeline_write_audit_publish"].fn(spark, SF_SMOKE).collect()
    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    base = f"{scratch_root('llm136')}/wap_{sfx}"
    pointer = f"{base}/_PUBLISHED"
    before = open(pointer).read()
    # a corrupted candidate (orphan custkeys) must NOT flip the pointer:
    # simulate the audit path directly
    from pyspark.sql import functions as F

    staged = spark.read.parquet(before)
    corrupted = staged.withColumn("o_custkey", F.col("o_custkey") + 10_000_000)
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select("c_custkey")
    orphans = (
        corrupted.join(cust, corrupted.o_custkey == cust.c_custkey, "left")
        .filter(F.col("c_custkey").isNull())
        .count()
    )
    assert orphans > 0  # the audit would be red
    # pointer untouched because no publish happened for the red candidate
    assert open(pointer).read() == before
    assert os.path.exists(before)


def test_whitening_z_stats(spark):
    rows = REGISTRY["sim_embedding_whitening"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    emb = np.array(
        [
            r.embedding
            for r in spark.read.parquet(
                f"{SF_SMOKE}/embeddings.parquet"
            ).collect()
        ],
        dtype=np.float64,
    )
    n = emb.shape[0]
    for r in rows[:8]:
        col = emb[:, r.dim - 1]
        assert abs(r.mean_dim - round(col.mean(), 9)) < 1e-8
        assert abs(r.std_dim - round(col.std(ddof=1), 9)) < 1e-8
        # whitened column: near-zero mean, near-(n-1)*var... scale checks
        assert abs(r.sum_z) < 0.01 * n
        assert 0.8 * n < r.sumsq_z < 1.2 * n
