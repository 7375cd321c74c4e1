"""Invariants for wave 156 (sampled integrity audit)."""

from __future__ import annotations

import hashlib

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE


def test_sampled_audit_matches_python(spark):
    row = REGISTRY["pipeline_sampled_integrity_audit"].fn(spark, SF_SMOKE).collect()[0]
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").collect()
    picked = []
    for r in li:
        key = f"{r.l_orderkey}-{r.l_linenumber}"
        if int(hashlib.md5(key.encode()).hexdigest()[:4], 16) % 100 == 0:
            price = f"{round(r.l_extendedprice, 2):.2f}"
            rm = hashlib.md5(
                f"{r.l_orderkey}:{r.l_linenumber}:{int(r.l_quantity)}:{price}".encode()
            ).hexdigest()
            picked.append((r.l_orderkey, r.l_linenumber, rm, round(r.l_extendedprice, 2)))
    picked.sort(key=lambda x: (x[0], x[1], x[2]))
    assert row.n_sampled == len(picked)
    checksum = hashlib.md5("".join(p[2] for p in picked).encode()).hexdigest()
    assert row.sample_checksum == checksum
    assert abs(row.sample_revenue - round(sum(p[3] for p in picked), 2)) < 1e-6
    # a genuine ~1% sample
    assert 0.002 < len(picked) / len(li) < 0.05
