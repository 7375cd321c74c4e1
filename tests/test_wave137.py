"""Invariants for wave 137 (energy distance, gzip JSONL)."""

from __future__ import annotations

from collections import Counter
from decimal import Decimal

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from news_ingestion_data_pipeline_spark.scratch import scratch_root


def test_energy_distance_matches_quadratic_python(spark):
    row = REGISTRY["agg_energy_distance"].fn(spark, SF_SMOKE).collect()[0]
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    xs = [
        Decimal(str(round(o.o_totalprice, 2)))
        for o in orders
        if o.o_orderpriority == "1-URGENT"
    ]
    ys = [
        Decimal(str(round(o.o_totalprice, 2)))
        for o in orders
        if o.o_orderpriority == "5-LOW"
    ]
    assert (row.n_x, row.n_y) == (len(xs), len(ys))
    sxy = sum(abs(a - b) for a in xs for b in ys)
    sxx = sum(
        abs(xs[i] - xs[j]) for i in range(len(xs)) for j in range(i + 1, len(xs))
    )
    syy = sum(
        abs(ys[i] - ys[j]) for i in range(len(ys)) for j in range(i + 1, len(ys))
    )
    expect = (
        2.0 * float(sxy) / (len(xs) * len(ys))
        - 2.0 * float(sxx) / (len(xs) ** 2)
        - 2.0 * float(syy) / (len(ys) ** 2)
    )
    assert abs(row.energy_distance - expect) < 1e-6
    # energy distance is nonnegative for real distributions
    assert row.energy_distance >= -1e-9


def test_gzip_jsonl_roundtrip(spark):
    rows = REGISTRY["scan_gzip_jsonl"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    counts = Counter(d.lang for d in docs)
    assert {r.lang: r.n_rows for r in rows} == dict(counts)
    import glob
    import hashlib

    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    files = glob.glob(f"{scratch_root('llm137')}/gz_{sfx}/part-*.jsonl.gz")
    assert files
    import gzip
    import json

    n = 0
    for f in files:
        with gzip.open(f, "rt") as fh:
            for line in fh:
                rec = json.loads(line)
                assert set(rec) == {"doc_id", "lang", "text"}
                n += 1
    assert n == len(docs)
