"""Invariants for wave 105 (dynamic partition overwrite, null-skew split)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from news_ingestion_data_pipeline_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from news_ingestion_data_pipeline_spark.scratch import scratch_root


def test_dynamic_overwrite_touches_only_en(spark):
    rows = REGISTRY["storage_dynamic_partition_overwrite"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0])
    for d in docs:
        per[d.lang][0] += 1
        per[d.lang][1] += d.doc_id
    assert {r.lang: (r.n_rows, r.sum_ids) for r in rows} == {
        k: tuple(v) for k, v in per.items()
    }
    for r in rows:
        assert r.rewritten == (r.lang == "en")
        assert r.n_new == (r.n_rows if r.lang == "en" else 0)
    # en partition content really is the new version on disk
    sfx = hashlib.md5(SF_SMOKE.encode()).hexdigest()[:8]
    path = f"{scratch_root('llm105')}/dyn_{sfx}"
    from pyspark.sql import functions as F

    vs = {
        r.lang: r.versions
        for r in spark.read.parquet(path)
        .groupBy("lang")
        .agg(F.collect_set("version").alias("versions"))
        .collect()
    }
    assert vs["en"] == ["new"]
    assert all(v == ["old"] for k, v in vs.items() if k != "en")


def test_null_skew_split_matches_plain_outer_join(spark):
    rows = REGISTRY["join_null_skew_split"].fn(spark, SF_SMOKE).collect()
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    want = defaultdict(lambda: [0, 0, 0.0])
    for o in orders:
        code = (
            f"PROMO{o.o_orderkey % 5}" if o.o_orderkey % 37 == 0 else "none"
        )
        want[code][0] += 1
        if code == "none":
            want[code][1] += 1
        want[code][2] += round(o.o_totalprice, 2)
    assert {r.promo_code for r in rows} == set(want)
    for r in rows:
        n, unmatched, rev = want[r.promo_code]
        assert (r.n_orders, r.n_unmatched) == (n, unmatched)
        assert abs(r.revenue - rev) < 1e-4
        if r.promo_code.startswith("PROMO"):
            assert r.discount_pct == int(r.promo_code[-1]) * 5
        else:
            assert r.discount_pct is None
    # the null mass dominates — the thing the split keeps out of the shuffle
    none_row = next(r for r in rows if r.promo_code == "none")
    assert none_row.n_orders > sum(
        r.n_orders for r in rows if r.promo_code != "none"
    )
