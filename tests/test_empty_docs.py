"""Empty / whitespace-only document robustness.

Spark's ``tokens('')`` is ``[]`` while a bare DuckDB
``regexp_split_to_array('', '\\s+')`` is ``['']`` (length 1) — the shipped
fixtures happen to contain zero empty docs, so every token-count oracle
was one regenerated fixture away from a spurious driver red. The oracles
now wrap splits in ``list_filter(..., _t -> _t <> '')``; this test proves
the full Spark-vs-oracle hash match survives a corpus that actually
CONTAINS an empty doc, a whitespace-only doc, and a tab/newline-only doc,
for a representative slice of the token-consuming query families.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from tests.conftest import SF_SMOKE

#: token-family queries whose spark/oracle pair must agree on empty docs:
#: whitespace stats, BPE-ish counting, normalized-token chunking, quality
#: rules, packing prefix-sums, exploded-token heavy hitters
QUERIES = [
    "text_token_stats",
    "curation_token_estimate",
    "curation_chunk_windows",
    "curation_quality_filter",
    "curation_pack_sequences",
    "agg_approx_top_k",
    "text_unigram_logprob",
]

EMPTYISH = ["", "   ", "\t\n \t"]


@pytest.fixture(scope="module")
def sf_with_empty_docs(spark, tmp_path_factory):
    """sf0.001 with three empty-ish documents appended (fresh doc_ids)."""
    out = str(tmp_path_factory.mktemp("sf_empty"))
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), os.path.join(out, f))
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    max_id = docs.agg({"doc_id": "max"}).collect()[0][0]
    extra = spark.createDataFrame(
        [
            (max_id + 1 + i, txt, "en", "synthetic", len(txt))
            for i, txt in enumerate(EMPTYISH)
        ],
        schema=docs.schema,
    )
    tgt = os.path.join(out, "documents.parquet")
    docs.unionByName(extra).coalesce(1).write.parquet(tgt + "_tmp")
    # driver/oracle read a single path; keep the same single-file layout
    part = [p for p in os.listdir(tgt + "_tmp") if p.endswith(".parquet")][0]
    shutil.move(os.path.join(tgt + "_tmp", part), tgt)
    shutil.rmtree(tgt + "_tmp")
    return out


@pytest.mark.parametrize("name", QUERIES)
def test_token_queries_survive_empty_docs(spark, sf_with_empty_docs, name):
    from mini_verify import frame_hash

    from news_ingestion_data_pipeline_spark.plans import REGISTRY
    from news_ingestion_data_pipeline_spark.tables import TABLE_NAMES

    q = REGISTRY[name]
    sdf = q.fn(spark, sf_with_empty_docs)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for tname in TABLE_NAMES:
        p = os.path.join(sf_with_empty_docs, f"{tname}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{p}')"
            )
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    tbl = res.fetch_arrow_table()
    cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    orows = list(zip(*cols)) if cols else []

    assert frame_hash(scols, srows) == frame_hash(ocols, orows), (
        f"{name}: spark/oracle diverge on a corpus containing empty docs "
        f"(spark {len(srows)} rows, oracle {len(orows)} rows)"
    )
