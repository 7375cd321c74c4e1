"""End-to-end incremental ingestion run — the reference's driver notebook
(reference: ingestion.ipynb cell 3) as one function:

    1. watermark scan on the sink        (operators/watermark.py, S7)
    2. polite paginated scans, one per source, unioned by name (U1)
    3. normalize → cutoff → dedup → finalize (operators/normalize.py)
    4. keyed MERGE upsert into the articles table (operators/upsert.py, K1)
    5. top-N latest answer (operators/topn.py, T1)

The watermark is both *declared* (the strict-< filter in normalize, exact
semantics) and *pushed* (reader option → the source stops paging early,
scan pruning). Sources run as independent single-partition scans, so two
sources scan concurrently — strictly better than the reference's
sequential drain of Skift then PhocusWire.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from news_ingestion_data_pipeline_spark.operators import (
    normalize,
    topn,
    upsert,
    watermark as wm_ops,
)
from news_ingestion_data_pipeline_spark.schemas import DEFAULT_WATERMARK
from news_ingestion_data_pipeline_spark.sources.listing import read_listing


@dataclass
class SourceSpec:
    """One paginated listing to scan; options go to the data source
    (pages_dir for offline fixtures, url_template for live HTTP)."""

    source: str  # 'Skift' | 'Phocuswire'
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class IngestReport:
    watermark: str
    is_incremental: bool
    rows_upserted: int
    top_articles: DataFrame


def run_ingestion(
    spark: SparkSession,
    sources: list[SourceSpec],
    table_path: str,
    top_n: int = 5,
    default_watermark: str = DEFAULT_WATERMARK,
) -> IngestReport:
    target = upsert.read_articles(spark, table_path)
    wm, is_incremental = wm_ops.latest_news_time(target, default_watermark)

    raw: DataFrame | None = None
    for spec in sources:
        part = read_listing(spark, spec.source, watermark=wm, **spec.options)
        raw = part if raw is None else raw.unionByName(part)
    if raw is None:
        raise ValueError("no sources given")

    batch = normalize.normalize_pipeline(raw, watermark=wm)
    n = batch.count()
    if n:
        upsert.upsert_articles(spark, table_path, batch)

    articles = upsert.read_articles(spark, table_path)
    return IngestReport(
        watermark=wm.isoformat(),
        is_incremental=is_incremental,
        rows_upserted=n,
        top_articles=topn.top_n_articles_presented(articles, top_n),
    )
