"""``news_listing`` — a Spark Python Data Source for paginated article listings.

Re-expresses the reference's scan loop (reference:
PhocusWire/PhocusWireSource.py:96-212, Skift/SkiftSource.py:91-196) as a
DataSource V2 (Python API, Spark ≥4.0) emitting RAW_LISTING_SCHEMA rows;
normalization/filtering/dedup stay declarative downstream
(operators/normalize.py).

Scan pruning: the Python DS API has no filter pushdown, so the incremental
watermark arrives as a reader *option* (SURVEY.md §4.3) and the reader stops
paging at the first sub-watermark article exactly like the reference —
including its per-article control-flow quirks (missing-title/href and
in-run-duplicate rows never reach the date check, so they never trigger the
stop; rows at/after the stop row on the stop page are not emitted).

Parallelism: ONE partition per source host. Politeness (sequential pages,
inter-page sleep, one in-flight request per host) is a correctness
constraint of scraping; cluster parallelism comes from many sources, each
its own partition — union N sources and Spark runs N polite scans
concurrently.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from news_ingestion_data_pipeline_spark.sources.fetch import make_fetcher
from news_ingestion_data_pipeline_spark.sources.html_extract import extract_listing

#: DDL form of schemas.RAW_LISTING_SCHEMA (kept in sync by a unit test).
RAW_LISTING_DDL = (
    "raw_title string, raw_href string, raw_author string, "
    "raw_date string, source_name string, page_no int"
)

_DATE_KINDS = {"Phocuswire": "long_us", "Skift": "iso"}


def _parse_date_py(raw: str | None, kind: str) -> datetime | None:
    """Driver-side twin of functions.scalars.parse_news_date, used only for
    the scan-pruning decision inside the reader (the emitted column stays raw;
    typed parsing happens once, in the declarative layer)."""
    if raw is None:
        return None
    raw = raw.strip()
    try:
        if kind == "long_us":
            return datetime.strptime(raw, "%B %d, %Y")
        return datetime.fromisoformat(raw[:19])  # drop tz, keep wall clock
    except ValueError:
        return None


class PaginatedListingDataSource(DataSource):
    """Options:
        source        'Phocuswire' | 'Skift' (selects extractor + date kind)
        pages_dir     offline fixture transport (tests)
        url_template  polite HTTP transport, '{page}' placeholder
        watermark     ISO datetime string; stop paging below it (strict <)
        max_pages     safety cap (default 10000)
        + RetryPolicy knobs (max_retries, backoff_factor, timeout_s,
          min_delay_s, max_delay_s)
    """

    @classmethod
    def name(cls) -> str:
        return "news_listing"

    def schema(self) -> str:
        return RAW_LISTING_DDL

    def reader(self, schema) -> "ListingReader":
        return ListingReader(dict(self.options))


class ListingReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.source = options.get("source", "Skift")
        self.watermark = (
            datetime.fromisoformat(options["watermark"])
            if options.get("watermark")
            else None
        )
        self.max_pages = int(options.get("max_pages", 10000))

    def partitions(self):
        return [InputPartition(0)]

    def read(self, partition):
        fetcher = make_fetcher(self.options)
        date_kind = _DATE_KINDS[self.source]
        seen_hrefs: set[str] = set()
        for page_no in range(1, self.max_pages + 1):
            html = fetcher.fetch(page_no)
            if html is None:
                return  # fetch failure after retries / fixture exhausted
            rows = extract_listing(self.source, html, page_no)
            if not rows:
                return  # empty page → end of listing
            for r in rows:
                if (
                    r["raw_title"] is not None
                    and r["raw_href"] is not None
                    and r["raw_href"] not in seen_hrefs
                ):
                    seen_hrefs.add(r["raw_href"])
                    d = _parse_date_py(r["raw_date"], date_kind)
                    if d is not None and self.watermark and d < self.watermark:
                        return  # sub-watermark article → stop, don't emit it
                yield (
                    r["raw_title"],
                    r["raw_href"],
                    r["raw_author"],
                    r["raw_date"],
                    r["source_name"],
                    r["page_no"],
                )


_REGISTERED: set[int] = set()


def register_source(spark: SparkSession) -> None:
    key = id(spark)
    if key not in _REGISTERED:
        spark.dataSource.register(PaginatedListingDataSource)
        _REGISTERED.add(key)


def read_listing(
    spark: SparkSession,
    source: str,
    watermark: str | datetime | None = None,
    **options: str,
) -> DataFrame:
    """`spark.read.format('news_listing')` with typed convenience args."""
    register_source(spark)
    reader = spark.read.format("news_listing").option("source", source)
    if watermark is not None:
        wm = watermark.isoformat() if isinstance(watermark, datetime) else watermark
        reader = reader.option("watermark", wm)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    return reader.load()
