"""Paginated-listing source framework.

    html_extract — stdlib-only mini-DOM + CSS-lite selectors + per-source
                   listing extractors (the reference's BeautifulSoup logic,
                   dependency-free)
    fetch        — retrying/backoff HTTP fetcher + offline fixture fetcher
    listing      — Spark Python Data Source emitting RAW_LISTING_SCHEMA rows
                   with watermark scan-pruning
"""

from news_ingestion_data_pipeline_spark.sources.html_extract import (  # noqa: F401
    EXTRACTORS,
    extract_listing,
)
from news_ingestion_data_pipeline_spark.sources.listing import (  # noqa: F401
    PaginatedListingDataSource,
    read_listing,
)
