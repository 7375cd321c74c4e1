"""Raw scraped-listing records → canonical article rows.

Re-expresses the per-article extraction/filter/normalize logic both reference
scrapers duplicate (reference: PhocusWire/PhocusWireSource.py:131-201,
Skift/SkiftSource.py:126-185) as one declarative DataFrame transform:

    F1  missing-title drop          F.col('raw_title').isNotNull()
    F2  missing-href drop           F.col('raw_href').isNotNull()
    P2  href absolutization         per-source base URL concat
    P3  author 'By ' prefix strip   regexp_replace
    X2  per-source date parse       try_to_timestamp (NULL on failure)
    X1  md5 article id              F.md5(News_link)
    F3  incremental cutoff          ts IS NULL OR ts >= watermark  (strict <
                                    drop: boundary rows re-ingested by design)
    F4  in-batch dedup              first-seen-wins by Article_id

Everything is built-in Catalyst expressions → at 100 TB this is a single
scan-project-filter stage plus one hash-aggregate for the dedup; filters
push into the source scan.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import scalars
from news_ingestion_data_pipeline_spark.schemas import SOURCE_CONFIGS


def normalize_listing(raw: DataFrame) -> DataFrame:
    """RAW_LISTING_SCHEMA rows → canonical (un-deduped, un-filtered) articles.

    Applies F1/F2 row drops, per-source href/date/author normalization and
    the md5 key. Keeps ``page_no`` + a ``row_seq`` ordering column so the
    reference's first-seen-wins dedup is reproducible.
    """
    df = raw.filter(F.col("raw_title").isNotNull() & F.col("raw_href").isNotNull())

    # Per-source branches as CASE expressions — one pass, no per-source jobs.
    href = F.col("raw_href")
    date_parsed = F.lit(None).cast("timestamp")
    for source, cfg in SOURCE_CONFIGS.items():
        href = F.when(
            F.col("source_name") == source,
            scalars.absolutize_href(F.col("raw_href"), cfg["base_url"]),
        ).otherwise(href)
        date_parsed = F.when(
            F.col("source_name") == source,
            scalars.parse_news_date(F.col("raw_date"), cfg["date_kind"]),
        ).otherwise(date_parsed)

    return df.select(
        scalars.article_id(href).alias("Article_id"),
        href.alias("News_link"),
        F.trim(F.col("raw_title")).alias("News_title"),
        scalars.strip_author_prefix(F.col("raw_author")).alias("Author_name"),
        date_parsed.alias("News_published_time"),
        F.col("source_name").alias("Source_name"),
        F.col("page_no"),
    )


def apply_incremental_cutoff(
    articles: DataFrame, watermark: datetime | str | None
) -> DataFrame:
    """F3 — keep rows with NULL timestamp or ts >= watermark (strict-<
    drop). The reference *stops scanning* at the first older article; the
    declarative filter has identical output semantics, and scan pruning is
    the source's job (sources/listing.py)."""
    if watermark is None:
        return articles
    wm = F.lit(watermark).cast("timestamp")
    ts = F.col("News_published_time")
    return articles.filter(ts.isNull() | (ts >= wm))


def dedup_first_seen(articles: DataFrame) -> DataFrame:
    """F4 — in-batch dedup by Article_id, first-seen-wins.

    The reference's ``seen_article_ids`` set keeps the *first* occurrence in
    scan order (page order, then document order). Reproduced with a
    row_number window over (page_no, monotonic id) when ordering columns are
    present; falls back to ``dropDuplicates`` (any-wins) otherwise.
    """
    if "page_no" in articles.columns:
        ordered = articles.withColumn("_seq", F.monotonically_increasing_id())
        w = Window.partitionBy("Article_id").orderBy(
            F.col("page_no").asc_nulls_last(), F.col("_seq")
        )
        return (
            ordered.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_seq")
        )
    return articles.dropDuplicates(["Article_id"])


def finalize_articles(articles: DataFrame) -> DataFrame:
    """Project to the 7-column canonical schema, stamping Processed_at."""
    return articles.select(
        "Article_id",
        "News_link",
        "News_title",
        "Author_name",
        "News_published_time",
        "Source_name",
        F.current_timestamp().alias("Processed_at"),
    )


def normalize_pipeline(
    raw: DataFrame, watermark: datetime | str | None = None
) -> DataFrame:
    """Full raw→canonical batch: normalize → cutoff → dedup → finalize."""
    return finalize_articles(
        dedup_first_seen(apply_incremental_cutoff(normalize_listing(raw), watermark))
    )
