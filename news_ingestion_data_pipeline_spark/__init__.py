"""news_ingestion_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``NeerajBassi/news_ingestion_data_pipeline`` (incremental news-article ETL:
paginated sources, normalization, watermark-incremental filtering, keyed
dedup/upsert, temporal top-N) as an idiomatic Spark DataFrame/SQL library,
plus the generic relational operator surface and large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB-scale execution.

Layout:
    session     — SparkSession factory tuned for the target cluster profile
    tables      — loaders for the TPC-H-ish test corpus
    schemas     — canonical article schemas (reference parity)
    functions/  — scalar/text/vector column functions (built-in F.*, no UDFs
                  on the hot path)
    operators/  — DataFrame→DataFrame transforms (normalize, dedup, upsert,
                  watermark, top-N, similarity)
    plans/      — named query library wired into the driver contract
    sources/    — paginated-listing source framework (offline-testable)
    streaming/  — Structured Streaming variants (watermarks, windows)
"""

__version__ = "0.1.0"

from news_ingestion_data_pipeline_spark.session import get_spark  # noqa: F401
