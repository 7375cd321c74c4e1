from news_ingestion_data_pipeline_spark.operators import (  # noqa: F401
    dedup,
    normalize,
    similarity,
    topn,
    upsert,
    watermark,
)
