from news_ingestion_data_pipeline_spark.functions import scalars, text, vectors  # noqa: F401
