"""Named query library — the driver-contract surface.

Importing this package populates ``REGISTRY`` with every implemented query:
each entry pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle string for
DuckDB. Column names/aliases match exactly between the two.
"""

from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, Query  # noqa: F401
from news_ingestion_data_pipeline_spark.plans import (  # noqa: F401
    curation,
    llm,
    llm2,
    llm3,
    llm4,
    llm5,
    llm6,
    llm7,
    llm8,
    llm9,
    llm10,
    llm11,
    llm12,
    llm13,
    llm14,
    llm15,
    llm16,
    llm17,
    llm18,
    llm19,
    llm20,
    llm21,
    llm22,
    llm23,
    llm24,
    llm25,
    llm26,
    llm27,
    llm28,
    llm29,
    llm30,
    llm31,
    llm32,
    llm33,
    llm34,
    llm35,
    llm36,
    pipeline,
    relational,
    relational_ext,
    relational_ext3,
    relational_ext4,
    relational_ext5,
    relational_ext6,
    sqlapi,
    storage,
    storage2,
    windows,
)
