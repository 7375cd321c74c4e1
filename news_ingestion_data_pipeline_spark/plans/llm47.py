"""Forty-seventh wave: canary-string leak scanning — the exact-match
complement of n-gram decontamination (labs plant canary strings in eval
sets precisely so this scan can prove a training corpus never saw them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# deterministic "canaries": token sequences lifted from fixed eval docs
# (doc_id % 59 == 7), words 5-8 — guaranteed present so the scan has
# positives to prove itself on, like a planted-canary drill
_CANARY_DOCS_MOD = 59
_CANARY_DOCS_REM = 7


@register(
    "curation_canary_scan",
    oracle=f"""
WITH canaries AS (
  SELECT doc_id AS canary_id,
         array_to_string(string_split(text, ' ')[5:8], ' ') AS canary
  FROM documents
  WHERE doc_id % {_CANARY_DOCS_MOD} = {_CANARY_DOCS_REM}
    AND len(string_split(text, ' ')) >= 8
), hits AS (
  SELECT c.canary_id, c.canary, d.doc_id
  FROM canaries c JOIN documents d
    ON position(c.canary IN d.text) > 0
)
SELECT canary_id, canary,
       CAST(COUNT(*) AS BIGINT) AS n_docs_hit,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(SUM(doc_id) AS BIGINT) AS hit_id_sum
FROM hits
GROUP BY canary_id, canary
ORDER BY canary_id
""",
    description="Canary-string leak scan: exact substring search of a "
    "small planted-canary list against every document — the drill that "
    "proves an eval set's canary GUIDs never leaked into training data "
    "(exact match, not n-gram overlap: canaries are designed to be "
    "unambiguous, so this complements curation_decontaminate's fuzzy "
    "gram matching). The canary list here is deterministically lifted "
    "from fixed eval docs so the scan demonstrably finds its positives; "
    "output fingerprints the exact hit set per canary. Shape: the "
    "canary list is broadcast (it is always tiny) and the corpus "
    "streams through a contains() predicate map-side — no shuffle of "
    "documents; at 100 TB with thousands of canaries you'd Aho-Corasick "
    "them into one automaton per task, same broadcast shape.",
    tags=("curation", "llm", "text"),
)
def curation_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    canaries = (
        docs.where(
            (F.col("doc_id") % _CANARY_DOCS_MOD == _CANARY_DOCS_REM)
            & (F.size(toks) >= 8)
        )
        .select(
            F.col("doc_id").alias("canary_id"),
            F.array_join(F.slice(toks, 5, 4), " ").alias("canary"),
        )
    )
    hits = docs.join(
        F.broadcast(canaries),
        F.expr("position(canary IN text)") > 0,
    )
    return (
        hits.groupBy("canary_id", "canary")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_hit"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.sum("doc_id").cast("bigint").alias("hit_id_sum"),
        )
        
    )
