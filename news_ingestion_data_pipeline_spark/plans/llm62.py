"""Sixty-second wave: categorical independence testing and the unified
dedup decision table.

agg_chi_square_independence adds the categorical member of the classical
test family (ANOVA compares k means; chi-square tests whether two
categorical factors are independent).  curation_dedup_decision is the
deliverable the whole dedup family feeds: ONE row per document with every
duplicate flag and the final keep/drop verdict plus its reason — what a
curation pipeline actually writes next to the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t


@register(
    "agg_chi_square_independence",
    oracle="""
WITH obs AS (
  SELECT event_type AS r, dayofweek(ts) AS c, COUNT(*) AS o
  FROM events GROUP BY 1, 2
), rows_ AS (SELECT r, SUM(o) AS nr FROM obs GROUP BY r),
cols AS (SELECT c, SUM(o) AS nc FROM obs GROUP BY c),
tot AS (SELECT SUM(o) AS n FROM obs),
cells AS (
  SELECT o.r, o.c, o.o,
         CAST(rw.nr AS DOUBLE) * cl.nc / t.n AS e
  FROM obs o JOIN rows_ rw USING (r) JOIN cols cl USING (c) CROSS JOIN tot t
), chi AS (
  SELECT SUM((o - e) * (o - e) / e) AS chi2,
         COUNT(*) AS n_cells
  FROM cells
)
SELECT round(chi.chi2, 6) AS chi2,
       CAST(((SELECT COUNT(*) FROM rows_) - 1)
            * ((SELECT COUNT(*) FROM cols) - 1) AS BIGINT) AS dof,
       round(sqrt(chi.chi2 / ((SELECT n FROM tot)
              * LEAST((SELECT COUNT(*) FROM rows_) - 1,
                      (SELECT COUNT(*) FROM cols) - 1))), 6) AS cramers_v,
       CAST((SELECT n FROM tot) AS BIGINT) AS n
FROM chi
""",
    description="Chi-square test of independence between event type and "
    "weekday (the full k x 7 contingency table): observed vs expected "
    "cell counts, the chi² statistic, its (r−1)(c−1) degrees of "
    "freedom, and Cramér's V effect size so a huge-N trivially-"
    "significant dependence isn't over-read — the categorical member "
    "of the classical-test family (events_anova_weekday compares "
    "means across the same factor; this tests the type-mix itself). "
    "Observed counts are exact integers; expected counts and the chi² "
    "sum are double arithmetic over the BOUNDED cell domain (k x 7 "
    "cells, the engine's bounded-domain determinism rule), never over "
    "rows. Shape: one partial-agg shuffle of the contingency cells, "
    "then margins and the statistic over a handful of rows.",
    tags=("agg", "stats", "events"),
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("event_type").alias("r"), F.dayofweek("ts").alias("c"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rows_ = obs.groupBy("r").agg(F.sum("o").alias("nr"))
    cols = obs.groupBy("c").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").alias("n"))
    nrows = rows_.agg(F.count(F.lit(1)).alias("n_r"))
    ncols = cols.agg(F.count(F.lit(1)).alias("n_c"))
    cells = (
        obs.join(F.broadcast(rows_), "r")
        .join(F.broadcast(cols), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            "o",
            (F.col("nr").cast("double") * F.col("nc") / F.col("n")).alias("e"),
            "n",
        )
    )
    chi = cells.agg(
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "chi2"
        ),
        F.first("n").alias("n"),
    )
    return (
        chi.crossJoin(F.broadcast(nrows))
        .crossJoin(F.broadcast(ncols))
        .select(
            F.round("chi2", 6).alias("chi2"),
            ((F.col("n_r") - 1) * (F.col("n_c") - 1)).cast("bigint").alias("dof"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.least(F.col("n_r") - 1, F.col("n_c") - 1))
                ),
                6,
            ).alias("cramers_v"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


def _dedup_decision_oracle() -> str:
    pairs = REGISTRY["dedup_ngram_jaccard"].oracle
    return f"""
WITH fp AS (
  SELECT doc_id, md5({SQL_NORM.format(col='text')}) AS f FROM documents
), keepers AS (
  SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f
), pairs AS ({pairs}),
near_losers AS (
  SELECT DISTINCT id_b AS doc_id FROM pairs
)
SELECT d.doc_id,
       CAST(fp.f <> '' AND k.keep_id <> d.doc_id AS BOOLEAN) AS exact_dup,
       CAST(nl.doc_id IS NOT NULL AS BOOLEAN) AS near_dup,
       CASE WHEN k.keep_id <> d.doc_id THEN 'drop:exact'
            WHEN nl.doc_id IS NOT NULL THEN 'drop:near'
            ELSE 'keep' END AS decision
FROM documents d
JOIN fp ON fp.doc_id = d.doc_id
JOIN keepers k ON k.f = fp.f
LEFT JOIN near_losers nl ON nl.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@register(
    "curation_dedup_decision",
    oracle=_dedup_decision_oracle(),
    description="The unified dedup decision table — ONE row per document "
    "with every duplicate flag and the final verdict: exact_dup (not "
    "the min-id keeper of its normalized-fingerprint group, "
    "dedup_exact_rows' rule), near_dup (the higher-id side of any "
    "verified n-gram-Jaccard pair, dedup_ngram_jaccard's exact "
    "construction reused, not re-derived), and a precedence-ordered "
    "decision string ('drop:exact' beats 'drop:near' beats 'keep') — "
    "this is the column a curation pipeline actually materializes next "
    "to the corpus, and the lineage answer to 'why was my document "
    "dropped'. Shape: the fingerprint pass is one hash-aggregate; the "
    "near-dup pair table is tiny and broadcast back as an existence "
    "flag; the verdict is a map-side CASE — the report costs no more "
    "than its inputs.",
    tags=("curation", "dedup", "llm"),
)
def curation_dedup_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX

    docs = t(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", TX.doc_fingerprint(F.col("text")).alias("f")
    )
    keepers = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    from news_ingestion_data_pipeline_spark.plans.llm import (
        ngram_jaccard_pairs_cached,
    )

    near_losers = (
        ngram_jaccard_pairs_cached(spark, sf_dir)
        .select(F.col("id_b").alias("nl_id"))
        .distinct()
    )
    return (
        fp.join(keepers, "f")
        # no broadcast hint: the near-dup loser set is corpus-proportional
        # on a mirrored-crawl corpus — let AQE pick broadcast when it fits
        .join(near_losers, fp["doc_id"] == F.col("nl_id"), "left_outer")
        .select(
            "doc_id",
            ((F.col("f") != "") & (F.col("keep_id") != F.col("doc_id"))).alias(
                "exact_dup"
            ),
            F.col("nl_id").isNotNull().alias("near_dup"),
            F.when(F.col("keep_id") != F.col("doc_id"), "drop:exact")
            .when(F.col("nl_id").isNotNull(), "drop:near")
            .otherwise("keep")
            .alias("decision"),
        )
        
    )
