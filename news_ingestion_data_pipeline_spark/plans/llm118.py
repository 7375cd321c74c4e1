"""Hundred-eighteenth wave: weighted MinHash — term-frequency-aware
near-duplicate detection.

Binary MinHash treats "spark spark spark join" and "spark join join
join" as the same set; weighted Jaccard does not.  The deterministic,
oracle-able construction is the classic integer-weight expansion: a
term with count c becomes c distinct virtual elements term#1..term#c
(capped), and plain MinHash over the expanded multiset estimates
weighted Jaccard exactly in expectation — no RNG, no CWS exponentials,
and the whole existing signature/banding machinery applies verbatim.

  * dedup_weighted_minhash — banded-LSH candidate pairs over the
    weight-expanded token multiset (32 perms, 8 bands).
  * dedup_weighted_jaccard_verified — exact integer weighted-Jaccard
    verification of those candidates: sum-of-min over shared terms vs
    sum-of-max over the union, all BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import normalize_text, tokens
from news_ingestion_data_pipeline_spark.operators import dedup as DD
from news_ingestion_data_pipeline_spark.plans.oracle_sqlgen import (
    _band_union,
    _CAND_JOIN,
    _sig_cols,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.operators.dedup import _MINHASH_P

_CAP = 8  # weight-expansion cap: a term contributes at most 8 elements

_TC_CTE = f"""tc AS (
  SELECT doc_id AS id, term, COUNT(*) AS c FROM (
    SELECT doc_id,
           unnest(list_filter(
             regexp_split_to_array({SQL_NORM.format(col='text')}, '\\s+'),
             _t -> _t <> '')) AS term
    FROM documents
  ) GROUP BY doc_id, term
)"""


def _weighted_xrows() -> str:
    return f"""xrows AS (
  SELECT id,
         CAST('0x' || substr(md5(term || '#' || CAST(k AS VARCHAR)), 1, 8)
              AS BIGINT) % {_MINHASH_P} AS x
  FROM tc, LATERAL (SELECT unnest(range(1, LEAST(c, {_CAP}) + 1)) AS k)
)"""


def _weighted_candidates_oracle(num_hashes: int = 32, bands: int = 8) -> str:
    return f"""WITH {_TC_CTE},
{_weighted_xrows()},
sig AS (
  SELECT id,
    {_sig_cols(num_hashes)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(num_hashes, bands)}
), {_CAND_JOIN}
SELECT id_a, id_b, CAST(n_bands_matched AS BIGINT) AS n_bands_matched
FROM cand WHERE n_bands_matched >= 3 ORDER BY id_a, id_b"""


def _weighted_elements(docs: DataFrame) -> DataFrame:
    """(id, x) weight-expanded 32-bit element hashes, ready for the
    shared signature aggregate."""
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread: tokenize + md5-per-virtual-element is compute-heavy; a
    # single-row-group scan would serialize it to one task
    docs = spread(docs)
    tc = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens(normalize_text(F.col("text")))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tc.select(
        "id",
        F.explode(
            F.sequence(F.lit(1), F.least(F.col("c"), F.lit(_CAP)))
        ).alias("k"),
        "term",
    ).select(
        "id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("term"), F.lit("#"), F.col("k"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % F.lit(_MINHASH_P)
        ).alias("shingle_hash"),
    )


@register(
    "dedup_weighted_minhash",
    oracle=_weighted_candidates_oracle(),
    description="Weighted-MinHash LSH candidates: each term expands into "
    f"count-many virtual elements term#1..term#c (capped at {_CAP}), and "
    "the standard 32-permutation / 8-band machinery over the expanded "
    "multiset estimates WEIGHTED Jaccard — so a doc that repeats 'spark' "
    "50 times no longer collides with one that mentions it once. "
    "Deterministic by construction (the expansion replaces CWS's "
    "exponential draws; no RNG anywhere), which is what makes the "
    "32-permutation oracle replay possible. Scale shape identical to "
    "dedup_minhash_candidates: the expansion multiplies the exploded "
    "term table by the capped weight BEFORE the signature aggregate, "
    "signatures stay 32 longs/doc, shuffle stays O(docs x bands).",
    tags=("dedup", "llm"),
)
def dedup_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_band_candidates_cached(spark, sf_dir).select(
        "id_a",
        "id_b",
        F.col("n_bands_matched").cast("bigint").alias("n_bands_matched"),
    )


#: (applicationId, sf_dir) -> localCheckpointed weighted-LSH candidates
_WB_CACHE: dict[tuple[str, str], DataFrame] = {}


def weighted_band_candidates_cached(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Banded-LSH candidate pairs over the weight-expanded token
    multiset (32 perms, 8 bands, >= 3 bands matched),
    localCheckpointed once per (SparkContext, sf_dir): the verified
    query consumes the SAME candidate table instead of recomputing
    signatures + banding end-to-end — the artifact-reuse pattern of
    ngram_jaccard_pairs_cached applied to the weighted family. The
    candidate table is threshold-filtered and tiny next to the
    corpus; a restarted SparkContext recomputes."""
    from news_ingestion_data_pipeline_spark.plans import artifact_cache

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _WB_CACHE.get(key)
    artifact_cache.record("weighted_band_candidates", df is not None)
    if df is None:
        sigs = DD.minhash_signatures_from_hashes(
            _weighted_elements(t(spark, sf_dir, "documents")),
            num_hashes=32,
        )
        df = (
            DD.lsh_band_pairs(sigs, num_hashes=32, bands=8)
            .filter(F.col("n_bands_matched") >= 3)
            .localCheckpoint()
        )
        _WB_CACHE[key] = df
    return df


@register(
    "dedup_weighted_jaccard_verified",
    oracle=f"""WITH {_TC_CTE},
{_weighted_xrows()},
sig AS (
  SELECT id,
    {_sig_cols(32)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(32, 8)}
), {_CAND_JOIN},
tot AS (
  SELECT id, SUM(c) AS sz FROM tc GROUP BY id
),
inter AS (
  SELECT cd.id_a, cd.id_b, cd.n_bands_matched,
         SUM(LEAST(ta.c, tb.c)) AS wmin
  FROM cand cd
  JOIN tc ta ON ta.id = cd.id_a
  JOIN tc tb ON tb.id = cd.id_b AND tb.term = ta.term
  WHERE cd.n_bands_matched >= 3
  GROUP BY cd.id_a, cd.id_b, cd.n_bands_matched
)
SELECT i.id_a, i.id_b,
       CAST(i.n_bands_matched AS BIGINT) AS n_bands_matched,
       CAST(i.wmin AS BIGINT) AS wmin,
       CAST(sa.sz + sb.sz - i.wmin AS BIGINT) AS wmax,
       CAST((1000 * i.wmin) // (sa.sz + sb.sz - i.wmin) AS BIGINT)
         AS wjaccard_milli
FROM inter i
JOIN tot sa ON sa.id = i.id_a
JOIN tot sb ON sb.id = i.id_b
WHERE (1000 * i.wmin) // (sa.sz + sb.sz - i.wmin) >= 550
ORDER BY id_a, id_b""",
    description="Exact weighted-Jaccard verification of the weighted-"
    "MinHash candidates: J_w = Σ min(c_a,c_b) / Σ max(c_a,c_b) computed "
    "in pure BIGINT arithmetic (Σmax = sz_a + sz_b - Σmin), kept at "
    "J_w >= 0.55 via the integer inequality (1000·wmin) div wmax >= 550 — "
    "no float ever enters, so the verdict set is bit-exact. The "
    "candidate-then-verify composition mirrors dedup_minhash_verified "
    "with UNCAPPED true weights on the verify side (the cap only bounds "
    "the LSH expansion). Scale shape: the verify join touches only "
    "candidate pairs' term rows — candidates gate the expensive exact "
    "pass exactly as at 100 TB.",
    tags=("dedup", "llm"),
)
def dedup_weighted_jaccard_verified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tc = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(tokens(normalize_text(F.col("text")))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # reused: totals and both verify sides
    )
    # the candidate table is the SAME construction dedup_weighted_minhash
    # materialized — reuse the checkpointed artifact, don't recompute
    # signatures + banding
    cand = weighted_band_candidates_cached(spark, sf_dir)
    tot = tc.groupBy("id").agg(F.sum("c").alias("sz"))
    ta, tb = tc.alias("ta"), tc.alias("tb")
    inter = (
        cand.alias("cd")
        .join(ta, F.col("ta.id") == F.col("cd.id_a"))
        .join(
            tb,
            (F.col("tb.id") == F.col("cd.id_b"))
            & (F.col("tb.term") == F.col("ta.term")),
        )
        .groupBy("cd.id_a", "cd.id_b", "cd.n_bands_matched")
        .agg(F.sum(F.least("ta.c", "tb.c")).alias("wmin"))
    )
    sa = tot.select(F.col("id").alias("id_a"), F.col("sz").alias("sza"))
    sb = tot.select(F.col("id").alias("id_b"), F.col("sz").alias("szb"))
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_bands_matched").cast("bigint").alias("n_bands_matched"),
            F.col("wmin").cast("bigint").alias("wmin"),
            (F.col("sza") + F.col("szb") - F.col("wmin"))
            .cast("bigint")
            .alias("wmax"),
            F.expr("CAST((1000 * wmin) div (sza + szb - wmin) AS BIGINT)").alias(
                "wjaccard_milli"
            ),
        )
    )
    return scored.filter(F.col("wjaccard_milli") >= 550)
