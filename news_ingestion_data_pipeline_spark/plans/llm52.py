"""Fifty-second wave: distribution-drift monitoring (PSI, two-sample KS)
and corpus provenance diagnostics (near-dup rate by source pair).

PSI and KS are the two standard production drift detectors a feature
pipeline runs between a reference window and a live window; the KS
statistic here is EXACT (the max ECDF gap is maximized over an integer
numerator — no floating-point argmax ambiguity).  The source-pair near-dup
matrix answers the corpus-curation question "which sources mirror each
other" by joining the engine's own verified near-dup pairs back to
provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t

# ---------------------------------------------------------------------------
# PSI (population stability index) between two halves of the month
# ---------------------------------------------------------------------------

_PSI_BINS = 10


@register(
    "events_psi_drift",
    oracle=f"""
WITH stats AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi,
         COUNT(*) FILTER (WHERE day(ts) <= 15) AS na,
         COUNT(*) FILTER (WHERE day(ts) > 15) AS nb
  FROM events
), binned AS (
  SELECT LEAST(CAST(floor((value - s.lo) / ((s.hi - s.lo) / {_PSI_BINS}))
               AS BIGINT), {_PSI_BINS - 1}) AS bin,
         day(ts) <= 15 AS in_a
  FROM events CROSS JOIN stats s
), counts AS (
  SELECT bin,
         COUNT(*) FILTER (WHERE in_a) AS ca,
         COUNT(*) FILTER (WHERE NOT in_a) AS cb
  FROM binned GROUP BY bin
), grid AS (
  SELECT UNNEST(range({_PSI_BINS})) AS bin
)
SELECT g.bin,
       round(s.lo + g.bin * ((s.hi - s.lo) / {_PSI_BINS}), 6) AS bin_lo,
       round(s.lo + (g.bin + 1) * ((s.hi - s.lo) / {_PSI_BINS}), 6) AS bin_hi,
       CAST(COALESCE(c.ca, 0) AS BIGINT) AS n_ref,
       CAST(COALESCE(c.cb, 0) AS BIGINT) AS n_live,
       round((CAST(COALESCE(c.cb, 0) + 1 AS DOUBLE) / (s.nb + {_PSI_BINS})
              - CAST(COALESCE(c.ca, 0) + 1 AS DOUBLE) / (s.na + {_PSI_BINS}))
             * round(ln((CAST(COALESCE(c.cb, 0) + 1 AS DOUBLE) / (s.nb + {_PSI_BINS}))
                        / (CAST(COALESCE(c.ca, 0) + 1 AS DOUBLE) / (s.na + {_PSI_BINS}))),
                     9), 6) AS psi_contrib
FROM grid g
LEFT JOIN counts c ON c.bin = g.bin
CROSS JOIN stats s
ORDER BY g.bin
""",
    description=f"Population stability index between the month's reference "
    f"half (days 1-15) and live half over {_PSI_BINS} equal-width value "
    "bins — the industry-standard feature-drift monitor (PSI > 0.25 = "
    "retrain). Per-bin contributions (p_live − p_ref)·ln(p_live/p_ref) "
    "with add-one smoothing so empty bins stay finite; summing the "
    "column gives the index. Physical shape: ONE pass computes the "
    "global min/max/count frame (1 row, broadcast), a second pass bins "
    "and counts both periods together (single partial-agg shuffle of "
    f"{_PSI_BINS} groups), and the generated bin grid left-joins so "
    "empty bins are reported — at 100 TB this is two scans and a "
    "10-row join, and the reference frame is what you persist between "
    "monitoring runs. ln rounded to 9 dp per the engine's determinism "
    "contract.",
    tags=("events", "stats", "monitoring"),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    in_a = F.dayofmonth("ts") <= 15
    stats = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.when(in_a, 1)).alias("na"),
        F.count(F.when(~in_a, 1)).alias("nb"),
    )
    width = (F.col("hi") - F.col("lo")) / _PSI_BINS
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("bigint"),
            F.lit(_PSI_BINS - 1).cast("bigint"),
        ).alias("bin"),
        in_a.alias("in_a"),
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("ca"),
        F.count(F.when(~F.col("in_a"), 1)).alias("cb"),
    )
    grid = stats.select(
        F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        "lo",
        "hi",
        "na",
        "nb",
    )
    ca = F.coalesce(F.col("ca"), F.lit(0))
    cb = F.coalesce(F.col("cb"), F.lit(0))
    pa = (ca + 1).cast("double") / (F.col("na") + _PSI_BINS)
    pb = (cb + 1).cast("double") / (F.col("nb") + _PSI_BINS)
    return (
        grid.join(counts, "bin", "left_outer")
        .select(
            "bin",
            F.round(F.col("lo") + F.col("bin") * width, 6).alias("bin_lo"),
            F.round(F.col("lo") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
            ca.cast("bigint").alias("n_ref"),
            cb.cast("bigint").alias("n_live"),
            F.round((pb - pa) * F.round(F.log(pb / pa), 9), 6).alias("psi_contrib"),
        )
        
    )


# ---------------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------


@register(
    "agg_ks_two_sample",
    oracle="""
WITH tagged AS (
  SELECT value, day(ts) <= 15 AS in_a FROM events
), n AS (
  SELECT COUNT(*) FILTER (WHERE in_a) AS n1,
         COUNT(*) FILTER (WHERE NOT in_a) AS n2
  FROM tagged
), per_value AS (
  SELECT value,
         COUNT(*) FILTER (WHERE in_a) AS c1,
         COUNT(*) FILTER (WHERE NOT in_a) AS c2
  FROM tagged GROUP BY value
), cum AS (
  SELECT value,
         SUM(c1) OVER w AS cum1,
         SUM(c2) OVER w AS cum2
  FROM per_value
  WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), gaps AS (
  SELECT value, abs(cum1 * n.n2 - cum2 * n.n1) AS num, n.n1, n.n2
  FROM cum CROSS JOIN n
), best AS (
  SELECT value, num, n1, n2,
         ROW_NUMBER() OVER (ORDER BY num DESC, value) AS rn
  FROM gaps
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       round(CAST(num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_stat,
       round(value, 6) AS at_value,
       round(1.358 * sqrt((n1 + CAST(n2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) * n2)), 6)
         AS critical_05,
       CAST(CAST(num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
            > 1.358 * sqrt((n1 + CAST(n2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) * n2))
            AS BOOLEAN) AS reject_05
FROM best WHERE rn = 1
""",
    description="EXACT two-sample Kolmogorov-Smirnov test between the "
    "month's two halves: D = max |ECDF₁ − ECDF₂| over the pooled value "
    "domain, with the argmax taken over the INTEGER numerator "
    "|cum₁·n₂ − cum₂·n₁| so the maximizing value is unambiguous (no "
    "floating-point tie hazard) and only the final two divisions are "
    "IEEE. The nonparametric drift detector that, unlike PSI "
    "(events_psi_drift), needs no binning choice. Shape: per-value "
    "counts are one partial-agg shuffle; the ECDF prefix sum runs as "
    "the two-pass range-partitioned prefix sum (operators/ranking.py: "
    "value-range buckets, per-bucket totals broadcast as offsets) and "
    "the argmax is a global top-1 — TakeOrderedAndProject, never a "
    "rank window; no single-partition stage at any SF. "
    "Kolmogorov critical value at α=0.05 (c=1.358) reported alongside.",
    tags=("agg", "stats", "monitoring"),
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = t(spark, sf_dir, "events").select(
        "value", (F.dayofmonth("ts") <= 15).alias("in_a")
    )
    n = tagged.agg(
        F.count(F.when(F.col("in_a"), 1)).alias("n1"),
        F.count(F.when(~F.col("in_a"), 1)).alias("n2"),
    )
    per_value = tagged.groupBy("value").agg(
        F.count(F.when(F.col("in_a"), 1)).alias("c1"),
        F.count(F.when(~F.col("in_a"), 1)).alias("c2"),
    )
    venv = per_value.agg(F.min("value").alias("vlo"), F.max("value").alias("vhi"))
    cum = RK.distributed_prefix_sum(
        per_value.crossJoin(F.broadcast(venv)),
        ["value"],
        RK.range_bucket(F.col("value"), F.col("vlo"), F.col("vhi")),
        ["c1", "c2"],
        inclusive=True,
        prefix="cum",
    ).select("value", F.coalesce("cumc1", F.lit(0)).alias("cum1"),
             F.coalesce("cumc2", F.lit(0)).alias("cum2"))
    gaps = cum.crossJoin(F.broadcast(n)).select(
        "value",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias("num"),
        "n1",
        "n2",
    )
    # argmax = global top-1: TakeOrderedAndProject, never a rank window
    best = gaps.orderBy(F.col("num").desc(), F.col("value")).limit(1)
    ks = F.col("num").cast("double") / (F.col("n1").cast("double") * F.col("n2"))
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2").cast("double"))
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return best.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(ks, 6).alias("ks_stat"),
        F.round("value", 6).alias("at_value"),
        F.round(crit, 6).alias("critical_05"),
        (ks > crit).alias("reject_05"),
    )


# ---------------------------------------------------------------------------
# Near-dup rate by source pair (provenance diagnostics)
# ---------------------------------------------------------------------------


def _neardup_by_source_oracle() -> str:
    pairs = REGISTRY["dedup_ngram_jaccard"].oracle
    return f"""
WITH pairs AS ({pairs}),
tot AS (SELECT COUNT(*) AS total_pairs FROM pairs),
labeled AS (
  SELECT LEAST(da.source, db.source) AS source_lo,
         GREATEST(da.source, db.source) AS source_hi,
         da.source = db.source AS within_source,
         p.jaccard
  FROM pairs p
  JOIN documents da ON da.doc_id = p.id_a
  JOIN documents db ON db.doc_id = p.id_b
)
SELECT source_lo, source_hi, within_source,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(CAST(CAST(SUM(CAST(jaccard AS DECIMAL(10,6))) AS VARCHAR) AS DOUBLE)
             / COUNT(*), 6) AS avg_jaccard,
       round(CAST(COUNT(*) AS DOUBLE) / t.total_pairs, 6) AS pair_share
FROM labeled CROSS JOIN tot t
GROUP BY source_lo, source_hi, within_source, t.total_pairs
ORDER BY source_lo, source_hi
"""


@register(
    "curation_neardup_by_source",
    oracle=_neardup_by_source_oracle(),
    description="Near-duplicate provenance matrix: the engine's verified "
    "n-gram-Jaccard near-dup pairs (dedup_ngram_jaccard's exact "
    "construction) joined back to document provenance and aggregated per "
    "unordered source pair — within-source pairs expose boilerplate-"
    "heavy feeds, cross-source pairs expose syndication/mirroring, the "
    "two findings that drive per-source sampling weights "
    "(curation_mix_weights) and source blocklists in a corpus refresh. "
    "Physical shape: the pair table is tiny next to the corpus (it is "
    "already threshold-filtered), so both provenance joins broadcast "
    "the documents' (id, source) projection onto it; the matrix "
    "aggregate is a handful of groups. Jaccard means go through exact "
    "DECIMAL sums per the determinism contract.",
    tags=("curation", "dedup", "llm"),
)
def curation_neardup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    # the engine's own registered near-dup construction — reusing the plan
    # builder (not re-deriving it) guarantees parity with the composed oracle
    from news_ingestion_data_pipeline_spark.plans.llm import (
        ngram_jaccard_pairs_cached,
    )

    pairs = ngram_jaccard_pairs_cached(spark, sf_dir)
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(
            F.broadcast(
                src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
            ),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
            (F.col("sa") == F.col("sb")).alias("within_source"),
            "jaccard",
        )
    )
    tot = labeled.agg(F.count(F.lit(1)).alias("total_pairs"))
    return (
        labeled.crossJoin(F.broadcast(tot))
        .groupBy("source_lo", "source_hi", "within_source", "total_pairs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(10,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_jaccard"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.first("total_pairs"), 6
            ).alias("pair_share"),
        )
        .drop("total_pairs")
        
    )
