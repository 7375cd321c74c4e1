"""Seventieth wave: directed-graph reciprocity, Markov entropy rate, and
the curation filter funnel.

curation_filter_funnel is the report every corpus-cleaning pipeline logs:
how many documents each successive gate (non-empty → length → quality
bundle → exact-dup → near-dup) removes — composed from the engine's own
registered constructions so the funnel numbers are consistent with the
individual filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY, register, t


@register(
    "graph_reciprocity",
    oracle="""
WITH raw AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), e AS (
  SELECT src, dst, COUNT(*) AS w
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY src, dst
), paired AS (
  SELECT a.src, a.dst, a.w, COALESCE(b.w, 0) AS w_rev
  FROM e a LEFT JOIN e b ON b.src = a.dst AND b.dst = a.src
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_directed_edges,
       CAST(SUM(w) AS BIGINT) AS total_weight,
       round(CAST(SUM(LEAST(w, w_rev)) AS DOUBLE) / SUM(w), 6)
         AS weighted_reciprocity,
       round(CAST(COUNT(*) FILTER (WHERE w_rev > 0) AS DOUBLE) / COUNT(*), 6)
         AS edge_reciprocity
FROM paired
""",
    description="Reciprocity of the event-type transition DIGRAPH: the "
    "weighted form Σ min(w_ij, w_ji)/Σ w_ij (how much flow is returned) "
    "and the binary form (fraction of directed edges whose reverse "
    "exists) — the directed-structure diagnostic the undirected family "
    "(graph_assortativity, graph_clustering_coeff) cannot express, and "
    "the first thing to check before modeling transitions as a "
    "reversible chain. Exact integer weights, one LEFT self-join on "
    "the reversed key over the bounded type-pair domain; two final "
    "divisions.",
    tags=("graph", "events", "stats"),
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        t(spark, sf_dir, "events")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("event_type")))
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    rev = e.select(
        F.col("src").alias("r_dst"), F.col("dst").alias("r_src"), F.col("w").alias("w_rev")
    )
    paired = e.join(
        rev, (F.col("src") == F.col("r_src")) & (F.col("dst") == F.col("r_dst")), "left"
    ).select("src", "dst", "w", F.coalesce(F.col("w_rev"), F.lit(0)).alias("w_rev"))
    return paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_directed_edges"),
        F.sum("w").cast("bigint").alias("total_weight"),
        F.round(
            F.sum(F.least("w", "w_rev")).cast("double") / F.sum("w"), 6
        ).alias("weighted_reciprocity"),
        F.round(
            F.count(F.when(F.col("w_rev") > 0, 1)).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("edge_reciprocity"),
    )


@register(
    "events_entropy_rate",
    oracle="""
WITH raw AS (
  SELECT event_type AS dst,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), e AS (
  SELECT src, dst, COUNT(*) AS w
  FROM raw WHERE src IS NOT NULL
  GROUP BY src, dst
), rows_ AS (
  SELECT src, SUM(w) AS wi FROM e GROUP BY src
), tot AS (SELECT SUM(w) AS wt FROM e),
cells AS (
  SELECT e.w, r.wi, t.wt,
         round(log2(CAST(e.w AS DOUBLE) / r.wi), 9) AS log_cond
  FROM e JOIN rows_ r USING (src) CROSS JOIN tot t
)
SELECT CAST((SELECT COUNT(*) FROM rows_) AS BIGINT) AS n_states,
       CAST(MAX(wt) AS BIGINT) AS n_transitions,
       round(-SUM(CAST(w AS DOUBLE) / wt * log_cond), 6) AS entropy_rate_bits,
       round(round(log2((SELECT COUNT(*) FROM rows_)), 9), 6) AS max_entropy_bits,
       round(-SUM(CAST(w AS DOUBLE) / wt * log_cond)
             / round(log2((SELECT COUNT(*) FROM rows_)), 9), 6)
         AS predictability_ratio
FROM cells
""",
    description="Entropy rate of the empirical event-type Markov chain: "
    "H = −Σ_ij (w_ij/W)·log2(w_ij/w_i), the expected per-transition "
    "surprise under the observed source distribution — the information-"
    "theoretic summary of events_transition_matrix (near log2(k) means "
    "transitions are unpredictable and sequence features won't help a "
    "model; near 0 means the next event is nearly determined), with "
    "the ratio to the log2(k) ceiling as the predictability index. "
    "log2 is evaluated once per transition CELL (a bounded k² domain), "
    "rounded to 9 dp per the libm contract; weights are exact "
    "integers. Shape: the lag window is the only corpus-sized stage — "
    "everything after runs on k² rows.",
    tags=("events", "stats", "graph"),
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = (
        t(spark, sf_dir, "events")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    rows_ = e.groupBy("src").agg(F.sum("w").alias("wi"))
    tot = e.agg(F.sum("w").alias("wt"))
    n_states = rows_.agg(F.count(F.lit(1)).alias("k"))
    cells = (
        e.join(F.broadcast(rows_), "src")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            "wi",
            "wt",
            F.round(F.log2(F.col("w").cast("double") / F.col("wi")), 9).alias(
                "log_cond"
            ),
        )
    )
    h = -F.sum(F.col("w").cast("double") / F.col("wt") * F.col("log_cond"))
    return (
        cells.agg(
            F.max("wt").cast("bigint").alias("n_transitions"), h.alias("h")
        )
        .crossJoin(F.broadcast(n_states))
        .select(
            F.col("k").cast("bigint").alias("n_states"),
            "n_transitions",
            F.round("h", 6).alias("entropy_rate_bits"),
            F.round(F.round(F.log2(F.col("k").cast("double")), 9), 6).alias(
                "max_entropy_bits"
            ),
            F.round(
                F.col("h") / F.round(F.log2(F.col("k").cast("double")), 9), 6
            ).alias("predictability_ratio"),
        )
    )


def _funnel_oracle() -> str:
    quality = REGISTRY["curation_quality_filter"].oracle
    pairs = REGISTRY["dedup_ngram_jaccard"].oracle
    return f"""
WITH q AS ({quality}),
fp AS (
  SELECT doc_id, md5({SQL_NORM.format(col='text')}) AS f FROM documents
), keepers AS (
  SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f
), near_losers AS (
  SELECT DISTINCT id_b AS doc_id FROM ({pairs})
), flags AS (
  SELECT d.doc_id,
         length(trim(d.text)) > 0 AS f1,
         q.ok_length AS f2,
         q.passed AS f3,
         k.keep_id = d.doc_id AS f4,
         nl.doc_id IS NULL AS f5
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN fp ON fp.doc_id = d.doc_id
  JOIN keepers k ON k.f = fp.f
  LEFT JOIN near_losers nl ON nl.doc_id = d.doc_id
), counts AS (
  SELECT COUNT(*) AS s0,
         COUNT(*) FILTER (WHERE f1) AS s1,
         COUNT(*) FILTER (WHERE f1 AND f2) AS s2,
         COUNT(*) FILTER (WHERE f1 AND f2 AND f3) AS s3,
         COUNT(*) FILTER (WHERE f1 AND f2 AND f3 AND f4) AS s4,
         COUNT(*) FILTER (WHERE f1 AND f2 AND f3 AND f4 AND f5) AS s5
  FROM flags
)
SELECT u.stage_idx, u.stage,
       CAST(u.docs_in AS BIGINT) AS docs_in,
       CAST(u.docs_out AS BIGINT) AS docs_out,
       CAST(u.docs_in - u.docs_out AS BIGINT) AS dropped,
       round(CAST(u.docs_in - u.docs_out AS DOUBLE)
             / NULLIF(u.docs_in, 0), 6) AS drop_rate
FROM counts c, LATERAL (
  SELECT * FROM (VALUES
    (1, 'non_empty', c.s0, c.s1),
    (2, 'length', c.s1, c.s2),
    (3, 'quality_bundle', c.s2, c.s3),
    (4, 'exact_dedup', c.s3, c.s4),
    (5, 'near_dedup', c.s4, c.s5)
  ) AS v(stage_idx, stage, docs_in, docs_out)
) u
ORDER BY u.stage_idx
"""


@register(
    "curation_filter_funnel",
    oracle=_funnel_oracle(),
    description="The curation filter funnel — the log line every corpus "
    "cleaning run emits: documents surviving each successive gate "
    "(non-empty → length window → the Gopher-style quality bundle → "
    "exact-dedup keeper → near-dup loser removal), with per-stage drop "
    "counts and rates. Every gate reuses the engine's REGISTERED "
    "construction (curation_quality_filter's rule bundle, "
    "dedup_exact_rows' min-id keeper, dedup_ngram_jaccard's verified "
    "pairs), so the funnel is consistent with the individual filter "
    "queries by construction — the property that makes the report "
    "auditable. Stages apply CUMULATIVELY (a doc dropped for length "
    "never reaches the quality gate), matching how the production "
    "pipeline short-circuits. Shape: one flags projection per doc, "
    "one 6-counter aggregate, a 5-row VALUES pivot.",
    tags=("curation", "llm", "dedup"),
)
def curation_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX

    docs = t(spark, sf_dir, "documents")
    q = REGISTRY["curation_quality_filter"].fn(spark, sf_dir).select(
        "doc_id", "ok_length", "passed"
    )
    fp = docs.select("doc_id", TX.doc_fingerprint(F.col("text")).alias("f"))
    keepers = fp.groupBy("f").agg(F.min("doc_id").alias("keep_id"))
    near_losers = (
        REGISTRY["dedup_ngram_jaccard"]
        .fn(spark, sf_dir)
        .select(F.col("id_b").alias("nl_id"))
        .distinct()
    )
    flags = (
        docs.select("doc_id", (F.length(F.trim("text")) > 0).alias("f1"))
        .join(q, "doc_id")
        .join(fp, "doc_id")
        .join(keepers, "f")
        # no broadcast hint: the near-dup loser set is corpus-proportional
        # on a mirrored-crawl corpus — let AQE pick broadcast when it fits
        .join(near_losers, F.col("doc_id") == F.col("nl_id"), "left_outer")
        .select(
            "f1",
            F.col("ok_length").alias("f2"),
            F.col("passed").alias("f3"),
            (F.col("keep_id") == F.col("doc_id")).alias("f4"),
            F.col("nl_id").isNull().alias("f5"),
        )
    )
    c = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        F.count(F.when(F.col("f1"), 1)).alias("s1"),
        F.count(F.when(F.col("f1") & F.col("f2"), 1)).alias("s2"),
        F.count(F.when(F.col("f1") & F.col("f2") & F.col("f3"), 1)).alias("s3"),
        F.count(
            F.when(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"), 1)
        ).alias("s4"),
        F.count(
            F.when(
                F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4") & F.col("f5"), 1
            )
        ).alias("s5"),
    )
    stages = [
        (1, "non_empty", "s0", "s1"),
        (2, "length", "s1", "s2"),
        (3, "quality_bundle", "s2", "s3"),
        (4, "exact_dedup", "s3", "s4"),
        (5, "near_dedup", "s4", "s5"),
    ]
    rows = c.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_idx"),
                        F.lit(name).alias("stage"),
                        F.col(a).alias("docs_in"),
                        F.col(b).alias("docs_out"),
                    )
                    for i, name, a, b in stages
                ]
            )
        ).alias("u")
    ).select("u.stage_idx", "u.stage", "u.docs_in", "u.docs_out")
    return rows.select(
        "stage_idx",
        "stage",
        F.col("docs_in").cast("bigint").alias("docs_in"),
        F.col("docs_out").cast("bigint").alias("docs_out"),
        (F.col("docs_in") - F.col("docs_out")).cast("bigint").alias("dropped"),
        F.round(
            (F.col("docs_in") - F.col("docs_out")).cast("double")
            / F.nullif(F.col("docs_in").cast("double"), F.lit(0.0)),
            6,
        ).alias("drop_rate"),
    )
