"""Fifty-fourth wave: streaming top-k serving, truncated-embedding recall,
boilerplate detection.

stream_topk_per_window composes a REAL Structured Streaming drain with the
batch ranking a serving layer applies on top of the streamed state — the
"trending now" query.  sim_prefix_dim_recall measures what Matryoshka-style
embedding truncation costs in recall (the memory/recall trade every vector
store tunes).  curation_boilerplate_grams finds the high-document-frequency
grams (headers, footers, navigation chrome) that corpus cleaning strips and
that the dedup family's max_df caps guard against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# Streaming tumbling aggregate → serving-side top-k per window
# ---------------------------------------------------------------------------

_STK_K = 3


@register(
    "stream_topk_per_window",
    oracle=f"""
WITH agg AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT window_start, event_type, n_events,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type) AS rnk
  FROM agg
)
SELECT window_start, event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_STK_K}
ORDER BY window_start, rnk
""",
    description=f"Streaming 'trending now': a REAL Structured Streaming "
    "drain (readStream over events parquet → watermark → tumbling 1h "
    "count per event type → memory sink, Trigger.AvailableNow, complete "
    f"mode, awaited) followed by the serving-side top-{_STK_K} rank per "
    "window over the drained state — the composition every live "
    "leaderboard runs: the stream maintains the windowed counts "
    "incrementally, the cheap rank runs at read time on state that is "
    "windows × types, never raw events. Rank is (count desc, type) "
    "total-ordered for determinism; the oracle checks the end-to-end "
    "composition against the batch answer. At 100 TB the streamed "
    "aggregate is the only corpus-sized work; the read-time rank "
    "touches thousands of rows however large the stream.",
    tags=("streaming", "window", "topk"),
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.plans.windows import (
        _drain_to_memory,
        _events_stream,
        ts_str,
    )

    res = (
        _events_stream(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    drained = _drain_to_memory(res, "stream_topk_mem")
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        drained.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _STK_K)
        .select(
            "window_start",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            "rnk",
        )
        
    )


# ---------------------------------------------------------------------------
# Matryoshka-style truncated-dimension recall
# ---------------------------------------------------------------------------

_PFX_DIM = 16
_PFX_K = 5

_SQL_COS_FULL = (
    "round(list_dot_product(a.v, q.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 6)"
)
_SQL_COS_PFX = (
    "round(list_dot_product(a.p, q.p) / "
    "(sqrt(list_dot_product(a.p, a.p)) * sqrt(list_dot_product(q.p, q.p))), 6)"
)


@register(
    "sim_prefix_dim_recall",
    oracle=f"""
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         (embedding::DOUBLE[])[1:{_PFX_DIM}] AS p
  FROM embeddings
), q AS (SELECT * FROM c WHERE vec_id < 10),
full_topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS_FULL} DESC, a.vec_id) AS rank
    FROM c a CROSS JOIN q WHERE a.vec_id != q.vec_id
  ) WHERE rank <= {_PFX_K}
), pfx_topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS_PFX} DESC, a.vec_id) AS rank
    FROM c a CROSS JOIN q WHERE a.vec_id != q.vec_id
  ) WHERE rank <= {_PFX_K}
)
SELECT f.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_full,
       CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hit,
       round(CAST(COUNT(p.neighbor_id) AS DOUBLE) / COUNT(*), 4) AS recall
FROM full_topk f
LEFT JOIN pfx_topk p
  ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
GROUP BY f.query_id
ORDER BY f.query_id
""",
    description=f"Matryoshka truncation recall: top-{_PFX_K} neighbors "
    f"computed from only the first {_PFX_DIM} of 64 embedding dimensions, "
    "scored against the full-dimension top-k per query — the eval behind "
    "prefix-truncated (MRL) embedding serving, where a 4x smaller index "
    "answers first and the full vectors only rerank. Both paths are "
    "exact brute-force constructions (the engine's documented baseline "
    "form), differing only in the slice, so the recall number isolates "
    "the DIMENSION trade from any index approximation "
    "(sim_lsh_recall_eval isolates the INDEX trade). Shape: one shared "
    "scan projects both the full vector and its prefix; queries "
    "broadcast; the comparison join is top-k-sized.",
    tags=("llm", "similarity", "eval"),
)
def sim_prefix_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = t(spark, sf_dir, "embeddings")
    pfx = emb.select(
        "vec_id",
        F.col("embedding").alias("embedding_full"),
        F.slice(F.col("embedding"), 1, _PFX_DIM).alias("embedding_pfx"),
    )
    queries_full = pfx.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding_full").alias("query_vec"),
    )
    queries_pfx = pfx.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding_pfx").alias("query_vec"),
    )
    full = SIM.brute_force_topk(
        pfx.select("vec_id", F.col("embedding_full").alias("embedding")),
        queries_full,
        k=_PFX_K,
    ).select("query_id", "neighbor_id")
    trunc = SIM.brute_force_topk(
        pfx.select("vec_id", F.col("embedding_pfx").alias("embedding")),
        queries_pfx,
        k=_PFX_K,
    ).select("query_id", "neighbor_id")
    return (
        full.alias("f")
        .join(
            trunc.alias("p"),
            (F.col("f.query_id") == F.col("p.query_id"))
            & (F.col("f.neighbor_id") == F.col("p.neighbor_id")),
            "left_outer",
        )
        .groupBy(F.col("f.query_id").alias("query_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_full"),
            F.count(F.col("p.neighbor_id")).cast("bigint").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_full",
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_full"), 4).alias(
                "recall"
            ),
        )
        
    )


# ---------------------------------------------------------------------------
# Boilerplate gram detection (high-df chrome per source)
# ---------------------------------------------------------------------------

_BP_N = 2       # words per gram
_BP_FRAC = 0.05 # flag grams present in >= this fraction of the corpus


@register(
    "curation_boilerplate_grams",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents
), grams AS (
  SELECT DISTINCT doc_id, source,
         array_to_string(tk[u.i : u.i + {_BP_N} - 1], ' ') AS gram
  FROM toks,
       LATERAL (SELECT UNNEST(range(1, len(tk) - {_BP_N} + 2)) AS i) u
  WHERE len(tk) >= {_BP_N}
), corpus AS (
  SELECT COUNT(*) AS n_docs FROM documents
), df AS (
  SELECT gram, COUNT(*) AS n_docs_with,
         COUNT(DISTINCT source) AS n_sources
  FROM grams GROUP BY gram
)
SELECT d.gram,
       CAST(d.n_docs_with AS BIGINT) AS n_docs_with,
       CAST(d.n_sources AS BIGINT) AS n_sources,
       round(CAST(d.n_docs_with AS DOUBLE) / c.n_docs, 6) AS doc_frac
FROM df d CROSS JOIN corpus c
WHERE d.n_docs_with >= c.n_docs * {_BP_FRAC!r}
ORDER BY doc_frac DESC, d.gram
""",
    description=f"Boilerplate gram detector: every {_BP_N}-word gram "
    f"present in ≥{_BP_FRAC:.0%} of the corpus, with the number of "
    "distinct sources it spans — high-df chrome (headers, footers, "
    "templated phrasing) is what a cleaning pass strips before "
    "training, and a gram spanning many sources is syndication rather "
    "than one feed's template. These are exactly the grams whose "
    "document frequency makes the dedup family's joins quadratic — "
    "dedup_ngram_jaccard/dedup_common_spans cap max_df against them, "
    "and this query is the cap's diagnostic twin: it SHOWS what the "
    "cap removes. Per-doc DISTINCT grams first so in-document "
    "repetition doesn't inflate document frequency. Shape: one "
    "explode-distinct, one gram hash-aggregate, a 1-row corpus-size "
    "broadcast — a single partial-agg shuffle; at 100 TB a frequency "
    "sketch pre-prunes the singleton tail before the exact count.",
    tags=("curation", "text", "llm"),
)
def curation_boilerplate_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split("text", " ")
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", toks.alias("tk"))
    grams = (
        docs.filter(F.size("tk") >= _BP_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("tk") - _BP_N + 1),
                        lambda i: F.array_join(F.slice("tk", i, _BP_N), " "),
                    )
                )
            ).alias("gram"),
        )
    )
    corpus = t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_docs"))
    df = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs_with"),
        F.countDistinct("source").alias("n_sources"),
    )
    return (
        # bcast-ok: `corpus` here is the ungrouped COUNT(*) — a 1-row frame.
        df.crossJoin(F.broadcast(corpus))
        .filter(F.col("n_docs_with") >= F.col("n_docs") * _BP_FRAC)
        .select(
            "gram",
            F.col("n_docs_with").cast("bigint").alias("n_docs_with"),
            F.col("n_sources").cast("bigint").alias("n_sources"),
            F.round(
                F.col("n_docs_with").cast("double") / F.col("n_docs"), 6
            ).alias("doc_frac"),
        )
        
    )
