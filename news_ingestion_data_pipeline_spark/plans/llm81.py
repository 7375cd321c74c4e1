"""Eighty-first wave: embedding-dimension health and character entropy.

sim_embedding_dim_stats is the embedding QA table: per-dimension mean,
variance, and dead/dominant flags — the first thing to check when an
encoder regresses (collapsed dimensions are invisible to the similarity
evals but poison every downstream index).  text_char_entropy is the
compressibility proxy quality filters use for gibberish and
base64/minified-blob detection — low-entropy text is repetitive chrome,
very-high-entropy 'text' is usually not language at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_EDS_DEAD_VAR = 1e-4


@register(
    "sim_embedding_dim_stats",
    oracle=f"""
WITH dims AS (
  SELECT u.dim, u.val
  FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),
       LATERAL (SELECT UNNEST(range(1, len(v) + 1)) AS dim,
                       UNNEST(v) AS val) u
), stats AS (
  SELECT dim, COUNT(*) AS n,
         CAST(CAST(SUM(CAST(round(val, 9) AS DECIMAL(18,9))) AS VARCHAR)
              AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(round(val, 9) AS DECIMAL(20,9))
                       * CAST(round(val, 9) AS DECIMAL(18,9))) AS VARCHAR)
              AS DOUBLE) AS ss
  FROM dims GROUP BY dim
), scored AS (
  SELECT dim, n,
         s / n AS mean_val,
         (ss - s * s / n) / n AS var_val
  FROM stats
), tot AS (SELECT SUM(var_val) AS tv FROM scored)
SELECT sc.dim AS dim,
       round(sc.mean_val, 6) AS mean_val,
       round(sc.var_val, 6) AS var_val,
       round(sc.var_val / t.tv, 6) AS var_share,
       CAST(sc.var_val < {_EDS_DEAD_VAR!r} AS BOOLEAN) AS dead
FROM scored sc CROSS JOIN tot t
ORDER BY dim
""",
    description="Embedding-dimension health table: per-dimension mean, "
    "variance, share of total variance, and a dead-dimension flag "
    f"(var < {_EDS_DEAD_VAR}) — the encoder-regression check that "
    "catches collapsed or dominant dimensions BEFORE they poison "
    "indexes (a dead dim wastes PQ codebook bits, sim_pq_adc_topk; a "
    "dominant dim makes every LSH hyperplane align with it, "
    "sim_lsh_buckets — and none of the similarity evals see either, "
    "because cosine normalizes the damage away). Component sums flow "
    "through rounded-DECIMAL (the sim_kmeans_update contract) so the "
    "moment table is partition-order-independent. Shape: one "
    "explode + one 64-group partial-agg shuffle — the per-dimension "
    "roll-up any 100 TB embedding QA job runs nightly.",
    tags=("llm", "similarity", "eval"),
)
def sim_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    dims = (
        spread(t(spark, sf_dir, "embeddings"))
        .select(F.posexplode(F.col("embedding").cast("array<double>")).alias("d0", "val"))
        .select((F.col("d0") + 1).alias("dim"), "val")
    )
    v9 = F.round("val", 9)
    stats = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v9.cast("decimal(18,9)")).cast("double").alias("s"),
        F.sum(v9.cast("decimal(20,9)") * v9.cast("decimal(18,9)"))
        .cast("double")
        .alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    scored = stats.select("dim", mean.alias("mean_val"), var.alias("var_val"))
    tot = scored.agg(F.sum("var_val").alias("tv"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .select(
            "dim",
            F.round("mean_val", 6).alias("mean_val"),
            F.round("var_val", 6).alias("var_val"),
            F.round(F.col("var_val") / F.col("tv"), 6).alias("var_share"),
            (F.col("var_val") < _EDS_DEAD_VAR).alias("dead"),
        )
        
    )


@register(
    "text_char_entropy",
    oracle="""
WITH chars AS (
  SELECT doc_id, u.ch
  FROM (SELECT doc_id, lower(text) AS s FROM documents
        WHERE length(text) > 0),
       LATERAL (SELECT UNNEST(string_split_regex(s, '')) AS ch) u
  WHERE u.ch <> ''
), counts AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
), lens AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct FROM counts GROUP BY doc_id
), terms AS (
  SELECT c.doc_id,
         SUM(CAST(c.c AS DECIMAL(20,0))
             * CAST(round(log2(CAST(c.c AS DOUBLE) / l.n), 9)
                    AS DECIMAL(14,9))) AS sum_clog
  FROM counts c JOIN lens l USING (doc_id)
  GROUP BY c.doc_id
)
SELECT l.doc_id,
       CAST(l.n AS BIGINT) AS n_chars,
       CAST(l.n_distinct AS BIGINT) AS n_distinct_chars,
       round(-CAST(CAST(t.sum_clog AS VARCHAR) AS DOUBLE) / l.n, 6)
         AS entropy_bits_per_char,
       round(-CAST(CAST(t.sum_clog AS VARCHAR) AS DOUBLE) / l.n
             / round(log2(GREATEST(l.n_distinct, 2)), 9), 6)
         AS entropy_efficiency
FROM lens l JOIN terms t USING (doc_id)
ORDER BY l.doc_id
""",
    description="Per-document character entropy — the compressibility "
    "proxy quality filters use: H = −Σ (c/n)·log2(c/n) over the "
    "document's character distribution, in bits/char, plus the "
    "efficiency ratio against the log2(alphabet) ceiling. Natural "
    "language sits in a tight band (~4-4.5 bits raw English); "
    "repetitive chrome scores far lower and base64/minified blobs "
    "score near the ceiling — the two failure modes "
    "curation_quality_filter's word-level rules can miss, caught here "
    "at the character level for pennies (no tokenizer, no model). "
    "log2 is evaluated once per (doc, char) COUNT — a bounded "
    "alphabet domain — rounded to 9 dp and folded through DECIMAL "
    "products (the entropy contract shared with "
    "events_entropy_by_user). Shape: one char explode, two stacked "
    "hash-aggregates; the explode is the cost and it is one map pass.",
    tags=("text", "curation", "llm"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    chars = (
        t(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "")).alias("ch"),
        )
        .filter(F.col("ch") != "")
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    lens = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    terms = (
        counts.join(lens, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("c").cast("decimal(20,0)")
                * F.round(
                    F.log2(F.col("c").cast("double") / F.col("n")), 9
                ).cast("decimal(14,9)")
            ).alias("sum_clog")
        )
    )
    h = -F.col("sum_clog").cast("double") / F.col("n")
    return (
        lens.join(terms, "doc_id")
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_chars"),
            F.col("n_distinct").cast("bigint").alias("n_distinct_chars"),
            F.round(h, 6).alias("entropy_bits_per_char"),
            F.round(
                h
                / F.round(
                    F.log2(F.greatest(F.col("n_distinct"), F.lit(2)).cast("double")),
                    9,
                ),
                6,
            ).alias("entropy_efficiency"),
        )
        
    )
