"""Hundred-tenth wave: instruction-pair dedup and perplexity filtering.

  * curation_instruction_dedup — SFT-corpus curation: derive
    (prompt, response) pairs from documents (first 8 tokens = prompt,
    rest = response), canonicalize the prompt (lower / strip punct /
    collapse whitespace), and keep ONE pair per canonical prompt —
    the longest response, doc_id tiebreak.  The classic fix for
    instruction sets where the same question appears with trivially
    different phrasing and wildly different answer quality.
  * curation_perplexity_filter — quality gate by LM surprisal: train
    an add-one-smoothed unigram LM on the corpus itself, score every
    document's per-token cross-entropy (bits), flag the high-surprisal
    tail.  The standard cheap proxy for "is this text natural" before
    expensive model-based filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.functions.text import normalize_text, tokens
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(trim(text), '\\s+'), _t -> _t <> '')"
)


@register(
    "curation_instruction_dedup",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
),
pairs AS (
  SELECT doc_id,
         array_to_string(toks[1:8], ' ') AS prompt,
         len(toks) - LEAST(len(toks), 8) AS resp_tokens
  FROM tk
),
canon AS (
  SELECT doc_id, resp_tokens,
         {SQL_NORM.format(col='prompt')} AS prompt_key
  FROM pairs
),
ranked AS (
  SELECT doc_id, prompt_key, resp_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY prompt_key
           ORDER BY resp_tokens DESC, doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY prompt_key) AS n_variants
  FROM canon
)
SELECT prompt_key,
       doc_id AS kept_doc_id,
       CAST(resp_tokens AS BIGINT) AS best_resp_tokens,
       CAST(n_variants AS BIGINT) AS n_variants
FROM ranked
WHERE rn = 1
ORDER BY prompt_key, kept_doc_id
""",
    description="Instruction-pair dedup for SFT corpora: split each "
    "document into (prompt = first 8 whitespace tokens, response = rest), "
    "canonicalize the prompt (lowercase, strip punctuation, collapse "
    "whitespace), keep one pair per canonical prompt — longest response "
    "wins, doc_id tiebreak. One hash-partitioned window on the canonical "
    "key; at 100 TB the prompt key is a short string so the shuffle "
    "carries (key, doc_id, resp_len) triples, never document bodies — "
    "body re-attachment is a post-selection join on the surviving ids.",
    tags=("curation", "dedup", "text"),
)
def curation_instruction_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tk = t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    pairs = tk.select(
        "doc_id",
        F.array_join(F.slice("toks", 1, 8), " ").alias("prompt"),
        (
            F.size("toks") - F.least(F.size("toks"), F.lit(8))
        ).cast("bigint").alias("resp_tokens"),
    )
    canon = pairs.select(
        "doc_id",
        "resp_tokens",
        normalize_text(F.col("prompt")).alias("prompt_key"),
    )
    w = Window.partitionBy("prompt_key").orderBy(
        F.col("resp_tokens").desc(), F.col("doc_id")
    )
    ranked = canon.select(
        "prompt_key",
        "doc_id",
        "resp_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("prompt_key"))
        .cast("bigint")
        .alias("n_variants"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "prompt_key",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("resp_tokens").alias("best_resp_tokens"),
            "n_variants",
        )
        
    )


@register(
    "curation_perplexity_filter",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
doc_term AS (
  SELECT doc_id, term, COUNT(*) AS c FROM tk GROUP BY doc_id, term
),
lm AS (
  SELECT term, SUM(c) AS cw FROM doc_term GROUP BY term
),
tot AS (
  SELECT SUM(cw) AS n_total, COUNT(*) AS vocab FROM lm
),
logp AS (
  SELECT lm.term,
         CAST(round(-log2((lm.cw + 1.0) / (tot.n_total + tot.vocab))
                    * 1000000000.0) AS BIGINT) AS nlp_e9
  FROM lm, tot
),
per_doc AS (
  SELECT dt.doc_id,
         CAST(SUM(dt.c) AS BIGINT) AS n_tokens,
         CAST(SUM(dt.c * l.nlp_e9) AS BIGINT) AS sum_nlp_e9
  FROM doc_term dt JOIN logp l USING (term)
  GROUP BY dt.doc_id
),
scored AS (
  SELECT d.doc_id,
         COALESCE(p.n_tokens, 0) AS n_tokens,
         CASE WHEN p.doc_id IS NULL THEN NULL
              ELSE (2 * p.sum_nlp_e9 + p.n_tokens * 1000)
                   // (2 * p.n_tokens * 1000)
         END AS xent_microbits
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
)
SELECT doc_id, n_tokens,
       CAST(xent_microbits AS BIGINT) AS xent_microbits,
       CAST(xent_microbits IS NOT NULL AND xent_microbits <= 13000000
            AS BOOLEAN) AS keep
FROM scored
ORDER BY doc_id
""",
    description="Perplexity-style quality filter: add-one-smoothed unigram "
    "LM trained on the corpus itself, per-document cross-entropy in "
    "integer micro-bits/token, keep-flag at a fixed 13-bit threshold "
    "(empty docs score NULL and are dropped). Determinism: log2 is "
    "evaluated once per VOCAB term (bounded set) and snapped to integer "
    "nano-bits; everything after — per-doc totals, the half-up microbit "
    "division (2a+d)//(2d), the threshold compare — is pure BIGINT "
    "arithmetic, bit-identical across engines and partition orders (a "
    "float round here sat exactly on a 6-dp half and flipped between "
    "engines; integers can't). Scale shape: the LM is vocabulary-sized "
    "(broadcastable); the doc-term join is the only corpus-sized shuffle "
    "and it carries (doc_id, term, count) — Heaps' law keeps that far "
    "smaller than the raw token stream.",
    tags=("curation", "text", "stats"),
)
def curation_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    dt = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    lm = dt.groupBy("term").agg(F.sum("c").alias("cw"))
    tot = lm.agg(
        F.sum("cw").alias("n_total"), F.count(F.lit(1)).alias("vocab")
    )
    logp = lm.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            -F.log2((F.col("cw") + 1.0) / (F.col("n_total") + F.col("vocab")))
            * 1000000000.0
        )
        .cast("bigint")
        .alias("nlp_e9"),
    )
    per_doc = (
        dt.join(F.broadcast(logp), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("nlp_e9")).cast("bigint").alias(
                "sum_nlp_e9"
            ),
        )
    )
    scored = docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"),
        # `div` = exact integer division (a double `/` then cast truncates
        # an inexact quotient and can be off by one at the boundary).
        F.expr(
            "CAST((2 * sum_nlp_e9 + n_tokens * 1000)"
            " div (2 * n_tokens * 1000) AS BIGINT)"
        ).alias("xent_microbits"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "xent_microbits",
        (
            F.col("xent_microbits").isNotNull()
            & (F.col("xent_microbits") <= 13000000)
        ).alias("keep"),
    )
