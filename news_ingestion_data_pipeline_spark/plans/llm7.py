"""Seventh wave: language-model-flavored corpus operators — unigram-LM
perplexity scoring (the CCNet/Gopher quality-filter shape) and one
distributed BPE merge step (the tokenizer-training primitive) — each
with a DuckDB oracle.

Determinism note: log2 is a libm call whose last ulp can differ between
engines, and a SUM of raw double logs is additionally partition-order
dependent. Both hazards are closed the same way as the engine's money
sums: each distinct word's log2 is ROUNDED to 9 dp and cast to DECIMAL,
so the per-document sums are exact and associative, and the only
cross-engine surface is the (negligible) chance that a log2 value sits
within 1 ulp of a 9-dp rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_NLL_DEC = "decimal(28,12)"


@register(
    "text_unigram_logprob",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), _t -> _t <> '')) AS w
  FROM documents WHERE length(trim(text)) > 0
), vocab AS (
  SELECT w, CAST(round(log2(COUNT(*)), 9) AS DECIMAL(28,12)) AS log2_cnt
  FROM tok GROUP BY w
), totals AS (
  SELECT CAST(round(log2(COUNT(*)), 9) AS DECIMAL(28,12)) AS log2_total
  FROM tok
), per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(log2_cnt) AS sum_log2_cnt
  FROM tok JOIN vocab USING (w)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(CAST(log2_total - sum_log2_cnt / n_tokens AS VARCHAR)
             AS DOUBLE), 6) AS avg_nll_bits,
       (log2_total - sum_log2_cnt / n_tokens) <= 5.0 AS keep
FROM per_doc, totals
""",
    description="Unigram-LM scoring — the quality-filter shape of "
    "CCNet/Gopher perplexity filtering: train a unigram model ON the "
    "corpus itself (word -> count), score each document by average "
    "negative log2-probability of its tokens, flag documents under a "
    "bits-per-token threshold. Algebra: avg_nll = log2(total) - "
    "mean(log2(cnt_w)), so only per-VOCAB-WORD logs are ever computed "
    "(31 here, bounded by vocabulary not corpus at scale), rounded to "
    "9 dp and summed as exact DECIMAL — partition-order-proof. The "
    "vocab table broadcasts; the scoring pass is one map-side join + "
    "one doc-keyed aggregate. At 100 TB this is the canonical two-pass "
    "filter: tiny model table out of pass one, streaming score in pass "
    "two.",
    tags=("llm", "text", "curation"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = docs.select(
        "doc_id",
        F.explode(
            TX.tokens(F.lower("text"))  # empty-token-safe (tab-only docs)
        ).alias("w"),
    ).localCheckpoint()  # vocab + totals + scoring all read it
    vocab = tok.groupBy("w").agg(
        F.round(F.log2(F.count(F.lit(1))), 9).cast(_NLL_DEC).alias("log2_cnt")
    )
    totals = tok.agg(
        F.round(F.log2(F.count(F.lit(1))), 9).cast(_NLL_DEC).alias("log2_total")
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("log2_cnt").alias("sum_log2_cnt"),
        )
    )
    nll = F.col("log2_total") - F.col("sum_log2_cnt") / F.col("n_tokens")
    return per_doc.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        "n_tokens",
        F.round(nll.cast("double"), 6).alias("avg_nll_bits"),
        (nll <= 5.0).alias("keep"),
    )


@register(
    "text_bpe_merge_step",
    oracle=r"""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), _t -> _t <> '')) AS w
  FROM documents WHERE length(trim(text)) > 0
), words AS (
  SELECT w, COUNT(*) AS freq FROM tok GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                i -> substr(w, CAST(i AS INT), 2))) AS pair,
         freq
  FROM words WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count,
       ROW_NUMBER() OVER (ORDER BY SUM(freq) DESC, pair) AS rnk
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 10
""",
    description="One BPE merge step, distributed — the inner loop of "
    "tokenizer training: aggregate the corpus to (word, freq) — the "
    "compression that makes corpus-scale BPE feasible, pair statistics "
    "then cost O(vocab x word-length), not O(corpus) — explode each "
    "word's adjacent CHARACTER pairs weighted by word frequency, and "
    "rank; rank 1 is the pair the next merge would fuse. Total "
    "(count DESC, pair) order makes the winner deterministic. The full "
    "training loop is this step iterated with the merge applied "
    "(driver-controlled like the engine's other iterative ops: "
    "pagerank, connected components); each iteration is one map + one "
    "bounded aggregate over the vocab table, no corpus rescan.",
    tags=("llm", "text", "tokenizer"),
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    words = (
        docs.select(
            F.explode(
            TX.tokens(F.lower("text"))  # empty-token-safe (tab-only docs)
        ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "freq",
    )
    counted = pairs.groupBy("pair").agg(F.sum("freq").alias("pair_count"))
    # global top-10 first (TakeOrderedAndProject over the pair
    # histogram), THEN the rank window over only the 10 kept rows
    w_rnk = Window.orderBy(F.desc("pair_count"), "pair")
    return (
        counted.orderBy(F.desc("pair_count"), "pair")
        .limit(10)
        .withColumn("rnk", F.row_number().over(w_rnk))
    )
