"""Hundred-nineteenth wave: unigram-LM Viterbi subword segmentation —
the SentencePiece E-step.

BPE (text_bpe_train_merges) builds a vocabulary bottom-up; the unigram
tokenizer goes the other way: given piece probabilities, segment every
word into its MINIMUM-COST piece sequence (Viterbi), whose piece
statistics then re-estimate the LM (EM).  This wave ships the Viterbi
segmentation — the computational heart of SentencePiece — as a pure
DataFrame dynamic program:

  * piece vocabulary = every 1..4-char substring of the corpus words,
    cost = -log2 add-one probability, snapped to integer NANO-BITS so
    the whole DP is BIGINT arithmetic;
  * per word, a cost array indexed by (start, len) is assembled with
    one ordered collect, and the DP runs as ONE fold over character
    positions whose accumulator is the growing best-cost array —
    cost and piece-count ride one integer (cost*16 + pieces, pieces
    <= 15), so the min() is lexicographic (cost, pieces) for free;
  * output: per distinct word, the optimal cost, piece count, and the
    corpus frequency to weight the E-step.

Scale shape: distinct words (not tokens) drive the DP; the cost-array
build is one shuffle on (word, piece) and the fold is embarrassingly
parallel — exactly how a 100 TB corpus trains a tokenizer (words
dedupe to a vocabulary-sized table first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions.text import normalize_text, tokens
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

_MAXP = 4  # max piece length

#: the E-step oracle's CTE chain (word counts -> add-one piece costs ->
#: per-word cost arrays -> the integer Viterbi fold), shared verbatim by
#: llm176's per-language fertility eval so both replay the identical DP
_VITERBI_CTES = f"""
WITH words AS (
  SELECT term AS w, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(
      regexp_split_to_array({SQL_NORM.format(col='text')}, '\\s+'),
      _t -> _t <> '')) AS term
    FROM documents
  ) GROUP BY term
),
grid AS (
  SELECT w, freq, length(w) AS L, s.start, k.k,
         substr(w, s.start + 1, k.k) AS piece
  FROM words,
       LATERAL (SELECT unnest(range(0, length(w))) AS start) s,
       LATERAL (SELECT unnest(range(1, {_MAXP} + 1)) AS k) k
  WHERE s.start + k.k <= length(w)
),
vocab AS (
  SELECT piece, SUM(freq) AS cnt FROM grid GROUP BY piece
),
tot AS (
  SELECT SUM(cnt) AS n_total, COUNT(*) AS v FROM vocab
),
costs AS (
  SELECT vocab.piece,
         CAST(round(-log2((vocab.cnt + 1.0) / (tot.n_total + tot.v))
                    * 1000000000.0) AS BIGINT) AS c_e9
  FROM vocab, tot
),
cell AS (
  SELECT g.w, g.freq, g.L, g.start * {_MAXP} + g.k AS idx, c.c_e9
  FROM grid g JOIN costs c ON c.piece = g.piece
),
full_grid AS (
  SELECT w, freq, length(w) AS L, s.start * {_MAXP} + k.k AS idx
  FROM words,
       LATERAL (SELECT unnest(range(0, length(w))) AS start) s,
       LATERAL (SELECT unnest(range(1, {_MAXP} + 1)) AS k) k
),
ca AS (
  SELECT fg.w, MAX(fg.freq) AS freq, MAX(fg.L) AS L,
         array_agg(COALESCE(cell.c_e9, 1000000000000000) ORDER BY fg.idx)
           AS cs
  FROM full_grid fg
  LEFT JOIN cell ON cell.w = fg.w AND cell.idx = fg.idx
  GROUP BY fg.w
),
folded AS (
  SELECT w, freq, L,
    list_reduce(
      list_prepend([CAST(0 AS BIGINT)],
        list_transform(range(1, L + 1), j -> [CAST(j AS BIGINT)])),
      (acc, e) -> list_append(acc,
        least(
          (acc[e[1]] // 16 + cs[(e[1] - 1) * {_MAXP} + 1]) * 16
            + acc[e[1]] % 16 + 1,
          CASE WHEN e[1] >= 2 THEN
            (acc[e[1] - 1] // 16 + cs[(e[1] - 2) * {_MAXP} + 2]) * 16
              + acc[e[1] - 1] % 16 + 1
          ELSE 10000000000000000 END,
          CASE WHEN e[1] >= 3 THEN
            (acc[e[1] - 2] // 16 + cs[(e[1] - 3) * {_MAXP} + 3]) * 16
              + acc[e[1] - 2] % 16 + 1
          ELSE 10000000000000000 END,
          CASE WHEN e[1] >= 4 THEN
            (acc[e[1] - 3] // 16 + cs[(e[1] - 4) * {_MAXP} + 4]) * 16
              + acc[e[1] - 3] % 16 + 1
          ELSE 10000000000000000 END))
    ) AS dp
  FROM ca
)"""


@register(
    "text_unigram_viterbi_segment",
    oracle=f"""{_VITERBI_CTES}
SELECT w AS word,
       CAST(freq AS BIGINT) AS freq,
       CAST(L AS BIGINT) AS n_chars,
       CAST(dp[L + 1] // 16 AS BIGINT) AS best_cost_e9,
       CAST(dp[L + 1] % 16 AS BIGINT) AS n_pieces
FROM folded
ORDER BY word
""",
    description="SentencePiece-style unigram Viterbi segmentation (the EM "
    "E-step of tokenizer training, the counterpart of "
    "text_bpe_train_merges): vocabulary = all 1..4-char substrings of the "
    "corpus words with add-one -log2 costs snapped to integer nano-bits; "
    "per distinct word a (start,len)-indexed cost array is assembled with "
    "one ordered collect and the DP best[j] = min_k best[j-k] + "
    "cost(w[j-k:j]) runs as ONE fold over character positions — cost and "
    "piece count share one BIGINT (cost*16+pieces), making the min "
    "lexicographic (cost, pieces) and the ENTIRE dynamic program exact "
    "integer arithmetic, bit-identical to the oracle's list_reduce "
    "replay. Scale shape: the DP runs per DISTINCT word (vocabulary-"
    "sized, not corpus-sized); the only corpus-scale work is the word "
    "count, exactly how production tokenizer training is staged.",
    tags=("text", "llm", "iterative"),
)
def text_unigram_viterbi_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    folded = viterbi_folded(corpus_word_counts(spark, sf_dir))
    last = F.element_at("dp", (F.col("L") + 1).cast("int"))
    return folded.select(
        F.col("w").alias("word"),
        F.col("freq").cast("bigint").alias("freq"),
        F.col("L").cast("bigint").alias("n_chars"),
        F.expr("CAST(element_at(dp, CAST(L + 1 AS INT)) div 16 AS BIGINT)").alias(
            "best_cost_e9"
        ),
        (last % 16).cast("bigint").alias("n_pieces"),
    )


def _viterbi_ca(words: DataFrame) -> DataFrame:
    """words(w, freq) -> ca(w, freq, L, cs): the (start,len)-indexed
    cost-array table the Viterbi fold consumes.

    One grid pass: the FULL (start, k) grid carries its piece substring
    only where start + k <= L (NULL otherwise), so a single left join
    against the broadcast piece-cost table fills real costs and the
    coalesce fills the out-of-range sentinel — the cs arrays are
    bit-identical to the former full_grid LEFT JOIN cell form, without
    re-deriving the grid a second time for the join's probe side."""
    base = words.select("w", "freq", F.length("w").alias("L"))
    grid = base.select(
        "w",
        "freq",
        "L",
        F.explode(F.sequence(F.lit(0), F.col("L") - 1)).alias("start"),
    ).select(
        "w",
        "freq",
        "L",
        "start",
        F.explode(F.sequence(F.lit(1), F.lit(_MAXP))).alias("k"),
    )
    pieces = grid.filter(F.col("start") + F.col("k") <= F.col("L")).select(
        "w",
        "freq",
        "L",
        "start",
        "k",
        F.expr("substr(w, start + 1, k)").alias("piece"),
    )
    vocab = pieces.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    tot = vocab.agg(
        F.sum("cnt").alias("n_total"), F.count(F.lit(1)).alias("v")
    )
    costs = vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(
            -F.log2(
                (F.col("cnt") + 1.0) / (F.col("n_total") + F.col("v"))
            )
            * 1000000000.0
        )
        .cast("bigint")
        .alias("c_e9"),
    )
    cell = grid.select(
        "w",
        "freq",
        "L",
        (F.col("start") * _MAXP + F.col("k")).alias("idx"),
        F.when(
            F.col("start") + F.col("k") <= F.col("L"),
            F.expr("substr(w, start + 1, k)"),
        ).alias("piece"),
    ).join(F.broadcast(costs), "piece", "left")
    ca = (
        cell.groupBy("w")
        .agg(
            F.max("freq").alias("freq"),
            F.max("L").alias("L"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "idx",
                            F.coalesce(
                                "c_e9", F.lit(1000000000000000)
                            ).alias("c"),
                        )
                    )
                ),
                lambda s: s["c"],
            ).alias("cs"),
        )
    )
    return ca


def corpus_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, freq) distinct-word counts — THE corpus-scale pass of unigram
    tokenizer training, pinned (localCheckpoint) because every downstream
    stage (grid, piece vocabulary, costs, DP) is vocabulary-sized and
    multiply consumed: unpinned, the tokenize+explode+count pipeline
    re-ran once per consumer subtree (r11 profile: two ~32-task corpus
    map stages per query where one suffices)."""
    from news_ingestion_data_pipeline_spark.tables import spread

    return (
        spread(t(spark, sf_dir, "documents"))
        .select(
            F.explode(tokens(normalize_text(F.col("text")))).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()
    )


def viterbi_folded(words: DataFrame) -> DataFrame:
    """words(w, freq) -> (w, freq, L, dp): the full Viterbi DP fold,
    shared with llm176's fertility eval (which derives the identical
    words frame from its own pinned (lang, word) count)."""
    ca = _viterbi_ca(words)

    big = F.lit(1 << 55).cast("bigint")

    def step(acc, j):
        # encoded candidate for a piece of length k ending at position j:
        # (prev_cost + piece_cost) * 16 + prev_pieces + 1, all via exact
        # bit arithmetic (div/mod 16 = shift/mask — a double `/` would go
        # inexact past 2^53).
        def enc(k):
            prev = F.element_at(acc, (j - (k - 1)).cast("int"))
            cost = F.element_at("cs", ((j - k) * _MAXP + k).cast("int"))
            return (
                F.shiftleft(F.shiftright(prev, 4) + cost, 4)
                + prev.bitwiseAND(F.lit(15))
                + 1
            )

        cands = [enc(1)]
        for k in (2, 3, 4):
            cands.append(F.when(j >= k, enc(k)).otherwise(big))
        return F.concat(acc, F.array(F.least(*cands)))

    return ca.select(
        "w",
        "freq",
        "L",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.array(F.lit(0).cast("bigint")),
            step,
        ).alias("dp"),
    )
