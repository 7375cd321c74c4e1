"""Ninety-sixth wave: BPE tokenizer TRAINING (merge-and-apply loop) and
sliding-window rate limiting.

  * text_bpe_train_merges — the registry proves one BPE pair-count step
    (`text_bpe_merge_step`); this is the actual trainer: 3 iterations
    of (count pairs over the frequency-compressed vocab) -> (pick the
    max pair, count DESC / pair ASC) -> (APPLY the merge to every
    word's symbol sequence), driver-controlled like the engine's other
    iterative ops (pagerank, k-means, connected components).  Merge
    application is a left-to-right fold over the symbol list — an
    F.aggregate lambda whose accumulator is the sentinel-joined symbol
    string: if the accumulator ends with <sep>a and the next symbol is
    b, append b directly (fusing "a<sep>b" into "ab"), else append
    <sep>b.  That fold IS greedy leftmost-first BPE merge application,
    runs entirely in the JVM, and costs O(vocab x word length) per
    iteration — never a corpus rescan.  The oracle unrolls the same 3
    iterations as DuckDB CTEs (list_reduce with the identical fold).
  * events_rate_limit_violations — trailing 1-hour per-user event-count
    via an integer-microsecond RANGE frame; rows over the limit are
    violations, reported per offending user.  The abuse-control shape:
    at 100 TB the frame state is one user's trailing hour, and the
    sort is per-user-partition, not global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.tables import local_df

_ITERS = 3
#: symbol separator inside the fold accumulator — never occurs in corpus
#: tokens (they are whitespace-split words)
_SEP = "\x01"

_WORDS_CTE = r"""
words AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)),
                                                    '\s+'),
                  _t -> _t <> '')) AS w
    FROM documents WHERE length(trim(text)) > 0) GROUP BY w
), state0 AS (
  SELECT w, freq,
         chr(1) || list_reduce(
           list_transform(range(1, length(w) + 1),
                          i -> substr(w, CAST(i AS INT), 1)),
           (acc, x) -> acc || chr(1) || x) AS st
  FROM words
)"""

_PAIRS_CTE = """
syms{k} AS (
  SELECT w, freq, list_filter(string_split(st, chr(1)), x -> x <> '') AS s
  FROM state{k}
), pairs{k} AS (
  SELECT p, CAST(SUM(freq) AS BIGINT) AS c FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(s)),
                  i -> s[CAST(i AS INT)] || ' ' || s[CAST(i AS INT) + 1]))
             AS p
    FROM syms{k})
  GROUP BY p
), top{k} AS (
  SELECT split_part(p, ' ', 1) AS a, split_part(p, ' ', 2) AS b, c
  FROM pairs{k} ORDER BY c DESC, p LIMIT 1
)"""

_APPLY_CTE = """
state{k1} AS (
  SELECT w, freq,
         list_reduce(list_concat([chr(1) || s[1]], s[2:]),
                     (acc, x) -> CASE WHEN ends_with(acc, chr(1) || t.a)
                                       AND x = t.b
                                      THEN acc || x
                                      ELSE acc || chr(1) || x END) AS st
  FROM syms{k}, top{k} t
)"""


def _bpe_train_oracle(iters: int = _ITERS) -> str:
    ctes = [_WORDS_CTE]
    for k in range(iters):
        ctes.append(_PAIRS_CTE.format(k=k))
        ctes.append(_APPLY_CTE.format(k=k, k1=k + 1))
    selects = [
        f"SELECT {k + 1} AS step, a || ' ' || b AS merged_pair, c AS pair_count"
        f" FROM top{k}"
        for k in range(iters)
    ]
    return (
        "WITH "
        + ",".join(ctes)
        + f""",
final_syms AS (
  SELECT unnest(list_filter(string_split(st, chr(1)), x -> x <> '')) AS s
  FROM state{iters}
), vocab AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS vocab_size
             FROM final_syms)
SELECT step, merged_pair, pair_count,
       (SELECT vocab_size FROM vocab) AS vocab_size_after
FROM ({" UNION ALL ".join(selects)})
ORDER BY step"""
    )


@register(
    "text_bpe_train_merges",
    oracle=_bpe_train_oracle(),
    description="BPE tokenizer TRAINING, 3 full merge-and-apply "
    "iterations distributed: corpus -> (word, freq) vocab compression "
    "(the one corpus-sized pass), then per iteration (a) adjacent "
    "symbol-pair counts weighted by word frequency, (b) argmax pair "
    "under total (count DESC, pair) order — a 1-row collect, the same "
    "driver-controlled loop shape as pagerank/k-means — and (c) merge "
    "APPLICATION to every word as a JVM-side F.aggregate fold over the "
    "symbol list (accumulator = sentinel-joined string; ends-with "
    "check fuses 'a<sep>b' to 'ab' leftmost-first, exactly greedy BPE). "
    "Emits each learned merge rule with its count plus the symbol-"
    "vocabulary size after training; the oracle unrolls the identical "
    "3 iterations as DuckDB list_reduce CTEs. Per-iteration cost is "
    "O(vocab x word-length) — corpus size enters ONCE, in the word "
    "count; this is what makes corpus-scale tokenizer training "
    "feasible at 100 TB.",
    tags=("text", "llm", "tokenizer"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    state, merges = bpe_train(spark, sf_dir)
    vocab = (
        state.select(F.explode(_syms_col()).alias("sym"))
        .agg(F.countDistinct("sym").cast("bigint").alias("vocab_size_after"))
    )
    rules = local_df(
        spark, merges, "step int, merged_pair string, pair_count bigint"
    )
    return rules.crossJoin(F.broadcast(vocab))


def _syms_col():
    return F.filter(F.split("st", _SEP), lambda x: x != "")


def bpe_train(spark: SparkSession, sf_dir: str):
    """Run the 3-iteration BPE trainer; returns (final_state_df, merges)
    where final_state_df is (w, freq, st sentinel-joined symbols) and
    merges is [(step, 'a b', count)]. Shared by the trainer query and
    the per-language compression eval (llm98)."""
    from news_ingestion_data_pipeline_spark.functions import text as TX

    docs = t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    words = (
        docs.select(F.explode(TX.tokens(F.lower("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.filter(F.split("w", ""), lambda x: x != "")
    state = words.select(
        "w",
        "freq",
        F.concat(F.lit(_SEP), F.array_join(chars, _SEP)).alias("st"),
    ).localCheckpoint(eager=True)

    syms_col = _syms_col
    merges = []
    for step in range(1, _ITERS + 1):
        s = state.withColumn("s", syms_col())
        pairs = (
            s.select(
                "freq",
                F.explode(
                    F.when(
                        F.size("s") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("s") - 1),
                            lambda i: F.concat(
                                F.element_at(F.col("s"), i),
                                F.lit(" "),
                                F.element_at(F.col("s"), i + 1),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>"))
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("freq").cast("bigint").alias("c"))
        )
        # 1-row collect: loop control, the documented scalar fetch shape
        [top] = pairs.orderBy(F.col("c").desc(), "p").limit(1).collect()
        a, b = top.p.split(" ", 1)
        merges.append((step, top.p, top.c))
        fused = F.aggregate(
            F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0))),
            F.concat(F.lit(_SEP), F.element_at(F.col("s"), 1)),
            lambda acc, x: F.when(
                acc.endswith(F.lit(_SEP + a)) & (x == F.lit(b)),
                F.concat(acc, x),
            ).otherwise(F.concat(acc, F.lit(_SEP), x)),
        )
        state = (
            s.select("w", "freq", fused.alias("st"))
            .localCheckpoint(eager=True)
        )
    return state, merges


@register(
    "events_rate_limit_violations",
    oracle="""
WITH counted AS (
  SELECT user_id, ts,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 3600000000 PRECEDING
                              AND CURRENT ROW) AS trailing_1h
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_violations,
       CAST(MAX(trailing_1h) AS BIGINT) AS peak_rate,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_violation
FROM counted
WHERE trailing_1h > 2
GROUP BY user_id
ORDER BY user_id
""",
    description="Sliding-window rate limiting — the abuse-control query "
    "an ingestion edge runs continuously: per-user trailing-1-hour "
    "event count via an integer-microsecond RANGE frame (exact: "
    "epoch_us ordering, 3.6e9-microsecond frame — no float epoch, no "
    "tie ambiguity since peer rows enter the frame together in both "
    "engines), rows exceeding the limit (>2/hour here) are violations, "
    "reported per offending user with count, peak rate, and first "
    "offense time. The frame state is one user's trailing hour and the "
    "sort is per-user-partition — at 100 TB this parallelizes by user "
    "and is the batch twin of the streaming sliding-window count.",
    tags=("events", "window"),
)
def events_rate_limit_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    counted = e.withColumn("trailing_1h", F.count(F.lit(1)).over(w))
    return (
        counted.filter(F.col("trailing_1h") > 2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_violations"),
            F.max("trailing_1h").cast("bigint").alias("peak_rate"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_violation"
            ),
        )
        
    )
