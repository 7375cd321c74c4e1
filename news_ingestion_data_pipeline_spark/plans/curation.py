"""Corpus-curation operators: the selection/cleaning stages of a
training-data pipeline — decontamination, chunking, deterministic
sampling, PII redaction, tokenizer-cost estimation, sessionization.

These extend the reference's semantics (incremental ingest + dedup of a
document stream, SURVEY.md §2.12) to the full curation surface a 100 TB
corpus build needs. Everything here is a pure DataFrame plan over the
driver fixtures with an exact DuckDB oracle:

  * No RNG anywhere — "random" sampling is md5-hash-derived, so both
    engines (and any two cluster runs) select identical rows. At scale
    that also means sampling is a deterministic, restartable map stage
    with no seed-distribution problem.
  * All n-gram/token machinery reuses functions.text (normalize → split
    once per row via _bind; shingles hashed to 60-bit ints so joins move
    primitive longs, not strings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# Tokenizer-cost estimation (BPE-ish regex pre-tokenizer)
# ---------------------------------------------------------------------------

#: GPT-2-style pre-tokenizer approximation, restricted to a regex dialect
#: Java and RE2 treat identically: letter runs, digit runs, single
#: non-alphanumeric marks. Token *count* under this split upper-bounds BPE
#: token count (BPE only merges within pre-tokens).
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "curation_token_estimate",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all({SQL_NORM.format(col='text')}, '{_BPE_RE}')) AS BIGINT)
           AS n_pre_tokens,
       CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), _t -> _t <> '')) AS BIGINT) AS n_ws_tokens,
       round(CAST(len(regexp_extract_all({SQL_NORM.format(col='text')}, '{_BPE_RE}')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS tokens_per_char
FROM documents
""",
    description="BPE-ish token-count estimate: regex pre-tokenizer "
    "(letter/digit runs + marks) over normalized text, vs whitespace "
    "count, plus tokens-per-char (the $/doc cost proxy). Pure project "
    "stage — map-only at any scale.",
    tags=("llm", "curation", "text"),
)
def curation_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    pre = F.size(
        F.regexp_extract_all(TX.normalize_text(F.col("text")), F.lit(_BPE_RE), F.lit(0))
    )
    return d.select(
        "doc_id",
        pre.cast("bigint").alias("n_pre_tokens"),
        TX.token_count(F.col("text")).alias("n_ws_tokens"),
        F.round(
            pre.cast("double") / F.greatest(F.length("text"), F.lit(1)), 6
        ).alias("tokens_per_char"),
    )


# ---------------------------------------------------------------------------
# PII / sensitive-term redaction
# ---------------------------------------------------------------------------

#: Long digit runs (ids, phones, SSN-ish), plus a configurable sensitive
#: term list. Email/URL patterns belong in the same alternation in a real
#: deployment; the fixture corpus is alphanumeric words, so the digit rule
#: plus term list is the part the oracle can exercise.
_PII_RE = "[0-9]{4,}|customer|supplier"


@register(
    "curation_pii_redact",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{_PII_RE}')) AS BIGINT) AS n_redactions,
       md5(regexp_replace(lower(text), '{_PII_RE}', '[REDACTED]', 'g')) AS redacted_md5,
       length(regexp_replace(lower(text), '{_PII_RE}', '[REDACTED]', 'g')) AS redacted_len
FROM documents
""",
    description="PII-style redaction: alternation of digit-run and "
    "sensitive-term patterns replaced with a mask token; emits match count "
    "+ fingerprint of the redacted text. Map-only; at 100 TB the regex "
    "runs inside whole-stage codegen, no Python.",
    tags=("llm", "curation", "text"),
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    red = F.regexp_replace(low, _PII_RE, "[REDACTED]")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(_PII_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_redactions"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

#: DuckDB word-3gram → hashed-long list over a normalized string column.
_SQL_GRAM3 = (
    "list_distinct(list_transform("
    "list_transform(range(1, greatest(len(tk) - 2, 0) + 1),"
    " i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]"
    " || ' ' || tk[CAST(i AS INT) + 2]),"
    " g -> CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)))"
)


def _gram3_hashed(col) -> F.Column:
    return F.array_distinct(
        F.transform(
            TX.word_ngrams(col, 3),
            lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
        )
    )


@register(
    "curation_decontaminate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array({SQL_NORM.format(col='text')}, '\\s+'), _t -> _t <> '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id, lang, {_SQL_GRAM3} AS grams FROM toks
), bench AS (
  SELECT DISTINCT unnest(grams) AS g FROM grams WHERE doc_id % 41 = 0
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(grams) AS g FROM grams WHERE doc_id % 41 <> 0) t
  JOIN bench b ON t.g = b.g
)
SELECT g.doc_id, g.lang
FROM grams g
WHERE g.doc_id % 41 <> 0
  AND g.doc_id NOT IN (SELECT doc_id FROM contaminated)
""",
    description="Benchmark decontamination: drop any training document "
    "sharing a word-3-gram with the held-out benchmark slice (doc_id%41=0 "
    "stands in for the eval set). Benchmark grams are tiny relative to the "
    "corpus → broadcast anti-join against exploded training grams: the "
    "100 TB side streams map-side, never shuffles. The contaminated-id set "
    "is NOT broadcast-hinted: it is corpus-proportional in the adversarial "
    "high-overlap case, so AQE picks the anti-join strategy from its "
    "runtime size.",
    tags=("llm", "curation", "dedup"),
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    d = spread(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", _gram3_hashed(F.col("text")).alias("grams")
    )
    # Lineage break (same pathology as dedup_ngram_jaccard, r11): the
    # bench/train doc_id%41 split consumes this frame THREE times
    # (bench grams, train-side contamination probe, final anti-join), so
    # the md5 3-gram pipeline was re-derived in every branch — and the
    # branches' inferred isnotnull/size>0 predicates were substituted
    # with the full gram expression and pushed below the round-robin
    # exchange into the one-task scan stage. Pinning the gram table
    # computes it once, in parallel; it is the gram-postings artifact a
    # production decontamination pass materializes anyway.
    d = d.localCheckpoint()
    is_bench = F.col("doc_id") % 41 == 0
    # Eval sets are ~10³-10⁵ docs regardless of corpus size: their distinct
    # gram set fits any executor, so the contamination check broadcasts.
    bench_grams = (
        d.filter(is_bench).select(F.explode("grams").alias("g")).distinct()
    )
    train = d.filter(~is_bench)
    contaminated = (
        train.select("doc_id", F.explode("grams").alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )
    # No broadcast hint here: |contaminated| is bounded by |train| (a
    # high-overlap corpus can mark nearly everything), so forcing a
    # broadcast would OOM the executors exactly when decontamination
    # matters most. AQE sees the runtime size and still broadcasts when
    # it genuinely fits.
    return train.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "lang"
    )


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------

_RATES = {"en": 80, "de": 25, "es": 25, "fr": 25, "zh": 25}

_SQL_BUCKET = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"


@register(
    "curation_sample_stratified",
    oracle=f"""
SELECT doc_id, lang, CAST({_SQL_BUCKET} AS BIGINT) AS bucket
FROM documents
WHERE {_SQL_BUCKET} < CASE lang
    WHEN 'en' THEN 80 ELSE 25 END
""",
    description="Stratified sampling with per-language keep rates via "
    "md5-derived buckets — deterministic, seedless, restartable: a pure "
    "map-side filter (no shuffle, no RNG-state distribution problem), and "
    "the same rows are kept on any cluster at any scale.",
    tags=("llm", "curation", "sampling"),
)
def curation_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.when(F.col("lang") == "en", F.lit(80)).otherwise(F.lit(25))
    return (
        d.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", F.col("bucket").cast("bigint"))
    )


@register(
    "curation_sample_k_per_group",
    oracle="""
SELECT doc_id, lang, rn
FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 20
""",
    description="Deterministic k-per-stratum sample: rank by md5(doc_id) "
    "inside each language, keep first 20. The hash order is a uniform "
    "shuffle both engines agree on. Scale note: per-group top-k via "
    "row_number is partial — each partition keeps ≤k before the single "
    "per-group merge; no global sort.",
    tags=("llm", "curation", "sampling"),
)
def curation_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------

_CHUNK = 32
_STRIDE = 24


@register(
    "curation_chunk_windows",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array({SQL_NORM.format(col='text')}, '\\s+'), _t -> _t <> '') AS tk
  FROM documents
)
SELECT doc_id,
       CAST((start - 1) / {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(tk[start : start + {_CHUNK} - 1]) AS BIGINT) AS n_chunk_tokens,
       coalesce(array_to_string(tk[start : start + {_CHUNK} - 1], ' '), '')
           AS chunk_text
FROM toks, unnest(range(1, greatest(len(tk), 1) + 1, {_STRIDE})) AS u(start)
""",
    description=f"Context-window chunking: overlapping {_CHUNK}-token "
    f"windows at stride {_STRIDE} (the tail short chunk is kept) — the "
    "doc→training-example explode stage. Tokens are split once per row "
    "(_bind) and sliced per window; map-side explode, output partitions "
    "grow ~len/stride× with zero shuffle.",
    tags=("llm", "curation", "text"),
)
def curation_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    chunks = TX._bind(
        TX.tokens(TX.normalize_text(F.col("text"))),
        lambda tk: F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(tk), F.lit(1)), F.lit(_STRIDE)
            ),
            lambda start: F.slice(tk, start, _CHUNK),
        ),
    )
    return d.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "ck")).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint"),
        F.size("ck").cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("ck")).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Composite quality filter (Gopher-style rule bundle)
# ---------------------------------------------------------------------------

_SQL_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), _t -> _t <> '')"
_SQL_STOPS = "', '".join(TX.QUALITY_STOPWORDS)


@register(
    "curation_quality_filter",
    oracle=f"""
WITH feats AS (
  SELECT doc_id,
         CAST(len({_SQL_TOKS_LOWER}) AS BIGINT) AS n_tokens,
         round(coalesce(list_sum(list_transform({_SQL_TOKS_LOWER},
                                                x -> length(x))), 0) * 1.0
               / greatest(len({_SQL_TOKS_LOWER}), 1), 6) AS mean_word_len,
         round(len(list_filter({_SQL_TOKS_LOWER}, x -> x IN ('{_SQL_STOPS}'))) * 1.0
               / greatest(len({_SQL_TOKS_LOWER}), 1), 6) AS stop_ratio,
         round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(list_max(list_transform(list_distinct({_SQL_TOKS_LOWER}),
                   w -> len(list_filter({_SQL_TOKS_LOWER}, x -> x = w)))) * 1.0
               / greatest(len({_SQL_TOKS_LOWER}), 1), 6) AS top_word_ratio
  FROM documents
)
SELECT doc_id, n_tokens,
       (n_tokens BETWEEN 10 AND 1000) AS ok_length,
       (mean_word_len BETWEEN 2.0 AND 12.0) AS ok_word_len,
       (stop_ratio >= 0.01) AS ok_stopwords,
       (punct_ratio <= 0.1) AS ok_punct,
       (top_word_ratio <= 0.25) AS ok_repetition,
       ((n_tokens BETWEEN 10 AND 1000)
        AND (mean_word_len BETWEEN 2.0 AND 12.0)
        AND (stop_ratio >= 0.01)
        AND (punct_ratio <= 0.1)
        AND (top_word_ratio <= 0.25)) AS passed
FROM feats
""",
    description="Composite quality filter (Gopher-style rule bundle): "
    "length, mean word length, stopword floor, punctuation ceiling, and "
    "top-word repetition cap, emitted as per-rule flags + the conjunction "
    "(keep the flags — at scale you audit WHY docs drop, not just that "
    "they do). Map-only; the repetition rule is O(distinct·len) list "
    "arithmetic inside codegen, no shuffle anywhere.",
    tags=("llm", "curation", "text"),
)
def curation_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = TX.tokens(F.lower(F.col("text")))
    # Each ratio binds the token array once (_bind): the repetition rule's
    # inner F.filter would otherwise re-tokenize the document per element.
    mean_word_len = TX._bind(
        toks,
        lambda tk: F.round(
            F.aggregate(tk, F.lit(0), lambda a, x: a + F.length(x))
            * F.lit(1.0)
            / F.greatest(F.size(tk), F.lit(1)),
            6,
        ),
    )
    top_word_ratio = TX._bind(
        toks,
        lambda tk: F.round(
            F.array_max(
                F.transform(
                    F.array_distinct(tk),
                    lambda w: F.size(F.filter(tk, lambda x: x == w)),
                )
            )
            * F.lit(1.0)
            / F.greatest(F.size(tk), F.lit(1)),
            6,
        ),
    )
    feats = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        TX.stopword_ratio(F.col("text")).alias("stop_ratio"),
        TX.punct_ratio(F.col("text")).alias("punct_ratio"),
        top_word_ratio.alias("top_word_ratio"),
    )
    ok_length = F.col("n_tokens").between(10, 1000)
    ok_word_len = F.col("mean_word_len").between(2.0, 12.0)
    ok_stop = F.col("stop_ratio") >= 0.01
    ok_punct = F.col("punct_ratio") <= 0.1
    ok_rep = F.col("top_word_ratio") <= 0.25
    return feats.select(
        "doc_id",
        "n_tokens",
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_punct.alias("ok_punct"),
        ok_rep.alias("ok_repetition"),
        (ok_length & ok_word_len & ok_stop & ok_punct & ok_rep).alias("passed"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands sessionization (pure-window form)
# ---------------------------------------------------------------------------


@register(
    "events_gaps_islands",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts)
                   - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 600000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       MAX(n_events) AS max_session_events,
       CAST(SUM(n_events) AS BIGINT) AS n_events_total
FROM per_session
GROUP BY user_id
""",
    description="Gaps-and-islands sessionization (10-min inactivity gap) "
    "via lag + running sum — the window-function dual of session_window, "
    "for when per-session ids must join back to rows. One shuffle on "
    "user_id serves both windows and both aggregations (same key).",
    tags=("events", "window"),
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap: casting to whole seconds would truncate
    # sub-second parts and flip boundary gaps (~600.x s) across the 10-min
    # threshold relative to an exact-interval comparison.
    # cast("timestamp"): events.ts arrives as TIMESTAMP_NTZ from parquet and
    # unix_micros requires TIMESTAMP; session tz is pinned UTC so the cast
    # preserves the wall clock exactly.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 600_000_000), 1).otherwise(0).alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        F.sum("is_new")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("session_id"),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").cast("bigint").alias("n_events_total"),
    )


# ---------------------------------------------------------------------------
# Unpivot / melt
# ---------------------------------------------------------------------------


@register(
    "unpivot_flag_metrics",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
         CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM wide
""",
    description="Wide→long unpivot (melt) of a per-flag aggregate via "
    "DataFrame.unpivot — the inverse of agg_pivot. The aggregate shuffles "
    "once; the unpivot itself is a map-side expand (3 rows out per row "
    "in, no shuffle).",
    tags=("relational", "reshape"),
)
def unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.plans.registry import dsum

    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# End-to-end corpus dedup: pairs → clusters → one survivor per cluster
# ---------------------------------------------------------------------------

# Imported at module bottom to reuse the registered cluster query (llm.py
# registers before this executes — plans/__init__ imports curation first,
# which triggers the llm import here, completing llm's registrations before
# the decorator below runs).
from news_ingestion_data_pipeline_spark.plans.llm import (  # noqa: E402
    connected_clusters_cached,
)
from news_ingestion_data_pipeline_spark.plans.registry import REGISTRY  # noqa: E402

_CLUSTERS_SQL = REGISTRY["dedup_connected_clusters"].oracle


@register(
    "curation_dedup_corpus",
    oracle=f"""
SELECT d.doc_id, d.lang
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({_CLUSTERS_SQL}) c WHERE c.doc_id <> c.cluster_id
)
""",
    description="The dedup pipeline's actual deliverable: the cleaned "
    "corpus. Near-dup pairs → connected components (transitive closure) → "
    "keep the min-id member of each cluster, drop the rest via anti-join. "
    "Non-canonical ids are usually a small fraction of the corpus (the "
    "duplicate mass), so the anti-join typically broadcasts — but the "
    "fraction is corpus-dependent (a crawl of mirrored sites can mark "
    "most of it), so the choice is left to AQE's runtime size rather "
    "than forced.",
    tags=("llm", "curation", "dedup", "iterative"),
)
def curation_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = connected_clusters_cached(spark, sf_dir)
    non_canonical = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    # no forced broadcast: |non_canonical| is bounded only by |corpus|;
    # AQE still broadcasts when the runtime size genuinely fits
    return docs.join(non_canonical, "doc_id", "left_anti")


@register(
    "curation_pack_sequences",
    oracle="""
WITH tok AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), _t -> _t <> '')) AS BIGINT)
           AS n_tokens
  FROM documents
), packed AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_tokens
  FROM tok
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST((cum_tokens - 1) // 4096 AS BIGINT) AS shard_id
FROM packed
""",
    description="Sequence packing: assign docs (in deterministic doc_id "
    "order) to fixed 4096-token shards by cumulative token count — the "
    "shard/sample assignment pass every LLM training pipeline runs before "
    "writing tfrecord/arrow shards. The global running sum is computed "
    "with a two-pass distributed prefix sum (per-range partial sums -> "
    "tiny cumulative offset table broadcast back -> in-range cumsum), the "
    "same decomposition as the percentile rank lookup: no single task "
    "ever sees the whole corpus, unlike a naive global-ORDER-BY window "
    "(one partition). Oracle uses the naive global window, proving the "
    "decomposition exact.",
    tags=("llm", "curation", "packing"),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    budget = 4096
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    # global running token count via the two-pass bucketed prefix sum
    # (operators/ranking.py): doc_id-range buckets (a FIXED 256-row
    # offset table at any corpus size — the earlier hand-rolled variant
    # used fixed-SIZE ranges, whose offset table grew with the corpus),
    # per-bucket partials broadcast as offsets, in-bucket windows
    # partitioned by bucket.
    from news_ingestion_data_pipeline_spark.operators import ranking as RK

    env = tok.agg(F.min("doc_id").alias("dlo"), F.max("doc_id").alias("dhi"))
    return (
        RK.distributed_prefix_sum(
            tok.crossJoin(F.broadcast(env)),
            ["doc_id"],
            RK.range_bucket(F.col("doc_id"), F.col("dlo"), F.col("dhi")),
            ["n_tokens"],
            inclusive=True,
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("cum_n_tokens").alias("cum_tokens"),
            ((F.col("cum_n_tokens") - 1) / budget)
            .cast("bigint")
            .alias("shard_id"),
        )
    )


@register(
    "curation_cluster_keep_best",
    oracle=f"""
WITH c AS ({_CLUSTERS_SQL}), m AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars
  FROM c JOIN documents d USING (doc_id)
), best AS (
  SELECT cluster_id, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM m
)
SELECT cluster_id, doc_id AS keeper_id,
       CAST(n_members AS BIGINT) AS n_members,
       CAST(n_chars AS BIGINT) AS keeper_chars
FROM best WHERE rn = 1
""",
    description="Keep-BEST-in-cluster dedup: near-dup connected "
    "components keep their highest-quality member (longest document, "
    "tie-break min id) instead of the arbitrary min-id keeper — the "
    "policy real curation pipelines use because mirrored copies differ "
    "in truncation/boilerplate and dropping the best copy loses data. "
    "Composition: the registered cluster query's exact construction "
    "(reused, not re-derived) joined to a quality column, one "
    "row_number window PARTITIONED BY CLUSTER (thousands of tiny "
    "partitions — no global sort), keeper + member count per cluster. "
    "Swap n_chars for the Gopher quality score column to get "
    "editorial-quality keeper selection with the same plan shape.",
    tags=("llm", "curation", "dedup"),
)
def curation_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = connected_clusters_cached(spark, sf_dir)
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    m = clusters.join(docs, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    wc = Window.partitionBy("cluster_id")
    return (
        m.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keeper_id"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("n_chars").cast("bigint").alias("keeper_chars"),
        )
    )
