"""Sixth relational wave: URL parsing, fault-tolerant (try_*) arithmetic,
running-distinct windows, event-transition mining, a Gopher-style
intra-document repetition filter, and mergeable HLL cardinality sketches.

Reference parity: none of these exist in the reference
(SURVEY.md §2.12 — absent categories built Spark-native for the driver
contract). The repetition filter and HLL sketches extend the
LLM-training-data curation surface; the transition matrix extends the
behavioral-event suite.

Scale notes are per-query in the descriptions; the common thread is that
every shape here is a single pruned scan plus at most one shuffle, and
the HLL query exists precisely because COUNT(DISTINCT) does not merge
across partitions while sketches do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import ranking as RK
from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "scalar_url_suite",
    oracle=r"""
SELECT doc_id,
       url,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\?(.*)$', 1) AS query,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
FROM (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/' || doc_id
           || '?lang=' || lang || '&ref=search' AS url
  FROM documents
) WHERE doc_id % 7 = 0
""",
    description="URL decomposition via the JVM parse_url expression "
    "(HOST/PATH/QUERY and per-parameter extraction) over synthesized "
    "document URLs; the oracle re-expresses the same extraction as "
    "regexps. parse_url stays inside WholeStageCodegen — no Python, no "
    "UDF — so at 100 TB this is pure map-side compute on a 3-column "
    "pruned scan.",
    tags=("scalar", "url"),
)
def scalar_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=search"),
    )
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            "url",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
    )


@register(
    "scalar_try_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_extendedprice AS DOUBLE) / NULLIF(l_quantity - 25, 0)
         AS div_by_maybe_zero,
       CAST(l_orderkey AS DOUBLE) / NULLIF(l_linenumber - 3, 0)
         AS key_over_line,
       TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
       TRY_CAST(l_linestatus AS DOUBLE) AS status_as_num,
       string_split(l_returnflag || ' ' || l_linestatus, ' ')[5] AS word5
FROM lineitem
WHERE l_orderkey % 311 = 0
""",
    description="Fault-tolerant scalar suite: try_divide (NULL instead of "
    "error on zero divisors), try_cast on non-numeric strings, "
    "try_element_at past the end of an array — the ANSI-mode-safe "
    "building blocks for dirty-data pipelines where one bad row must not "
    "kill a 1000-executor stage. All JVM expressions in one codegen "
    "project; the oracle spells the same semantics with NULLIF/TRY_CAST "
    "and DuckDB's out-of-bounds-is-NULL list index.",
    tags=("scalar", "try"),
)
def scalar_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 311 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.try_divide(
                F.col("l_extendedprice").cast("double"),
                F.col("l_quantity") - 25,
            ).alias("div_by_maybe_zero"),
            F.try_divide(
                F.col("l_orderkey").cast("double"),
                (F.col("l_linenumber") - 3).cast("double"),
            ).alias("key_over_line"),
            F.expr("try_cast(l_returnflag AS int)").alias("flag_as_int"),
            F.expr("try_cast(l_linestatus AS double)").alias("status_as_num"),
            F.try_element_at(
                F.split(F.concat_ws(" ", "l_returnflag", "l_linestatus"), " "),
                F.lit(5),
            ).alias("word5"),
        )
    )


@register(
    "window_running_distinct",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM events
  WHERE user_id % 50 = 0
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       event_id,
       event_type,
       CAST(SUM(is_first) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT)
         AS n_types_so_far
FROM flagged
""",
    description="Running COUNT(DISTINCT) over an ordered window — an "
    "aggregate neither Spark nor DuckDB supports natively in a frame — "
    "rewritten as its standard two-window decomposition: a first-"
    "occurrence flag (row_number over user+type) summed cumulatively "
    "over the user's timeline. An explicit repartition on user_id "
    "collapses the plan to ONE exchange: hash(user_id) co-locates both "
    "windows' partitions (user_id ⊂ {user_id, event_type}), leaving two "
    "in-partition sorts — verified in the formatted plan. At 100 TB the "
    "state per key is a running counter, never a distinct set.",
    tags=("window", "distinct"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        # hash(user_id) satisfies BOTH windows' clustering (user_id is a
        # subset of {user_id, event_type}), so pre-partitioning here leaves
        # one exchange + two sorts instead of two full shuffles.
        .repartition("user_id")
        .withColumn(
            "is_first",
            F.when(F.row_number().over(first_w) == 1, 1).otherwise(0),
        )
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_id",
            "event_type",
            F.sum("is_first").over(run_w).alias("n_types_so_far"),
        )
    )


@register(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
ORDER BY n_transitions DESC, prev_type, next_type
LIMIT 25
""",
    description="First-order Markov transition matrix over per-user event "
    "timelines: lag(event_type) within each user's time-ordered stream, "
    "then a global (prev, next) count and top-25. One shuffle on "
    "user_id for the window, then a partial+final hash aggregate whose "
    "group count is |event_type|² (tiny, independent of corpus size) — "
    "the classic shape for clickstream/session modeling at any scale.",
    tags=("events", "window", "agg"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), "prev_type", "next_type")
        .limit(25)
    )


@register(
    "curation_repetition_filter",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3 THEN
           list_transform(range(1, len(w) - 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
         ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM toks
)
SELECT doc_id,
       len(grams) AS n_grams,
       len(list_distinct(grams)) AS n_uniq,
       1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
         AS dup_ratio
FROM g
WHERE len(grams) > len(list_distinct(grams))
""",
    description="Gopher-style intra-document repetition signal: the "
    "fraction of duplicated word 3-grams inside each document (a high "
    "ratio marks boilerplate/spam for exclusion from training corpora). "
    "Entirely array-HOF built-ins — split → sequence → transform → "
    "array_distinct — zero Python, zero shuffle: a pure map over the "
    "documents scan, embarrassingly parallel at 100 TB. The dup_ratio "
    "double is one IEEE division, bit-identical across engines.",
    tags=("curation", "text"),
)
def curation_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions.text import bind_once
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread: the n-gram build + distinct is heavy per-row compute and the
    # fixture is a single-row-group file (one scan task otherwise).
    # _bind: project-collapse inlines a withColumn'd split() into every
    # w[i] reference inside the transform lambda, re-splitting the full
    # text per sequence element (O(len²) per doc — measured 16s at sf0.1);
    # binding the token array as a lambda variable makes each w[i] an O(1)
    # attribute lookup (2.8s).
    docs = spread(t(spark, sf_dir, "documents"))
    tokens = F.split(F.trim(F.lower("text")), r"\s+")
    grams = bind_once(
        tokens,
        lambda w: F.when(
            F.size(w) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(w, i),
                    F.element_at(w, i + 1),
                    F.element_at(w, i + 2),
                ),
            ),
        ).otherwise(F.expr("CAST(array() AS array<string>)")),
    )
    counts = docs.withColumn("grams", grams).select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.size(F.array_distinct("grams")).alias("n_uniq"),
    )
    # Lineage break before the n_uniq < n_grams filter: pushed below the
    # round-robin exchange, the filter's aliases are substituted with the
    # FULL gram pipeline (split + transform + array_distinct, twice over)
    # and the whole heavy compute runs serially inside the one-task scan
    # stage — then again, distributed, for the projection. The pinned
    # frame is three bigints per doc (tiny at any SF); the gram build
    # runs once, above the exchange, on every core.
    counts = counts.localCheckpoint()
    return counts.filter(F.col("n_uniq") < F.col("n_grams")).withColumn(
        "dup_ratio",
        F.lit(1.0) - F.col("n_uniq").cast("double") / F.col("n_grams"),
    )


@register(
    "join_range_banded",
    oracle="""
WITH brackets AS (
  SELECT n_nationkey AS bracket_id,
         CAST(n_nationkey * 4000 AS DOUBLE) AS lo,
         CAST(n_nationkey * 4000 + 2000 + (n_nationkey % 5) * 1000 AS DOUBLE)
           AS hi
  FROM nation
)
SELECT bracket_id, lo, hi,
       COUNT(*) AS n_lines,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
         AS sum_price
FROM lineitem JOIN brackets
  ON l_extendedprice BETWEEN lo AND hi
GROUP BY bracket_id, lo, hi
""",
    description="PURE interval join (no equi key): price rows against "
    "variable-width, possibly-overlapping brackets. Naively this is a "
    "broadcast nested loop — O(|fact| x |intervals|) predicate "
    "evaluations, the plan that dies when the interval side grows. The "
    "banded rewrite makes it an EQUI-join: each interval explodes into "
    "the fixed-width bands it overlaps (sequence(floor(lo/step), "
    "floor(hi/step))), each fact row computes its single band "
    "(floor(price/step)), the join keys on band, and the BETWEEN becomes "
    "a residual filter. A fact row matches an interval in exactly one "
    "band, so no dedup is needed. Shuffle volume is O(|fact| + "
    "sum(interval_width/step)) and both sides hash-partition by band — "
    "the open-source answer to the range-join optimization commercial "
    "Spark ships built-in.",
    tags=("join", "range"),
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    step = 2000
    nat = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("bracket_id"),
        (F.col("n_nationkey") * 4000).cast("double").alias("lo"),
        (F.col("n_nationkey") * 4000 + 2000 + (F.col("n_nationkey") % 5) * 1000)
        .cast("double")
        .alias("hi"),
    )
    bands = nat.withColumn(
        "band",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / step), F.floor(F.col("hi") / step)
            )
        ),
    )
    fact = t(spark, sf_dir, "lineitem").select(
        "l_extendedprice", F.floor(F.col("l_extendedprice") / step).alias("band")
    )
    return (
        fact.join(bands, "band")
        .filter(F.col("l_extendedprice").between(F.col("lo"), F.col("hi")))
        .groupBy("bracket_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "window_hourly_uniques",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(DISTINCT user_id) AS n_unique_users,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
""",
    description="Exact distinct users per tumbling 1-hour window — the "
    "distinct aggregate under a time window, which Catalyst plans as the "
    "two-phase expand: partial dedup of (window, user_id) map-side, then "
    "a final count per window, so the shuffle carries one row per "
    "(window, user) — never raw events. The hll sketch variant "
    "(agg_hll_cardinality) replaces phase one with a fixed-size buffer "
    "when exactness can be traded away at 100 TB.",
    tags=("window", "agg", "distinct"),
)
def window_hourly_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_unique_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_unique_users",
            "n_events",
        )
    )


def _jaccard_block_oracle() -> str:
    from news_ingestion_data_pipeline_spark.plans.llm import _SQL_SHINGLES
    from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM

    return f"""
WITH norm AS (
  SELECT doc_id, lang, CAST(round(n_chars, -2) AS BIGINT) AS len_bucket,
         {SQL_NORM.format(col='text')} AS s
  FROM documents
), sh AS (
  SELECT doc_id, lang, len_bucket, {_SQL_SHINGLES.format(s='s')} AS shingles
  FROM norm
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.shingles, b.shingles)) * 1.0
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
FROM sh a JOIN sh b
  ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0
      / (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= 0.5
"""


@register(
    "dedup_jaccard_prefix",
    oracle=_jaccard_block_oracle(),
    description="The SAME exact blocked Jaccard join as dedup_ngram_jaccard "
    "(identical output, identical oracle) via PREFIX FILTERING (PPJoin "
    "family): sort each doc's shingle set under a global order and "
    "generate candidates only from each doc's first sz - ceil(t*sz) + 1 "
    "shingles — any pair with J >= t MUST share a prefix element (I >= "
    "t*max(|A|,|B|), so all-shared-outside-prefix is a contradiction) — "
    "then verify candidates with one exact array_intersect each. The "
    "candidate shuffle shrinks ~4x (half the postings per key, squared) "
    "at the cost of a per-candidate array fetch; the inverted-index "
    "sibling counts intersections without touching arrays. Registering "
    "both documents the trade: prefix wins when the full posting join "
    "explodes (boilerplate-heavy corpora), the index wins when "
    "candidates are dense.",
    tags=("llm", "dedup"),
)
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX
    from news_ingestion_data_pipeline_spark.tables import spread

    hashed = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    # array_sort = the global order prefix filtering requires (any total
    # order works; ascending hash value needs no df statistics pass).
    d = (
        spread(t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "lang",
            F.round(F.col("n_chars"), -2).cast("bigint").alias("len_bucket"),
            F.array_sort(hashed).alias("shingles"),
        )
        .withColumn("sz", F.size("shingles"))
        # eager localCheckpoint, not lazy persist: the prefix explode and
        # both verify sides are scheduled concurrently in one job and a
        # lazy cache loses the race (all three recompute the shingling:
        # measured 47s vs 12s at 4k synthetic docs)
        .localCheckpoint()
    )
    prefix_len = (F.col("sz") - F.ceil(F.col("sz") * F.lit(0.5)) + 1).cast("int")
    # PPJoin's load-bearing detail: the global order the prefixes are taken
    # under is ASCENDING DOCUMENT FREQUENCY (rarest shingle first), not
    # hash value. Prefixes then hold each doc's rarest shingles, so the
    # candidate join's per-key fan-out is bounded by the df of RARE keys —
    # with a hash (i.e. random) order, boilerplate shingles land in
    # prefixes and contribute df^2 pairs (measured: 169s vs 23s at 16k
    # docs, and the gap widens quadratically with corpus size). One extra
    # hash-agg + equi-join + per-doc window pays for itself immediately.
    ex = d.select(
        "doc_id",
        "lang",
        "len_bucket",
        "sz",
        F.explode("shingles").alias("h"),
    )
    # df >= 2 only: shingles unique to one doc (the majority in a real
    # corpus) sort equivalently at df=1 via the coalesce, and the left
    # join's build side shrinks several-fold. shuffle_hash hint for the
    # same no-stats reason as below — this table is corpus-proportional,
    # never broadcastable at scale.
    dfreq = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df_raw"))
        .filter(F.col("df_raw") >= 2)
    )
    rn_w = Window.partitionBy("doc_id").orderBy("df", "h")
    pre = (
        ex.hint("shuffle_hash")
        .join(dfreq, "h", "left")
        .withColumn("df", F.coalesce(F.col("df_raw"), F.lit(1)))
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "lang", "len_bucket", "sz", "h")
    )
    # shuffle_hash hint: the checkpointed RDD scan carries no size stats,
    # so the planner happily BROADCASTS the multi-million-row exploded
    # prefix table (measured 50s at 4k docs; 7s once shuffled). A posting
    # self-join must shuffle on its key at any real scale.
    a, b = pre.alias("a").hint("shuffle_hash"), pre.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.greatest(F.col("a.sz"), F.col("b.sz"))
                <= F.lit(2) * F.least(F.col("a.sz"), F.col("b.sz"))
            ),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    fa = d.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("sz").alias("sa"),
    )
    fb = d.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("sz").alias("sb"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        # Verify-join strategy, measured at 4k/16k synthetic docs:
        # BROADCAST of the doc->array map (what the planner picks here)
        # streams candidate pairs against an in-memory lookup and never
        # materializes the |cand| x array-width intermediate through a
        # shuffle — 35s at 16k docs, vs 160s for SMJ (sorts that
        # intermediate) and OOM for shuffle_hash (unspillable hash
        # relation over wide arrays). It is the right plan WHILE the
        # doc->shingle map fits executor memory; beyond that the verify
        # runs per block/band partition where each group's array subset
        # fits — the candidate-generation joins above are already
        # hint-forced to shuffle, which is where the corpus-proportional
        # data moves.
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") * F.lit(1.0)
                / (F.col("sa") + F.col("sb") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )


@register(
    "curation_mix_weights",
    oracle="""
WITH per_source AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(n_chars) AS n_chars_total
  FROM documents
  GROUP BY source
), tot AS (
  SELECT SUM(n_chars_total) AS corpus_chars,
         COUNT(*) AS n_sources
  FROM per_source
)
SELECT source, n_docs, CAST(n_chars_total AS BIGINT) AS n_chars_total,
       CAST(n_chars_total AS DOUBLE) / corpus_chars AS actual_share,
       (1.0 / n_sources) / (CAST(n_chars_total AS DOUBLE) / corpus_chars)
         AS uniform_weight
FROM per_source CROSS JOIN tot
""",
    description="Training-mix reweighting: per-source corpus shares (by "
    "character mass) and the sampling weight that would equalize the mix "
    "— the knob a data pipeline turns to hit a target domain "
    "distribution. One partial+final aggregate over the corpus produces "
    "per-source totals; the corpus-wide total is a second aggregate over "
    "those FEW rows joined back broadcast-style, so nothing "
    "corpus-sized crosses the wire twice. Shares and weights are single "
    "IEEE divisions over exact integer sums — bit-identical to the "
    "oracle.",
    tags=("curation", "agg"),
)
def curation_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_source = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )
    tot = per_source.agg(
        F.sum("n_chars_total").alias("corpus_chars"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    share = F.col("n_chars_total").cast("double") / F.col("corpus_chars")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_chars_total",
        share.alias("actual_share"),
        (F.lit(1.0) / F.col("n_sources") / share).alias("uniform_weight"),
    )


@register(
    "pipeline_scd2_intervals",
    oracle="""
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
  WHERE user_id % 100 = 0
), changes AS (
  SELECT user_id, event_type, ts
  FROM marked
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
            AS BOOLEAN) AS is_current
FROM changes
""",
    description="Slowly-changing-dimension type-2 history build: collapse "
    "each user's event stream to state-change points (event_type differs "
    "from lag), then derive [valid_from, valid_to) intervals via lead and "
    "flag the open row — the standard warehouse pattern for turning a "
    "change stream into a versioned dimension. Both windows cluster on "
    "user_id, so the whole build is ONE exchange + in-partition sorts "
    "(same single-shuffle property as window_running_distinct); the "
    "keyed-upsert sink (pipeline_upsert_merge) is its type-1 sibling.",
    tags=("pipeline", "window", "scd"),
)
def pipeline_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_changes = Window.partitionBy("user_id").orderBy("ts")
    changes = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 100 == 0)
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "event_type", "ts")
    )
    valid_to = F.lead("ts").over(w_changes)
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(valid_to, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "events_rolling_anomaly",
    oracle="""
WITH scoped AS (
  SELECT user_id, ts, event_id, value FROM events WHERE user_id % 50 = 0
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       event_id,
       CAST(value AS DOUBLE) AS value,
       CASE WHEN COUNT(*) OVER w > 0
            THEN CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) OVER w AS VARCHAR) AS DOUBLE)
                 / COUNT(*) OVER w
       END AS mean_prev20,
       CAST(COUNT(*) OVER w > 0
            AND CAST(value AS DOUBLE)
                > 2.0 * (CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) OVER w AS VARCHAR) AS DOUBLE) / COUNT(*) OVER w)
            AS BOOLEAN) AS is_spike
FROM scoped
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
""",
    description="Rolling anomaly flag: each event compared to the mean of "
    "the user's previous 20 values (trailing row frame, excluding the "
    "current row) — the monitoring primitive for metric streams. Frame "
    "sums go through exact decimals so the mean is one IEEE division and "
    "the flag is reproducible at any partitioning; one hash(user_id) "
    "exchange, state per row is the 20-row frame. The same shape runs "
    "under Structured Streaming as the deviation check over "
    "applyInPandasWithState-carried running stats.",
    tags=("events", "window", "anomaly"),
)
def events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    n_prev = F.count(F.lit(1)).over(w)
    mean_prev = F.sum(F.col("value").cast("decimal(20,10)")).over(w).cast(
        "double"
    ) / n_prev
    val = F.col("value").cast("double")
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 50 == 0)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "event_id",
            val.alias("value"),
            F.when(n_prev > 0, mean_prev).alias("mean_prev20"),
            ((n_prev > 0) & (val > 2.0 * mean_prev)).alias("is_spike"),
        )
    )


@register(
    "text_feature_hashing",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tk
  FROM documents
), bucketed AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT) % 8 AS bucket
  FROM tok
)
SELECT doc_id,
       CAST(SUM(CASE WHEN bucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0,
       CAST(SUM(CASE WHEN bucket = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN bucket = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
       CAST(SUM(CASE WHEN bucket = 3 THEN 1 ELSE 0 END) AS BIGINT) AS f3,
       CAST(SUM(CASE WHEN bucket = 4 THEN 1 ELSE 0 END) AS BIGINT) AS f4,
       CAST(SUM(CASE WHEN bucket = 5 THEN 1 ELSE 0 END) AS BIGINT) AS f5,
       CAST(SUM(CASE WHEN bucket = 6 THEN 1 ELSE 0 END) AS BIGINT) AS f6,
       CAST(SUM(CASE WHEN bucket = 7 THEN 1 ELSE 0 END) AS BIGINT) AS f7
FROM bucketed
GROUP BY doc_id
""",
    description="Feature hashing (the hashing trick): each document's "
    "token stream folded into a fixed 8-bucket count vector via "
    "md5-bucket assignment — the stateless, vocabulary-free featurizer "
    "for ML at corpus scale (no dictionary to build, ship, or skew). One "
    "explode + one partial+final aggregate; the shuffle carries 8 ints "
    "per doc regardless of document length. The md5-prefix bucket hash "
    "is engine-portable, so the oracle hashes identically.",
    tags=("text", "ml"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    tok = spread(t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tk"),
    )
    bucket = F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long") % 8
    return (
        tok.withColumn("bucket", bucket)
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("bucket") == k, 1).otherwise(0)).alias(f"f{k}")
                for k in range(8)
            ]
        )
    )


@register(
    "agg_approx_percentile",
    # Epsilon-bound oracle: GK (Spark) vs t-digest (DuckDB) estimates can
    # never be bit-compared, so the VERIFIED output is the exact
    # interpolated quantiles plus booleans asserting each sketch estimate
    # lies inside the exact [q(p-0.01), q(p+0.01)] band. approx_percentile's
    # default accuracy (10000) bounds rank error at 1e-4*n — two orders of
    # magnitude inside the 0.01 rank band — so the booleans are
    # deterministically TRUE when the sketch honors its contract, and the
    # oracle asserts exactly that.
    oracle="""
SELECT l_returnflag,
       TRUE AS p50_within_band,
       TRUE AS p90_within_band,
       TRUE AS p99_within_band,
       quantile_cont(l_extendedprice, 0.5)  AS p50_exact,
       quantile_cont(l_extendedprice, 0.9)  AS p90_exact,
       quantile_cont(l_extendedprice, 0.99) AS p99_exact,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    description="Approximate p50/p90/p99 of extended price per return "
    "flag via approx_percentile (Greenwald-Khanna sketch) — the bounded-"
    "memory quantile path whose sketch, like HLL, merges associatively "
    "across partitions (map-side partials, tiny final merge). Oracle-"
    "verified via rank-epsilon bands: each estimate must fall between the "
    "exact quantiles at p-0.01 and p+0.01 (booleans the oracle asserts "
    "TRUE), alongside the exact interpolated quantiles themselves.",
    tags=("agg", "sketch"),
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    agged = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5)).alias("p50_est"),
            F.approx_percentile("l_extendedprice", F.lit(0.9)).alias("p90_est"),
            F.approx_percentile("l_extendedprice", F.lit(0.99)).alias("p99_est"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_exact"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_exact"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99_exact"),
            F.percentile("l_extendedprice", F.lit(0.49)).alias("p50_lo"),
            F.percentile("l_extendedprice", F.lit(0.51)).alias("p50_hi"),
            F.percentile("l_extendedprice", F.lit(0.89)).alias("p90_lo"),
            F.percentile("l_extendedprice", F.lit(0.91)).alias("p90_hi"),
            F.percentile("l_extendedprice", F.lit(0.98)).alias("p99_lo"),
            F.percentile("l_extendedprice", F.lit(1.0)).alias("p99_hi"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )

    def band(est: str, lo: str, hi: str):
        return (F.col(est) >= F.col(lo)) & (F.col(est) <= F.col(hi))

    return agged.select(
        "l_returnflag",
        band("p50_est", "p50_lo", "p50_hi").alias("p50_within_band"),
        band("p90_est", "p90_lo", "p90_hi").alias("p90_within_band"),
        band("p99_est", "p99_lo", "p99_hi").alias("p99_within_band"),
        "p50_exact",
        "p90_exact",
        "p99_exact",
        "n_rows",
    )


@register(
    "graph_pagerank_transitions",
    # Generated oracle: the 15 iterations unrolled as materialized DuckDB
    # CTEs r0..r15 (plans/oracle_sqlgen.pagerank_oracle) with term-for-term
    # identical IEEE arithmetic; round(.,8) absorbs summation-order drift.
    # Also property-tested against a numpy power-iteration model
    # (tests/test_properties.py).
    oracle=OSQL.pagerank_oracle(),
    description="PageRank over the event-type transition digraph (edges = "
    "lag-derived next-event transitions weighted by count, from the same "
    "construction as events_transition_matrix): 15 fixed iterations of "
    "the standard distributed update — ranks JOIN edges on src, "
    "contributions SUM by dst, damping 0.85 with dangling mass "
    "redistributed uniformly. Each iteration is one join + one "
    "aggregate; rank state is O(#nodes), never materialized on the "
    "driver; the edge table is computed ONCE and persisted across "
    "iterations. The graph sibling of connected components "
    "(dedup_connected_clusters) — together they cover the iterative-"
    "algorithm class. Rows-only oracle; exactness is property-tested "
    "against a numpy power-iteration model.",
    tags=("graph", "iterative"),
)
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        t(spark, sf_dir, "events")
        .withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_weight"))
    edges = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("weight") / F.col("out_weight")).alias("prob"))
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    # localCheckpoint per round truncates the rank lineage (same trick as
    # connected components): without it each iteration's plan embeds all
    # previous iterations and the per-round dangling-mass job recomputes
    # the whole history.
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank")).localCheckpoint()
    has_out = edges.select("src").distinct()
    for _ in range(15):
        dangling = (
            ranks.join(has_out, ranks.node == has_out.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            ranks.join(edges, ranks.node == edges.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("prob")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit(0.15 / n)
                    + 0.85
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + dangling / n)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", F.round("rank", 8).alias("pagerank")
    )


@register(
    "text_cooccurrence_lift",
    oracle="""
WITH tok AS (
  SELECT DISTINCT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tk
  FROM documents
), uni AS (
  SELECT tk, COUNT(*) AS n_t FROM tok GROUP BY tk
), n_docs AS (
  SELECT COUNT(DISTINCT doc_id) AS n FROM tok
), pairs AS (
  SELECT a.tk AS tk_a, b.tk AS tk_b, COUNT(*) AS n_ab
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.tk < b.tk
  GROUP BY a.tk, b.tk
)
SELECT tk_a, tk_b, n_ab, ua.n_t AS n_a, ub.n_t AS n_b,
       CAST(n_ab * n AS DOUBLE) / (ua.n_t * ub.n_t) AS lift
FROM pairs
JOIN uni ua ON ua.tk = tk_a
JOIN uni ub ON ub.tk = tk_b
CROSS JOIN n_docs
WHERE n_ab >= 5
ORDER BY lift DESC, tk_a, tk_b
LIMIT 30
""",
    description="Token co-occurrence mining: document-level lift "
    "n_ab·N/(n_a·n_b) for every token pair sharing a document — PMI's "
    "rational core, kept log-free so the score is one IEEE division over "
    "exact integer counts (cross-engine bit-identical; F.log drifts "
    "between JVM and libm). Pair generation is a doc-keyed self-join of "
    "DISTINCT per-doc tokens, so the blow-up is bounded by "
    "distinct-tokens-per-doc², not document length; unigram counts join "
    "back broadcast-side and the corpus size joins as a 1-row scalar. "
    "Top-30 under a total order.",
    tags=("text", "mining"),
)
def text_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    tok = (
        spread(t(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
            ).alias("tk"),
        )
        .persist()  # read by the pair self-join (twice) + unigrams + N
    )
    uni = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("n_t"))
    n_docs = tok.agg(F.countDistinct("doc_id").alias("n"))
    a, b = tok.alias("a"), tok.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tk") < F.col("b.tk")),
        )
        .groupBy(F.col("a.tk").alias("tk_a"), F.col("b.tk").alias("tk_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    ua = uni.select(F.col("tk").alias("tk_a"), F.col("n_t").alias("n_a"))
    ub = uni.select(F.col("tk").alias("tk_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(ua), "tk_a")
        .join(F.broadcast(ub), "tk_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tk_a",
            "tk_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                (F.col("n_ab") * F.col("n")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "tk_a", "tk_b")
        .limit(30)
    )


@register(
    "pipeline_backfill_hours",
    oracle="""
WITH sparse AS (
  SELECT date_trunc('hour', ts) AS h FROM events WHERE event_id % 199 = 0
), bounds AS (
  SELECT min(h) AS lo, max(h) AS hi FROM sparse
), expected AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
)
SELECT strftime(e.h, '%Y-%m-%d %H:%M:%S') AS missing_hour
FROM expected e
LEFT JOIN (SELECT DISTINCT h FROM sparse) o ON e.h = o.h
WHERE o.h IS NULL
""",
    description="Backfill-gap detection: the hours inside a sparse "
    "series' observed [min, max] span with NO data — the operational "
    "query every incremental pipeline runs before scheduling catch-up "
    "loads (the calendar-complement of the reference's watermark scan). "
    "The expected calendar comes from F.sequence over a 1-row bounds "
    "aggregate (never materialized driver-side), anti-joined against "
    "observed distinct hours; at 100 TB the observed side partial-"
    "aggregates to one row per hour map-side before the tiny join.",
    tags=("pipeline", "calendar"),
)
def pipeline_backfill_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    sparse = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 199 == 0)
        .select(F.date_trunc("hour", "ts").alias("h"))
    )
    observed = sparse.distinct()
    expected = (
        sparse.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h")
        )
    )
    return (
        expected.join(observed, "h", "left_anti")
        .select(F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("missing_hour"))
        
    )


@register(
    "curation_winsorize",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
), cuts AS (
  SELECT lang,
         MIN(CASE WHEN rn = CAST(ceil(0.05 * n) AS BIGINT) THEN n_chars END)
           AS p05,
         MIN(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN n_chars END)
           AS p95
  FROM ranked GROUP BY lang
)
SELECT r.doc_id, r.lang, r.n_chars,
       GREATEST(LEAST(r.n_chars, c.p95), c.p05) AS n_chars_winsorized,
       CAST(r.n_chars < c.p05 OR r.n_chars > c.p95 AS BOOLEAN) AS clipped
FROM ranked r JOIN cuts c ON r.lang = c.lang
""",
    description="Per-language winsorization: clip document lengths to the "
    "exact nearest-rank [p5, p95] band — the robust-statistics "
    "preprocessing step before any length-sensitive quality model. "
    "Nearest-rank cutpoints (integer row positions, no interpolation) "
    "keep the oracle bit-exact; the cut table is |langs| rows and joins "
    "back broadcast-side, so the corpus is scanned twice and shuffled "
    "once (the rank window). At 100 TB the window sort per lang is the "
    "cost — or swap in the approx_percentile sketch when exact cuts can "
    "be traded away.",
    tags=("curation", "stats"),
)
def curation_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    rank_w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    cnt_w = Window.partitionBy("lang")
    ranked = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(rank_w).alias("rn"),
        F.count(F.lit(1)).over(cnt_w).alias("n"),
    )
    cuts = ranked.groupBy("lang").agg(
        F.min(
            F.when(
                F.col("rn") == F.ceil(0.05 * F.col("n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).alias("p05"),
        F.min(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).alias("p95"),
    )
    return ranked.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.greatest(F.least("n_chars", F.col("p95")), F.col("p05")).alias(
            "n_chars_winsorized"
        ),
        ((F.col("n_chars") < F.col("p05")) | (F.col("n_chars") > F.col("p95"))).alias(
            "clipped"
        ),
    )


@register(
    "pipeline_quarantine_split",
    oracle="""
SELECT doc_id, lang, n_chars,
       concat_ws(',',
         CASE WHEN n_chars < 80 THEN 'too_short' END,
         CASE WHEN n_chars <> length(text) THEN 'length_mismatch' END,
         CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es', 'zh')
              THEN 'unknown_lang' END,
         CASE WHEN trim(text) = '' THEN 'empty_text' END
       ) AS reasons,
       CAST((n_chars >= 80) AND (n_chars = length(text))
            AND lang IN ('en', 'de', 'fr', 'es', 'zh')
            AND trim(text) <> '' AS BOOLEAN) AS is_valid
FROM documents
""",
    description="Data-quality routing with reason codes — the declarative "
    "form of the reference's per-article parse-failure tolerance "
    "(SURVEY.md §2.10 E2: log + skip / NULL field → here every row "
    "carries WHY it failed, and the valid/quarantine split is a "
    "downstream filter, not a dropped log line). All checks are one "
    "codegen projection over the scan; at 100 TB the quarantined side "
    "writes to its own table for replay after a parser fix — the "
    "pattern the keyed upsert makes idempotent.",
    tags=("pipeline", "quality"),
)
def pipeline_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    known = ("en", "de", "fr", "es", "zh")
    too_short = F.col("n_chars") < 80
    mismatch = F.col("n_chars") != F.length("text")
    bad_lang = ~F.col("lang").isin(*known)
    empty = F.trim("text") == ""
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.concat_ws(
            ",",
            F.when(too_short, "too_short"),
            F.when(mismatch, "length_mismatch"),
            F.when(bad_lang, "unknown_lang"),
            F.when(empty, "empty_text"),
        ).alias("reasons"),
        (~too_short & ~mismatch & ~bad_lang & ~empty).alias("is_valid"),
    )


@register(
    "agg_weighted_median",
    oracle="""
WITH cum AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(CAST(l_quantity AS BIGINT))
           OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median_price,
       CAST(MIN(tw) AS BIGINT) AS total_weight
FROM cum
WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
    description="Exact quantity-weighted median price per return flag: "
    "running weight sum in price order, first row whose cumulative "
    "weight reaches half the total. The crossing set is a suffix of the "
    "price order, so MIN(price) over it IS the first crossing — no "
    "second window needed. All-integer weight arithmetic (2·cum >= "
    "total avoids the fractional midpoint), so the oracle is bit-exact. "
    "One shuffle on the group key; the same nearest-rank machinery as "
    "the unweighted percentiles, generalized to weights — the aggregate "
    "Spark has no builtin for.",
    tags=("agg", "stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    run_w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("l_returnflag")
    qty = F.col("l_quantity").cast("bigint")
    cum = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(qty).over(run_w).alias("cw"),
        F.sum(qty).over(tot_w).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.min("tw").alias("total_weight"),
        )
    )


@register(
    "events_peak_concurrency",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR epoch_us(ts)
                  - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                  > 600000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM flagged
), sessions AS (
  SELECT user_id, sess, MIN(ts) AS t_start, MAX(ts) AS t_end
  FROM numbered GROUP BY user_id, sess
), deltas AS (
  SELECT t_start AS t, 1 AS delta FROM sessions
  UNION ALL
  SELECT t_end AS t, -1 AS delta FROM sessions
), swept AS (
  SELECT t, delta,
         SUM(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS concurrent
  FROM deltas
)
SELECT CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent_sessions,
       strftime(MIN(CASE WHEN concurrent = (SELECT MAX(concurrent) FROM swept)
                         THEN t END), '%Y-%m-%d %H:%M:%S') AS first_peak_at
FROM swept
""",
    description="Peak concurrent sessions via sweep line: sessionize "
    "(10-minute gap rule, the same construction as window_session_10m), "
    "emit +1/-1 boundary deltas per session interval, order globally "
    "with ends before starts at equal timestamps (delta ascending — "
    "touching sessions don't overlap), and take the running sum's "
    "maximum and its first time. The swept relation is two rows per "
    "SESSION (orders of magnitude smaller than events), and the running "
    "sum is the two-pass bucketed prefix sum (operators/ranking.py: "
    "time-range buckets, per-bucket partials broadcast as carry-ins) — "
    "no single-partition window at any SF.",
    tags=("events", "window", "sweepline"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # (ts, event_id) total order: duplicate timestamps within a user must
    # number sessions identically in both engines, so the running-sum window
    # uses the same tiebreak as the lag window above.
    run_user = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag(F.col("ts")).over(per_user).cast("timestamp"))
    flagged = t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev_us.isNull() | (ts_us - prev_us > 600_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = (
        flagged.withColumn("sess", F.sum("is_new").over(run_user))
        .groupBy("user_id", "sess")
        .agg(F.min("ts").alias("t_start"), F.max("ts").alias("t_end"))
    )
    deltas = sessions.select(F.col("t_start").alias("t"), F.lit(1).alias("delta")).unionAll(
        sessions.select(F.col("t_end").alias("t"), F.lit(-1).alias("delta"))
    )
    # the sweep's global running sum is the two-pass bucketed prefix sum
    # (operators/ranking.py) over time-range buckets — no single-
    # partition window over the session-boundary relation
    denv = deltas.agg(F.min("t").alias("t_lo"), F.max("t").alias("t_hi"))
    swept = RK.distributed_prefix_sum(
        deltas.crossJoin(F.broadcast(denv)),
        ["t", "delta"],
        RK.range_bucket(
            F.unix_micros(F.col("t").cast("timestamp")),
            F.unix_micros(F.col("t_lo").cast("timestamp")),
            F.unix_micros(F.col("t_hi").cast("timestamp")),
        ),
        ["delta"],
        inclusive=True,
    ).select("t", "delta", F.col("cum_delta").alias("concurrent"))
    peak = swept.agg(F.max("concurrent").alias("peak"))
    return (
        swept.join(F.broadcast(peak), swept.concurrent == peak.peak)
        .agg(
            F.min("peak").alias("peak_concurrent_sessions"),
            F.date_format(F.min("t"), "yyyy-MM-dd HH:mm:ss").alias("first_peak_at"),
        )
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
WITH du AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2000-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
), dau AS (
  SELECT day_num, COUNT(*) AS dau FROM du GROUP BY day_num
), contrib AS (
  SELECT user_id, unnest(range(day_num, day_num + 30)) AS target_day
  FROM du
), mau AS (
  SELECT target_day AS day_num, COUNT(DISTINCT user_id) AS mau
  FROM contrib GROUP BY target_day
)
SELECT strftime(DATE '2000-01-01' + INTERVAL (d.day_num) DAY,
                '%Y-%m-%d') AS day,
       d.dau, m.mau,
       CAST(d.dau AS DOUBLE) / m.mau AS stickiness
FROM dau d JOIN mau m ON d.day_num = m.day_num
""",
    description="DAU/MAU stickiness per day — the rolling-30-day distinct "
    "count expressed scalably: dedupe to (user, day) pairs first (the "
    "corpus-sized aggregate, done ONCE), then each pair contributes to "
    "its 30 trailing target days via an integer sequence explode, and "
    "MAU is a count-distinct over the 30x-amplified PAIR table — never "
    "over raw events. Rolling COUNT(DISTINCT) has no window form in "
    "either engine; this explode-regroup is the standard rewrite. "
    "Integer day arithmetic end-to-end; stickiness is one IEEE "
    "division.",
    tags=("events", "agg", "distinct"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    anchor = F.lit("2000-01-01").cast("date")
    du = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), anchor).alias("day_num"),
        )
        .distinct()
    )
    dau = du.groupBy("day_num").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day_num"), F.col("day_num") + 29)
        ).alias("day_num"),
    )
    mau = contrib.groupBy("day_num").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, "day_num")
        .select(
            F.date_format(F.date_add(anchor, F.col("day_num")), "yyyy-MM-dd").alias(
                "day"
            ),
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
    )


@register(
    "agg_percentile_cont",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
    description="Exact linear-interpolated percentiles (percentile_cont "
    "semantics) per return flag — F.percentile against DuckDB "
    "quantile_cont, verified BIT-IDENTICAL under MV_STRICT (both engines "
    "interpolate lo + (hi-lo)·frac on the same sorted neighbors). "
    "Completes the quantile triptych: nearest-rank "
    "(agg_percentile_ranks), interpolated (this), and sketch "
    "(agg_approx_percentile). Exact percentiles buffer per-group values "
    "— the sketch is the 100 TB default; this is the small-group / "
    "final-report path.",
    tags=("agg", "stats"),
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "scalar_string_pad_suite",
    oracle="""
SELECT doc_id,
       upper(lang) AS lang_up,
       lpad(lang, 5, '_') AS lang_lpad,
       rpad(lang, 5, '.') AS lang_rpad,
       reverse(source) AS src_rev,
       repeat(lang, 3) AS lang_x3,
       replace(source, 'src', 'corpus-') AS src_renamed,
       substr(md5(source), 1, 6) AS src_tag,
       length(translate(lang, 'aeiou', '')) AS lang_consonants
FROM documents
WHERE doc_id % 11 = 0
""",
    description="Second string-scalar suite: pad/reverse/repeat/replace/"
    "translate — the formatting primitives ID-generation and display "
    "layers lean on, all JVM codegen expressions over a 3-column pruned "
    "scan. translate with an empty replacement deletes characters in "
    "both engines (vowel-strip length check).",
    tags=("scalar", "string"),
)
def scalar_string_pad_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 11 == 0)
        .select(
            "doc_id",
            F.upper("lang").alias("lang_up"),
            F.lpad("lang", 5, "_").alias("lang_lpad"),
            F.rpad("lang", 5, ".").alias("lang_rpad"),
            F.reverse("source").alias("src_rev"),
            F.repeat("lang", 3).alias("lang_x3"),
            F.replace(F.col("source"), F.lit("src"), F.lit("corpus-")).alias(
                "src_renamed"
            ),
            F.substring(F.md5("source"), 1, 6).alias("src_tag"),
            F.length(F.translate("lang", "aeiou", "")).alias("lang_consonants"),
        )
    )


@register(
    "agg_bool_logic",
    oracle="""
SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_over_400k,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
         AS n_over_200k,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    description="Boolean aggregate logic per priority class: bool_and / "
    "bool_or (ANSI every/any) ride the same partial+final hash aggregate "
    "as the counts — short-circuiting map-side (a partition that has "
    "seen a false for bool_and carries one bit). The assertion-style "
    "aggregate data-quality suites are built from.",
    tags=("agg", "bool"),
)
def agg_bool_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
            F.count_if(F.col("o_totalprice") > 200000).alias("n_over_200k"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "scalar_regex_suite",
    oracle=r"""
SELECT event_id,
       regexp_extract(props, '"k":\s*(\d+)', 1) AS k_val,
       length(regexp_replace(props, '[^0-9]', '', 'g')) AS n_digits,
       regexp_extract(props, '(\d+)', 1) AS first_num,
       regexp_matches(props, '^\{.*\}$') AS looks_json,
       regexp_replace(props, '\d+', '#', 'g') AS masked
FROM events
WHERE event_id % 501 = 0
""",
    description="Regex scalar suite over the JSON props column: group "
    "extraction, digit counting (expressed as strip-and-length in the "
    "oracle — DuckDB lacks regexp_count), full-match predicate, global "
    "masking. Patterns stay in the POSIX-common subset where Java and "
    "RE2 semantics agree — verified bit-identical. All JVM codegen over "
    "a 2-column pruned scan.",
    tags=("scalar", "regex"),
)
def scalar_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 501 == 0)
        .select(
            "event_id",
            F.regexp_extract("props", r'"k":\s*(\d+)', 1).alias("k_val"),
            F.expr("regexp_count(props, '[0-9]')").alias("n_digits"),
            F.regexp_extract("props", r"(\d+)", 1).alias("first_num"),
            F.col("props").rlike(r"^\{.*\}$").alias("looks_json"),
            F.regexp_replace("props", r"\d+", "#").alias("masked"),
        )
    )


@register(
    "join_null_safe",
    oracle="""
WITH keyed AS (
  SELECT l_orderkey, l_linenumber,
         NULLIF(l_linenumber % 3, 0) AS k
  FROM lineitem WHERE l_orderkey % 997 = 0
)
SELECT a.l_orderkey AS ok_a, a.l_linenumber AS ln_a,
       b.l_orderkey AS ok_b, b.l_linenumber AS ln_b,
       a.k AS shared_key
FROM keyed a JOIN keyed b
  ON a.k IS NOT DISTINCT FROM b.k
 AND (a.l_orderkey < b.l_orderkey
      OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
""",
    description="Null-safe equality join (<=> / IS NOT DISTINCT FROM): "
    "NULL keys match each other instead of vanishing — the semantics "
    "backfill and dimension-conformance joins need when the key itself "
    "is legitimately absent. Spark plans eqNullSafe as an ordinary hash "
    "join (NULL hashes to a regular bucket), so unlike an OR-based "
    "rewrite it keeps the equi-join fast path; the pair ordering "
    "predicate dedups the self-join.",
    tags=("join", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 997 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_linenumber") % 3, F.lit(0)).alias("k"),
        )
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return a.join(
        b,
        F.col("a.k").eqNullSafe(F.col("b.k"))
        & (
            (F.col("a.l_orderkey") < F.col("b.l_orderkey"))
            | (
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            )
        ),
    ).select(
        F.col("a.l_orderkey").alias("ok_a"),
        F.col("a.l_linenumber").alias("ln_a"),
        F.col("b.l_orderkey").alias("ok_b"),
        F.col("b.l_linenumber").alias("ln_b"),
        F.col("a.k").alias("shared_key"),
    )


@register(
    "pipeline_dedup_survivorship",
    oracle="""
WITH ranked AS (
  SELECT doc_id, text, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY md5(text)
           ORDER BY CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 ELSE 2 END,
                    n_chars DESC, doc_id
         ) AS rn,
         COUNT(*) OVER (PARTITION BY md5(text)) AS n_dups
  FROM documents
)
SELECT doc_id, lang, source, n_chars, n_dups
FROM ranked WHERE rn = 1
""",
    description="Dedup with a SURVIVORSHIP RULE: instead of keep-min-id, "
    "the surviving row per exact-text fingerprint is chosen by a "
    "business priority (preferred language, then longest, then stable "
    "id tiebreak) — the master-data-management form of exact dedup "
    "(golden-record selection). Same single row_number window as "
    "pipeline_exact_dedup, different ORDER BY; n_dups rides the same "
    "partition for free.",
    tags=("pipeline", "dedup"),
)
def pipeline_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    priority = (
        F.when(F.col("lang") == "en", 0).when(F.col("lang") == "de", 1).otherwise(2)
    )
    w = Window.partitionBy(F.md5("text")).orderBy(
        priority, F.desc("n_chars"), "doc_id"
    )
    cnt_w = Window.partitionBy(F.md5("text"))
    return (
        t(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(cnt_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_chars", "n_dups")
    )


@register(
    "window_gap_fill_locf",
    oracle="""
WITH scoped AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(value AS DECIMAL(20,10)) AS v
  FROM events WHERE user_id % 200 = 0
), hourly AS (
  SELECT user_id, h, CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_value
  FROM scoped GROUP BY user_id, h
), spans AS (
  SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM spans
)
SELECT g.user_id,
       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
       hr.avg_value,
       last_value(hr.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_filled,
       CAST(hr.avg_value IS NULL AS BOOLEAN) AS was_gap
FROM grid g LEFT JOIN hourly hr ON hr.user_id = g.user_id AND hr.h = g.h
""",
    description="Gap filling with last-observation-carried-forward: "
    "densify each user's hourly series over its own [min, max] span "
    "(F.sequence on a per-user bounds row — the grid is generated, "
    "never stored), left-join real observations, and forward-fill via "
    "last(ignoreNulls) over the user's timeline. The time-series "
    "regularization every downstream resampler assumes; hourly means go "
    "through decimal sums so observed values are bit-identical, and the "
    "fill copies those exact doubles. One shuffle on user_id serves the "
    "aggregate, the join, and the fill window.",
    tags=("window", "timeseries"),
)
def window_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 200 == 0)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value")
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    fill_w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "avg_value",
            F.last("avg_value", ignorenulls=True).over(fill_w).alias("value_filled"),
            F.col("avg_value").isNull().alias("was_gap"),
        )
    )


@register(
    "events_activity_heatmap",
    oracle="""
SELECT EXTRACT(dow FROM ts) AS day_of_week,
       EXTRACT(hour FROM ts) AS hour_of_day,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(20,10))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    description="2-D activity heatmap: day-of-week x hour-of-day event "
    "density — the usage-pattern grid behind load forecasting and "
    "anomaly baselines. One partial+final aggregate into at most 168 "
    "groups, so the shuffle is constant-size at any corpus scale. "
    "Spark dayofweek is 1-7 Sunday-first vs DuckDB's 0-6 — aligned by "
    "subtracting one (the cross-engine calendar trap documented in "
    "events_similar_users).",
    tags=("events", "agg", "calendar"),
)
def events_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            (F.dayofweek("ts") - 1).cast("bigint").alias("day_of_week"),
            F.hour("ts").cast("bigint").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,10)")).cast("double").alias(
                "sum_value"
            ),
        )
    )


@register(
    "lineitem_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_rev
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey,
         CAST(part_rev AS DOUBLE) AS part_revenue,
         CAST(CAST(SUM(part_rev) OVER (ORDER BY part_rev DESC, l_partkey) AS VARCHAR) AS DOUBLE)
           / CAST(CAST(SUM(part_rev) OVER () AS VARCHAR) AS DOUBLE) AS cum_share
  FROM rev
)
SELECT l_partkey, part_revenue, cum_share,
       CASE WHEN cum_share <= 0.8 THEN 'A'
            WHEN cum_share <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
WHERE l_partkey % 17 = 0
""",
    description="ABC / Pareto classification: parts ranked by revenue, "
    "cumulative revenue share, 80/95 class cuts — the inventory-"
    "prioritization classic. Per-part revenue is an exact decimal "
    "aggregate; the running and grand totals stay decimal to the final "
    "double division, so cum_share is reproducible at any partitioning. "
    "The ORDER BY in the running sum is total (revenue desc, key) — "
    "ties can't flip classes between engines. The running sum is over "
    "the PART aggregate (|parts| rows), not lineitem, and runs as the "
    "two-pass bucketed prefix sum (operators/ranking.py) — no single-"
    "partition window at any SF.",
    tags=("agg", "window", "pareto"),
)
def lineitem_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("part_rev")
        )
    )
    # two-pass bucketed running sum (operators/ranking.py) over the part
    # aggregate, DESC via negated revenue buckets; the grand total rides
    # the same broadcast envelope — no single-partition window
    env = rev.agg(
        F.min("part_rev").alias("r_lo"),
        F.max("part_rev").alias("r_hi"),
        F.sum("part_rev").alias("grand"),
    )
    cum = RK.distributed_prefix_sum(
        rev.crossJoin(F.broadcast(env)),
        [F.desc("part_rev"), "l_partkey"],
        RK.range_bucket(-F.col("part_rev"), -F.col("r_hi"), -F.col("r_lo")),
        ["part_rev"],
        inclusive=True,
    )
    return (
        cum.select(
            "l_partkey",
            F.col("part_rev").cast("double").alias("part_revenue"),
            (
                F.col("cum_part_rev").cast("double")
                / F.col("grand").cast("double")
            ).alias("cum_share"),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.8, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C"),
        )
        .filter(F.col("l_partkey") % 17 == 0)
    )


@register(
    "orders_mom_growth",
    oracle="""
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT month,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
       CASE WHEN LAG(rev) OVER (ORDER BY month) IS NOT NULL
            THEN CAST(rev - LAG(rev) OVER (ORDER BY month) AS DOUBLE)
                 / CAST(LAG(rev) OVER (ORDER BY month) AS DOUBLE)
       END AS mom_growth
FROM monthly
""",
    description="Month-over-month revenue growth: monthly decimal-exact "
    "sums, lag, and a single-division growth rate — the reporting "
    "staple. The growth division subtracts in DECIMAL (exact) and "
    "divides once in DOUBLE, so both engines agree to the bit. The "
    "window is over |months| rows (a constant), not orders; the only "
    "corpus-sized work is the monthly partial+final aggregate.",
    tags=("agg", "window", "timeseries"),
)
def orders_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    monthly = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month"
            )
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        prev.cast("double").alias("prev_revenue"),
        F.when(
            prev.isNotNull(),
            (F.col("rev") - prev).cast("double") / prev.cast("double"),
        ).alias("mom_growth"),
    )


@register(
    "customer_rfm_segments",
    oracle="""
WITH per_cust AS (
  SELECT o_custkey AS c_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT c_custkey,
         strftime(last_order, '%Y-%m-%d') AS last_order,
         frequency,
         CAST(monetary_dec AS DOUBLE) AS monetary,
         NTILE(4) OVER (ORDER BY last_order DESC, c_custkey) AS r_quartile,
         NTILE(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_quartile,
         NTILE(4) OVER (ORDER BY monetary_dec DESC, c_custkey) AS m_quartile
  FROM per_cust
)
SELECT c_custkey, last_order, frequency, monetary,
       r_quartile, f_quartile, m_quartile,
       r_quartile || '-' || f_quartile || '-' || m_quartile AS rfm_segment
FROM scored
WHERE c_custkey % 13 = 0
""",
    description="RFM customer segmentation: recency / frequency / "
    "monetary quartiles (ntile over total orders with custkey "
    "tiebreaks, so quartile boundaries are engine-identical) composed "
    "into a segment code — the marketing-analytics workhorse. Monetary "
    "stays decimal through ranking; the three ranks share one pass "
    "over the |customers|-row aggregate, not orders, each running as "
    "the two-pass range-partitioned rank (operators/ranking.py, DESC "
    "via negated buckets) + exact ANSI ntile_from_rank arithmetic — "
    "no single-partition sort at any SF.",
    tags=("agg", "window", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order_d"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary_dec"),
        )
    )
    env = per_cust.agg(
        F.min("last_order_d").alias("d_lo"),
        F.max("last_order_d").alias("d_hi"),
        F.min("frequency").alias("f_lo"),
        F.max("frequency").alias("f_hi"),
        F.min("monetary_dec").alias("m_lo"),
        F.max("monetary_dec").alias("m_hi"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    # three two-pass global ranks (operators/ranking.py), DESC order via
    # negated range buckets — never a single-partition NTILE sort
    ranked = RK.distributed_row_number(
        per_cust.crossJoin(F.broadcast(env)),
        [F.desc("last_order_d"), "c_custkey"],
        RK.range_bucket(
            -F.unix_micros(F.col("last_order_d").cast("timestamp")),
            -F.unix_micros(F.col("d_hi").cast("timestamp")),
            -F.unix_micros(F.col("d_lo").cast("timestamp")),
        ),
        out="r_rn",
    )
    ranked = RK.distributed_row_number(
        ranked,
        [F.desc("frequency"), "c_custkey"],
        RK.range_bucket(-F.col("frequency"), -F.col("f_hi"), -F.col("f_lo")),
        out="f_rn",
    )
    ranked = RK.distributed_row_number(
        ranked,
        [F.desc("monetary_dec"), "c_custkey"],
        RK.range_bucket(
            -F.col("monetary_dec"), -F.col("m_hi"), -F.col("m_lo")
        ),
        out="m_rn",
    )
    n = F.col("n_cust")
    return (
        ranked.select(
            "c_custkey",
            F.date_format("last_order_d", "yyyy-MM-dd").alias("last_order"),
            "frequency",
            F.col("monetary_dec").cast("double").alias("monetary"),
            RK.ntile_from_rank(F.col("r_rn"), n, 4).alias("r_quartile"),
            RK.ntile_from_rank(F.col("f_rn"), n, 4).alias("f_quartile"),
            RK.ntile_from_rank(F.col("m_rn"), n, 4).alias("m_quartile"),
        )
        .withColumn(
            "rfm_segment",
            F.concat_ws("-", "r_quartile", "f_quartile", "m_quartile"),
        )
        .filter(F.col("c_custkey") % 13 == 0)
    )


@register(
    "events_bot_heuristics",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) AS VARCHAR) AS DOUBLE) / 1000000.0
         AS span_sec,
       CASE WHEN epoch_us(MAX(ts)) > epoch_us(MIN(ts))
            THEN CAST(COUNT(*) AS DOUBLE)
                 / (CAST(CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) AS VARCHAR) AS DOUBLE)
                    / 1000000.0) * 60.0
       END AS events_per_min,
       CAST(COUNT(*) >= 50 AND COUNT(DISTINCT event_type) <= 2 AS BOOLEAN)
         AS flag_low_diversity,
       CAST(epoch_us(MAX(ts)) > epoch_us(MIN(ts))
            AND CAST(COUNT(*) AS DOUBLE)
                / (CAST(CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) AS VARCHAR) AS DOUBLE)
                   / 1000000.0) * 60.0 > 1.0
            AS BOOLEAN) AS flag_high_rate
FROM events
GROUP BY user_id
HAVING COUNT(*) >= 20
""",
    description="Bot/abuse heuristics per user — volume, behavioral "
    "diversity, and sustained event rate flags, the traffic-hygiene "
    "screen a training-data pipeline runs before trusting engagement "
    "signals. One aggregate pass (count-distinct rides the same "
    "shuffle); the rate is microsecond-exact span arithmetic with one "
    "double division chain, identical in both engines. HAVING prunes "
    "the long tail before any flag math ships.",
    tags=("events", "agg", "quality"),
)
def events_bot_heuristics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ts = F.col("ts").cast("timestamp")
    span_us = (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))).cast("double")
    span_sec = span_us / 1000000.0
    n = F.count(F.lit(1))
    rate = n.cast("double") / span_sec * 60.0
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            n.alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            span_sec.alias("span_sec"),
            F.when(span_us > 0, rate).alias("events_per_min"),
            ((n >= 50) & (F.countDistinct("event_type") <= 2)).alias(
                "flag_low_diversity"
            ),
            ((span_us > 0) & (rate > 1.0)).alias("flag_high_rate"),
        )
        .filter(F.col("n_events") >= 20)
    )


@register(
    "events_inter_arrival_stats",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         CAST(epoch_us(ts)
              - epoch_us(LAG(ts) OVER (PARTITION BY event_type, user_id
                                       ORDER BY ts, event_id))
              AS DOUBLE) / 1000000.0 AS gap_sec
  FROM events
)
SELECT event_type,
       COUNT(gap_sec) AS n_gaps,
       CAST(CAST(SUM(CAST(gap_sec AS DECIMAL(20,6))) AS VARCHAR) AS DOUBLE) / COUNT(gap_sec)
         AS mean_gap_sec,
       quantile_cont(gap_sec, 0.5) AS p50_gap_sec,
       quantile_cont(gap_sec, 0.9) AS p90_gap_sec,
       MAX(gap_sec) AS max_gap_sec
FROM gaps
WHERE gap_sec IS NOT NULL
GROUP BY event_type
""",
    description="Inter-arrival time distribution per event type: "
    "microsecond-exact lag gaps within each user's per-type stream, then "
    "count/mean/median/p90/max of the gap distribution — the foundation "
    "for rate limiting, session-timeout tuning (the 10-minute rule in "
    "window_session_10m came from exactly this query's p90), and "
    "synthetic-load modeling. Gap seconds are one exact-integer "
    "subtraction and one division; the mean goes through decimal; the "
    "interpolated quantiles ride the proven bit-exact percentile path. "
    "One shuffle for the lag window, a second for the small group "
    "aggregate.",
    tags=("events", "window", "stats"),
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    ts = F.col("ts").cast("timestamp")
    gap_sec = (
        (F.unix_micros(ts) - F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp")))
        .cast("double")
        / 1000000.0
    )
    return (
        t(spark, sf_dir, "events")
        .select("event_type", gap_sec.alias("gap_sec"))
        .filter(F.col("gap_sec").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_sec").alias("n_gaps"),
            (
                F.sum(F.col("gap_sec").cast("decimal(20,6)")).cast("double")
                / F.count("gap_sec")
            ).alias("mean_gap_sec"),
            F.percentile("gap_sec", F.lit(0.5)).alias("p50_gap_sec"),
            F.percentile("gap_sec", F.lit(0.9)).alias("p90_gap_sec"),
            F.max("gap_sec").alias("max_gap_sec"),
        )
    )


@register(
    "agg_hll_cardinality",
    # Epsilon-bound oracle: the Datasketches HLL estimate is sketch-
    # parameter-specific, so the VERIFIED output is the exact distinct
    # count per source (and globally) plus a boolean asserting the sketch
    # estimate — including the merged hll_union_agg global — landed within
    # 5% of exact (default lgConfigK=12 → rsd≈1.6%, so 5% ≈ 3 sigma). The
    # oracle emits TRUE; a hash match certifies both per-source sketches
    # AND the sketch MERGE path.
    oracle="""
SELECT source,
       TRUE AS est_within_eps,
       COUNT(DISTINCT doc_id) AS exact_distinct_docs
FROM documents
GROUP BY source
UNION ALL
SELECT 'ALL' AS source,
       TRUE AS est_within_eps,
       COUNT(DISTINCT doc_id) AS exact_distinct_docs
FROM documents
ORDER BY source
""",
    description="Mergeable HyperLogLog cardinality: per-source HLL "
    "sketches over doc_id (hll_sketch_agg), then a second aggregation "
    "that MERGES the per-source sketches (hll_union_agg) into a global "
    "estimate — the pattern that makes distinct-counting tractable at "
    "100 TB, where exact COUNT(DISTINCT) re-shuffles raw values but "
    "sketches reduce each partition to a fixed few-KB buffer that "
    "merges associatively (partial agg does almost all the work "
    "map-side). Oracle-verified via an epsilon bound: output carries the "
    "exact distinct count plus |est-exact|/exact <= 0.05 as a boolean the "
    "DuckDB side asserts TRUE for every source and for the merged global.",
    tags=("agg", "sketch"),
)
def agg_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sketch"),
        F.countDistinct("doc_id").alias("exact_distinct_docs"),
    )
    per_source_est = per_source.select(
        "source",
        F.hll_sketch_estimate("sketch").alias("est"),
        "exact_distinct_docs",
    )
    global_est = (
        per_source.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
        )
        .crossJoin(
            docs.agg(F.countDistinct("doc_id").alias("exact_distinct_docs"))
        )
        .select(F.lit("ALL").alias("source"), "est", "exact_distinct_docs")
    )
    both = per_source_est.unionByName(global_est)
    return both.select(
        "source",
        (
            F.abs(F.col("est") - F.col("exact_distinct_docs"))
            / F.col("exact_distinct_docs")
            <= F.lit(0.05)
        ).alias("est_within_eps"),
        "exact_distinct_docs",
    )
