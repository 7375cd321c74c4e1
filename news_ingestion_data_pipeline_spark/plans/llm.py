"""Training-data-pipeline operators: text analysis, dedup, similarity
search, multimodal plumbing — the 100 TB-scale surface beyond the
reference's own operators.

Oracle strategy: everything that is exactly SQL-expressible carries a
DuckDB oracle (including the LSH paths — the seeded hyperplanes are baked
into both the Spark plan and the generated SQL as literals). MinHash/SimHash
signatures use arithmetic both engines can replicate, but their SQL forms
are impractical, so those queries are registered without an oracle (driver
records the weaker rows-only check, per the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.functions import vectors as V
from news_ingestion_data_pipeline_spark.operators import dedup as DD
from news_ingestion_data_pipeline_spark.operators import similarity as SIM
from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM
from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_SQL_TOKENS = "list_filter(regexp_split_to_array(trim({col}), '\\s+'), _t -> _t <> '')"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       CAST(len({_SQL_TOKENS.format(col='text')}) AS BIGINT) AS n_tokens,
       length(text) AS n_chars_raw,
       length({SQL_NORM.format(col='text')}) AS n_chars_norm
FROM documents
""",
    description="Token counting (whitespace tokenizer) + raw/normalized "
    "char counts — pure project stage, no shuffle.",
    tags=("llm", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_raw"),
        F.length(TX.normalize_text(F.col("text"))).alias("n_chars_norm"),
    )


_SQL_STOPWORDS = "', '".join(TX.QUALITY_STOPWORDS)


@register(
    "text_quality_score",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, text,
         {_SQL_TOKENS.format(col='lower(text)')} AS tk,
         len({_SQL_TOKENS.format(col='text')}) AS n_tokens
  FROM documents
), feats AS (
  SELECT doc_id, n_tokens,
         round(len(list_filter(tk, x -> x IN ('{_SQL_STOPWORDS}'))) * 1.0
               / greatest(len(tk), 1), 6) AS stop_ratio,
         round(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
               / greatest(length(text), 1), 6) AS punct_ratio
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, stop_ratio, punct_ratio,
       round((least(n_tokens / 200.0, 1.0)
              + least(stop_ratio * 4, 1.0)
              + (1.0 - least(punct_ratio * 5, 1.0))) / 3, 6) AS quality
FROM feats
""",
    description="Document quality heuristic: length / stopword / punctuation "
    "features composed into a [0,1] score. All JVM expressions.",
    tags=("llm", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("n_tokens"),
        TX.stopword_ratio(F.col("text")).alias("stop_ratio"),
        TX.punct_ratio(F.col("text")).alias("punct_ratio"),
        TX.quality_score(F.col("text")).alias("quality"),
    )


def _lang_case_sql() -> str:
    """Replicate TX.lang_id's argmax-with-fixed-tie-order in SQL."""
    hits = {}
    for lang, sw in TX.LANG_STOPWORDS.items():
        quoted = "', '".join(sw)
        hits[lang] = f"len(list_filter(tk, x -> x IN ('{quoted}')))"
    # iterative 'later wins ties' over [de, es, fr, en], like the Spark side
    expr_lang, expr_score = "'und'", "0"
    for lang in ["de", "es", "fr", "en"]:
        h = hits[lang]
        expr_lang = (
            f"CASE WHEN {h} >= greatest({expr_score}, 1) THEN '{lang}' "
            f"ELSE {expr_lang} END"
        )
        expr_score = f"greatest({expr_score}, {h})"
    return expr_lang


@register(
    "text_lang_id",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang AS actual_lang,
         {_SQL_TOKENS.format(col=SQL_NORM.format(col='text'))} AS tk
  FROM documents
)
SELECT doc_id, actual_lang, {_lang_case_sql()} AS pred_lang
FROM toks
""",
    description="Heuristic stopword-vote language ID next to the labeled "
    "lang column (n-gram/stopword language detection).",
    tags=("llm", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        TX.lang_id(F.col("text")).alias("pred_lang"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5({SQL_NORM.format(col='text')}) AS fingerprint,
       substr(md5({SQL_NORM.format(col='text')}), 1, 8) AS fingerprint_short
FROM documents
""",
    description="Content fingerprinting: md5 over normalized text (+ 32-bit "
    "prefix bucket form).",
    tags=("llm", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    fp = TX.doc_fingerprint(F.col("text"))
    return d.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fingerprint_short"),
    )


# Polynomial rolling-hash fingerprinting (winnowing-style): base-257 hash
# of the whole normalized document, plus the minimum over all 8-char window
# hashes (the winnow fingerprint — stable under small edits away from the
# minimizing window). Integer mod arithmetic both engines replicate exactly.
_RH_B = 257
_RH_P = (1 << 31) - 1
_RH_K = 8
_RH_POW = [pow(_RH_B, m, _RH_P) for m in range(_RH_K)]

_SQL_RH_CODES = (
    "list_transform(range(1, length({s}) + 1),"
    " i -> CAST(ascii(substr({s}, CAST(i AS INT), 1)) AS BIGINT))"
)


def _sql_rh_window_terms() -> str:
    return " + ".join(
        f"codes[j + {m}] * {_RH_POW[_RH_K - 1 - m]}" for m in range(_RH_K)
    )


@register(
    "text_rolling_hash",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, {SQL_NORM.format(col='text')} AS s FROM documents
), coded AS (
  SELECT doc_id, s, {_SQL_RH_CODES.format(s='s')} AS codes FROM norm
)
SELECT doc_id,
       CASE WHEN length(s) = 0 THEN 0
            ELSE list_reduce(codes, (a, b) -> (a * {_RH_B} + b) % {_RH_P}) END
         AS full_hash,
       CASE WHEN length(s) < {_RH_K} THEN NULL
            ELSE list_min(list_transform(range(1, length(s) - {_RH_K - 2}),
                 j -> ({_sql_rh_window_terms()}) % {_RH_P})) END
         AS winnow_hash
FROM coded
""",
    description="Document fingerprinting via polynomial rolling hash: "
    "base-257 full-document hash + minimum 8-char window hash "
    "(winnowing-style near-dup fingerprint). Pure JVM integer arithmetic "
    "in the project stage — no shuffle, no UDF.",
    tags=("llm", "text", "dedup"),
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    d = spread(t(spark, sf_dir, "documents"))

    def codes_of(s):
        # split-to-chars, not substr-per-position: substr(s, i, 1) in a
        # lambda re-scans bytes to char offset i → O(len²)/doc; one split
        # + ascii per element is O(len).
        return F.when(
            F.length(s) == 0, F.array().cast("array<long>")
        ).otherwise(
            F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
        )

    # One bind for both outputs: normalize + code extraction run once per
    # document, not once per output column.
    def feats(s):
        def from_codes(cs):
            full = F.aggregate(
                cs, F.lit(0).cast("long"), lambda acc, c: (acc * _RH_B + c) % _RH_P
            )
            window_hashes = F.transform(
                F.sequence(F.lit(1), F.length(s) - F.lit(_RH_K - 1)),
                lambda j: sum(
                    F.element_at(cs, j + F.lit(m)) * F.lit(_RH_POW[_RH_K - 1 - m])
                    for m in range(_RH_K)
                )
                % _RH_P,
            )
            winnow = F.array_min(
                F.when(F.length(s) < _RH_K, F.array().cast("array<long>")).otherwise(
                    window_hashes
                )
            )
            return F.struct(full.alias("full_hash"), winnow.alias("winnow_hash"))

        return TX.bind_once(codes_of(s), from_codes)

    bound = TX.bind_once(TX.normalize_text(F.col("text")), feats)
    return d.select("doc_id", bound.alias("s")).select("doc_id", "s.*")


@register(
    "scalar_array_suite",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKENS.format(col=SQL_NORM.format(col='text'))} AS tk
  FROM documents
)
SELECT doc_id,
       len(list_distinct(tk)) AS n_distinct,
       array_to_string(list_sort(list_distinct(tk))[1:3], ',') AS first3,
       CAST(list_contains(tk, 'the') AS INT) AS has_the,
       len(list_filter(tk, x -> length(x) > 5)) AS n_long_tokens
FROM toks
""",
    description="Array-function suite over token arrays: distinct, sort, "
    "slice, join, contains, filter — all JVM higher-order builtins.",
    tags=("scalar", "llm", "text"),
)
def scalar_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")

    def feats(tk):
        return F.struct(
            F.size(F.array_distinct(tk)).alias("n_distinct"),
            F.array_join(
                F.slice(F.array_sort(F.array_distinct(tk)), 1, 3), ","
            ).alias("first3"),
            F.array_contains(tk, "the").cast("int").alias("has_the"),
            F.size(F.filter(tk, lambda x: F.length(x) > 5)).alias("n_long_tokens"),
        )

    bound = TX.bind_once(TX.tokens(TX.normalize_text(F.col("text"))), feats)
    return d.select("doc_id", bound.alias("s")).select("doc_id", "s.*")


@register(
    "text_edit_distance",
    oracle=f"""
WITH norm AS (
  SELECT doc_id, source,
         substr({SQL_NORM.format(col='text')}, 1, 40) AS head
  FROM documents
)
SELECT doc_id, source,
       levenshtein(head, lag(head) OVER (PARTITION BY source ORDER BY doc_id))
         AS edit_dist_prev
FROM norm
""",
    description="Levenshtein edit distance between each document's "
    "normalized 40-char head and its predecessor within the source "
    "(sequential near-dup screen; the built-in is JVM-side, exact integer "
    "output). First row per source is NULL.",
    tags=("llm", "text", "dedup", "window"),
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("source").orderBy("doc_id")
    head = F.substring(TX.normalize_text(F.col("text")), 1, 40)
    d = t(spark, sf_dir, "documents").select("doc_id", "source", head.alias("head"))
    return d.select(
        "doc_id",
        "source",
        F.levenshtein(F.col("head"), F.lag("head").over(w)).alias("edit_dist_prev"),
    )


@register(
    "text_simhash",
    oracle=OSQL.simhash_oracle(),
    description="64-bit SimHash fingerprints over word 3-grams — "
    "higher-order-function implementation (single aggregate pass, no UDF). "
    "Oracle: generated 64-column bit-vote SQL (plans/oracle_sqlgen.py) "
    "mirroring the md5-word arithmetic term for term.",
    tags=("llm", "text", "dedup"),
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_fingerprints(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Near-duplicate detection
# ---------------------------------------------------------------------------

# Shingles are hashed to 60-bit ints (15 hex chars of md5) with the SAME
# hash in both engines: per-pair intersection runs over primitive long
# arrays (no per-pair string hashing / allocation churn), and because both
# sides hash identically, even a collision yields identical results in
# Spark and DuckDB — parity is exact by construction.
_SQL_SHINGLES = (
    "list_distinct(list_transform("
    "list_transform(range(1, greatest(length({s}) - 3, 1)),"
    " i -> substr({s}, CAST(i AS INT), 5)),"
    " s2 -> CAST('0x' || substr(md5(s2), 1, 15) AS BIGINT)))"
)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
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
""",
    description="Exact character-5-gram Jaccard (over md5-hashed shingle "
    "sets) within (lang, length-bucket) blocks — blocking bounds the pair "
    "count (mandatory at scale; without it the shingle self-join is "
    "quadratic in boilerplate-heavy corpora).",
    tags=("llm", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    hashed = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    d = spread(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.round(F.col("n_chars"), -2).cast("bigint").alias("len_bucket"),
        hashed.alias("shingles"),
    ).withColumn("sz", F.size("shingles"))
    # Lineage break between the shingle projection and the self-join, for
    # two profiled reasons: (1) constraint inference substitutes the join's
    # isnotnull/size>0 predicates with the FULL shingle expression and
    # pushes them below the round-robin exchange — the whole md5-shingle
    # pipeline then ran inside the single-task scan stage the exchange
    # exists to escape (a 2.7s one-task stage ahead of the join);
    # (2) both self-join branches re-projected the shingle pipeline above
    # the shared exchange (2x the hashing). The checkpoint computes
    # shingles ONCE, in parallel, and the barrier keeps every inferred
    # filter above it. The pinned table is ids + hashed arrays — the same
    # artifact a production dedup DAG materializes between its shingle and
    # pair stages. Measured 6.6 -> 5.0s (A/B, same session).
    d = d.localCheckpoint()
    # Inverted-index formulation: explode the (distinct, hashed) shingle
    # sets to rows and equi-join on (shingle, lang, len_bucket); the count
    # of joined rows per (id_a, id_b) IS |A∩B|. This replaces a per-pair
    # array_intersect — O(Σ block_size² × |shingles|) element operations —
    # with one shuffle of O(Σ per-shingle k²) tiny rows, all
    # whole-stage-codegen hash-join/hash-agg (measured 6× faster at sf0.1:
    # 1.3M candidate pairs × ~1k-element intersects vs 42M joined rows).
    # Blocking on (lang, len_bucket) inside the join key both bounds the
    # pair count and spreads the shuffle across ~54k distinct keys — no
    # block-count parallelism cap, no broadcast memory floor; AQE splits
    # any residual hot shingle key. At 100 TB, boilerplate shingles are the
    # skew risk — the MinHash-LSH path (or a max-df shingle cap, see
    # operators/dedup.ngram_jaccard_pairs) is the unbounded-corpus escape.
    sh = d.select(
        "doc_id", "lang", "len_bucket", "sz", F.explode("shingles").alias("h")
    )
    a, b = sh.alias("a"), sh.alias("b")
    # Residual conjuncts run per joined row BEFORE the pair-count shuffle:
    # id_a < id_b halves the rows; the size-ratio bound (J >= 1/2 forces
    # max(sz) <= 2*min(sz), since |A∩B| <= min and 3|A∩B| >= sa+sb) prunes
    # pairs that can never qualify without touching anything but two ints.
    pair_rows = a.join(
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
    inter = (
        pair_rows.groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sz").alias("sa"),
            F.col("b.sz").alias("sb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        # J >= 1/2 as exact integer arithmetic: i/(sa+sb-i) >= 1/2 <=> 3i >= sa+sb
        .filter(F.lit(3) * F.col("inter") >= F.col("sa") + F.col("sb"))
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("inter") * F.lit(1.0)
            / (F.col("sa") + F.col("sb") - F.col("inter")),
            6,
        ).alias("jaccard"),
    )


#: (applicationId, sf_dir) -> localCheckpointed pair table
_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def ngram_jaccard_pairs_cached(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup_ngram_jaccard pair table, localCheckpointed once per
    (SparkContext, sf_dir). Composition queries (soft-dedup weights,
    the decision table, provenance matrices) each consume the SAME
    threshold-filtered pair set — rebuilding the shingle inverted-index
    join per composition was ~14 s of the 219 s bench. At 100 TB this
    is "materialize the pair table once, join it thrice": the exact
    artifact-reuse a production curation DAG gets by persisting the
    pair table between stages. Keyed by applicationId so a restarted
    SparkContext recomputes instead of dereferencing dead RDDs; the
    pair table is tiny (already threshold-filtered), so the pinned
    blocks are a rounding error against executor storage memory."""
    from news_ingestion_data_pipeline_spark.plans import artifact_cache

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _PAIR_CACHE.get(key)
    artifact_cache.record("ngram_jaccard_pairs", df is not None)
    if df is None:
        df = dedup_ngram_jaccard(spark, sf_dir).localCheckpoint()
        _PAIR_CACHE[key] = df
    return df


@register(
    "dedup_minhash_candidates",
    oracle=OSQL.minhash_candidates_oracle(),
    description="MinHash-LSH near-duplicate candidate pairs: 32 seeded "
    "permutations, 8 bands × 4 rows; candidates agree on a full band. "
    "Shuffle O(docs×bands); per-band hash equi-join. Oracle: generated "
    "32-permutation SQL with the same frozen LCG constants "
    "(plans/oracle_sqlgen.py).",
    tags=("llm", "dedup"),
)
def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), num_hashes=32, bands=8
    )


@register(
    "dedup_exact_rows",
    oracle=f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY md5({SQL_NORM.format(col='text')})
                            ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
""",
    description="The deduplicated table itself (min-id winner per "
    "normalized-content group).",
    tags=("llm", "dedup"),
)
def dedup_exact_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.exact_dedup_rows(t(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "source"
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_SQL_COS = (
    "round(list_dot_product(a.v, q.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(q.v, q.v))), 6)"
)


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         {_SQL_COS} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SQL_COS} DESC, a.vec_id) AS rank
  FROM c a CROSS JOIN q
  WHERE a.vec_id != q.vec_id
) WHERE rank <= 5
""",
    description="Brute-force cosine top-5 neighbors for 10 query vectors — "
    "broadcast-nested-loop over the corpus, per-partition top-K. The exact "
    "baseline the LSH path is measured against.",
    tags=("llm", "similarity"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def _hyperplane_sql_bits(planes: list[list[float]]) -> str:
    parts = []
    for hp in planes:
        arr = "[" + ", ".join(repr(x) for x in hp) + "]"
        parts.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], {arr}) >= 0 "
            "THEN '1' ELSE '0' END"
        )
    return " || ".join(parts)


_PLANES = SIM.make_hyperplanes(dim=64, n_planes=8, seed=42)


@register(
    "sim_lsh_buckets",
    oracle=f"""
SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
FROM (SELECT vec_id, {_hyperplane_sql_bits(_PLANES)} AS bucket FROM embeddings)
GROUP BY bucket
""",
    description="Random-hyperplane LSH bucketing (8 seeded planes baked into "
    "both plans as literals): the partition key for approximate NN search — "
    "equi-join on bucket replaces the cross join at scale.",
    tags=("llm", "similarity"),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            V.hyperplane_signature("embedding", _PLANES).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


@register(
    "sim_lsh_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  {" UNION ALL ".join(
      f"SELECT vec_id, embedding::DOUBLE[] AS v, {ti} AS tbl, "
      f"{_hyperplane_sql_bits(SIM.make_hyperplanes(64, 4, 42 + ti))} AS bucket "
      "FROM embeddings"
      for ti in range(4)
  )}
), qsig AS (SELECT * FROM sig WHERE vec_id < 10),
probes AS (
  SELECT vec_id, tbl, bucket FROM qsig
  {"".join(
      "UNION ALL SELECT vec_id, tbl, "
      f"substr(bucket, 1, {i}) || "
      f"(CASE WHEN substr(bucket, {i + 1}, 1) = '1' THEN '0' ELSE '1' END) || "
      f"substr(bucket, {i + 2}) AS bucket FROM qsig "
      for i in range(4)
  )}
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, a.vec_id AS neighbor_id
  FROM sig a JOIN probes q ON a.tbl = q.tbl AND a.bucket = q.bucket
  WHERE a.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT c.query_id, c.neighbor_id, {_SQL_COS} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY c.query_id
                            ORDER BY {_SQL_COS} DESC, a.vec_id) AS rank
  FROM cand c
  JOIN e a ON a.vec_id = c.neighbor_id
  JOIN e q ON q.vec_id = c.query_id
) WHERE rank <= 5
""",
    description="LSH approximate top-5 via the AND-OR construction: 4 "
    "independent 4-bit hyperplane tables (candidate = full-signature match "
    "in ANY table) + hamming-1 multi-probe per table, exact cosine re-rank "
    "over deduped candidates. One 8-bit table had recall@5 0.02; this "
    "composition measures 0.94 at sf0.01 with the candidate generation "
    "still a linear equi-join on (table, bucket) — the 100 TB path; the "
    "probes multiply only the query side, the corpus index is rows × "
    "n_tables.",
    tags=("llm", "similarity"),
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.lsh_bucketed_topk(
        emb, queries, k=5, n_planes=4, n_tables=4, dim=64, seed=42, multi_probe=True
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


@register(
    "sim_pairs_above_threshold",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, q.vec_id AS id_b, {_SQL_COS} AS cos_sim
FROM e a JOIN e q ON a.vec_id < q.vec_id
WHERE {_SQL_COS} >= 0.45
""",
    description="All embedding pairs with cosine ≥ 0.45 (near-dup sweep) "
    "via block-partitioned GEMM tiles — the exact full-sweep at its scale "
    "shape: B·(B+1)/2 tile tasks, O(n·B) shuffle, no corpus broadcast.",
    tags=("llm", "similarity", "dedup"),
)
def sim_pairs_above_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    emb = spread(t(spark, sf_dir, "embeddings"))
    pairs = SIM.gemm_cos_pairs(emb, min_cos=0.45, n_blocks=8)
    return (
        pairs.select(
            "id_a", "id_b", F.round(F.col("cos"), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= 0.45)
    )


#: Master plane set for the occupancy-constant near-dup sweep. The seeded
#: Gaussian stream is sequential, so ``_PLANES12[:k]`` is a stable prefix
#: for any k — the effective depth is derived from the corpus count at
#: plan-build time (occupancy_plane_depth) and the oracle replays the same
#: ``ceil(log2(count/16.0))`` clamp over a substr of the full signature.
_PLANES12 = SIM.make_hyperplanes(dim=64, n_planes=12, seed=42)


@register(
    "dedup_embedding_neardup",
    oracle=f"""
WITH depth AS (
  SELECT GREATEST(4, LEAST(12,
           CAST(ceil(log2(GREATEST(count(*), 1) / 16.0)) AS INT))) AS k
  FROM embeddings
),
sig AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         substr({_hyperplane_sql_bits(_PLANES12)}, 1, (SELECT k FROM depth))
           AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, q.vec_id AS id_b, {_SQL_COS} AS cos_sim
FROM sig a JOIN sig q ON a.bucket = q.bucket AND a.vec_id < q.vec_id
WHERE {_SQL_COS} >= 0.35
""",
    description="Embedding-cosine near-duplicate pairs through LSH buckets "
    "with OCCUPANCY-CONSTANT depth: the signature uses the first "
    "k = clamp(ceil(log2(n/16)), 4, 12) planes of a seeded 12-plane master "
    "set, so expected bucket occupancy (and per-bucket pair work) stays "
    "~16 as the corpus grows — candidates scale linearly in n, not "
    "quadratically in occupancy. Exact cosine >= 0.35 verifies. The 100 TB "
    "embedding-dedup path — contrast with sim_pairs_above_threshold's full "
    "O(n^2) baseline; the banded variant (dedup_embedding_neardup_banded) "
    "is the recall-tuned sibling.",
    tags=("llm", "dedup", "similarity"),
)
def dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.embedding_neardup_pairs(
        t(spark, sf_dir, "embeddings"),
        threshold=0.35,
        bucket_hyperplanes=_PLANES12,
        target_occupancy=16,
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payloads + typed metadata)
# ---------------------------------------------------------------------------

@register(
    "multimodal_binary_stats",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS payload_bytes,
       substr(hex(encode(substr(text, 1, 16))), 1, 32) AS payload_head_hex,
       CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END
         AS size_class
FROM documents
""",
    description="Opaque-binary column handling: utf-8 payload bytes + hex "
    "head + size class. The schema/partitioning pattern for image/audio "
    "columns (decode itself is a gated Pandas-UDF stub — see "
    "operators/multimodal.py).",
    tags=("llm", "multimodal"),
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.substring(F.hex(F.encode(F.substring(F.col("text"), 1, 16), "utf-8")), 1, 32).alias(
            "payload_head_hex"
        ),
        F.when(F.octet_length(payload) > 300, "large").otherwise("small").alias("size_class"),
    )


@register(
    "multimodal_image_features",
    oracle=OSQL.multimodal_image_features_oracle(),
    description="REAL-codec image pipeline: synthesize deterministic BMP "
    "payloads (closed-form pixel formula), decode them through the "
    "pure-numpy BMP parser (operators/codecs.py), and emit integer-exact "
    "per-image stats + 64-bit phash via Arrow-batched mapInPandas. Payloads "
    "repartitioned by media_id before the decode stage — media sizes skew "
    "and AQE can't split one input row. Oracle regenerates the decoded "
    "pixels from the formula and recomputes every feature bit-identically.",
    tags=("llm", "multimodal"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents")
    media = mm.synthesize_media_real(docs).repartition(
        spark.sparkContext.defaultParallelism, "media_id"
    )
    return mm.extract_image_features(media, decoder="real")


@register(
    "multimodal_frame_sample",
    oracle=OSQL.multimodal_frame_sample_oracle(),
    description="REAL-codec video frame sampling: framepack container "
    "(length-prefixed BMP stills at 500 ms intervals) → header parse → "
    "decode the sampled frame → emit its 8×8 crop, one row per 500 ms "
    "(bounded to 200 media rows). Output carries md5(lower-hex(payload)) "
    "so the binary frame bytes themselves are oracle-verified.",
    tags=("llm", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = mm.synthesize_media_real(docs, kind="video").repartition(8, "media_id")
    frames = mm.sample_frames(media, every_ms=500, decoder="real")
    return frames.select(
        "media_id",
        "frame_no",
        "frame_ms",
        F.md5(F.lower(F.hex("frame_payload"))).alias("frame_md5"),
    )


_SQL_CELL_SIM = (
    "round(list_dot_product(e.v, cent.cv) / "
    "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv))), 6)"
)


@register(
    "sim_ivf_topk",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16),
ranked AS (
  SELECT vec_id, v, cent_id, cell_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cell_sim DESC, cent_id) AS rn
  FROM (SELECT e.vec_id, e.v, cent.cent_id, {_SQL_CELL_SIM} AS cell_sim
        FROM e CROSS JOIN cent)
),
a AS (SELECT vec_id, v, cent_id AS cell FROM ranked WHERE rn = 1),
q AS (SELECT vec_id, v, cent_id AS cell FROM ranked
      WHERE vec_id < 10 AND rn <= 4)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         {_SQL_COS} AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SQL_COS} DESC, a.vec_id) AS rank
  FROM a JOIN q ON a.cell = q.cell
  WHERE a.vec_id != q.vec_id
) WHERE rank <= 5
""",
    description="IVF approximate NN: 16 deterministic seed centroids "
    "(vec_id<16, zero k-means iterations) partition the corpus into cells; "
    "each query probes its 4 nearest cells and re-ranks exactly inside them. "
    "At scale the cell id becomes a partition column → partition pruning "
    "reads n_probe/n_cells of the data (see operators/similarity.py).",
    tags=("llm", "similarity"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return SIM.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


@register(
    "text_tfidf_top_terms",
    oracle=f"""
WITH norm AS (SELECT doc_id, {SQL_NORM.format(col='text')} AS ntext FROM documents),
toks AS (SELECT doc_id, unnest(string_split_regex(ntext, '\\s+')) AS term
         FROM norm WHERE ntext <> ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df, score, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE)
           * (CAST((SELECT n_docs FROM nd) AS DOUBLE) / CAST(df.df AS DOUBLE))
           AS score,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE)
                    * (CAST((SELECT n_docs FROM nd) AS DOUBLE)
                       / CAST(df.df AS DOUBLE)) DESC, tf.term) AS rank
  FROM tf JOIN df ON tf.term = df.term
) WHERE rank <= 3
""",
    description="TF-IDF-style top-3 terms per document: tokenize → per-doc "
    "term frequencies → corpus document frequencies → weight → per-doc "
    "top-K. idf is the rational n_docs/df rather than its log: libm log() "
    "is not correctly-rounded and drifts between JVM and C across engines, "
    "while int-ratio ops are exact IEEE — same ranking monotonicity. Two "
    "shuffles (doc_id+term, then term) + a broadcast scalar; the window "
    "top-K shares the doc_id partitioning at scale.",
    tags=("llm", "text", "window"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(TX.normalize_text(F.col("text")))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df, "term")
        .crossJoin(n_docs)
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


@register(
    "multimodal_audio_windows",
    oracle=OSQL.multimodal_audio_windows_oracle(),
    description="REAL-codec audio feature windows: deterministic PCM "
    "waveforms encoded as actual WAV bytes, decoded back through the RIFF "
    "chunk walker (operators/codecs.py), then 250 ms RMS/zero-crossing/peak "
    "rows via Arrow-batched mapInPandas (1:N explode; bounded to 200 media "
    "rows). RMS is an integer sum-of-squares + one division + sqrt — "
    "bit-identical to the oracle's regeneration of the same samples.",
    tags=("llm", "multimodal"),
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents").orderBy("doc_id").limit(200)
    media = mm.synthesize_media_real(docs, kind="audio").repartition(8, "media_id")
    return mm.extract_audio_features(media, window_ms=250, decoder="real").select(
        "media_id", "win_no", "win_start_ms", "rms", "zero_crossings", "peak"
    )


@register(
    "text_zscore_by_lang",
    oracle="""
WITH g AS (
  SELECT lang, COUNT(*) AS n, SUM(n_chars) AS s,
         SUM(n_chars * n_chars) AS ss
  FROM documents GROUP BY lang
)
SELECT doc_id, lang,
       CAST((n_chars - CAST(s AS DOUBLE) / n)
            / sqrt((ss - CAST(s * s AS DOUBLE) / n) / (n - 1)) AS DOUBLE) AS z
FROM documents JOIN g USING (lang)
""",
    description="Per-language z-score of document length via grouped-map "
    "applyInPandas — the one Arrow grouped-map API not otherwise exercised. "
    "Cross-engine bit-parity is engineered: group sums s=Σx and ss=Σx² are "
    "exact int64 (lengths are ints), and both engines then apply the "
    "identical IEEE op sequence (x − s/n) / sqrt((ss − s²/n)/(n−1)) — no "
    "Welford/pairwise variance, which would drift. At scale this is one "
    "shuffle on the group key with Arrow batches per group.",
    tags=("llm", "text", "pandas"),
)
def text_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pandas as pd

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"]
        n = len(pdf)
        s = int(x.sum())
        ss = int((x.astype("int64") * x.astype("int64")).sum())
        mean = s / n
        std = math.sqrt((ss - (s * s) / n) / (n - 1)) if n > 1 else float("nan")
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "z": (x - mean) / std,
            }
        )

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return docs.groupBy("lang").applyInPandas(
        zscore, schema="doc_id bigint, lang string, z double"
    )


@register(
    "dedup_minhash_verified",
    oracle=OSQL.minhash_verified_oracle(),
    description="NOTE: signatures here are built from the shared 60-bit "
    "(15-hex md5) shingle-hash pass — intentionally a different hash width "
    "than dedup_minhash_candidates' 32-bit path, so the two queries' "
    "candidate sets differ by design; the oracle mirrors the 60-bit math. "
    "The complete scalable near-dup pipeline composed end to "
    "end: MinHash-LSH banding proposes candidate pairs (O(docs×bands) "
    "shuffle), then exact character-5-gram Jaccard verifies ONLY those "
    "candidates and keeps pairs ≥ 0.4. Per-pair array_intersect is the "
    "right tool at this stage — candidates are few — whereas "
    "dedup_ngram_jaccard's inverted index is the right tool for exhaustive "
    "in-block search; together they bracket the design space. At 100 TB "
    "this composition (cheap recall stage → exact precision stage over "
    "candidates) is the only shape that works.",
    tags=("llm", "dedup"),
)
def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    docs = t(spark, sf_dir, "documents")
    hashed = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    # spread + persist: shingling is the heavy map compute (16s single-
    # partition at sf0.1), and THREE consumers read it — the MinHash
    # signature aggregate and both verify-join sides. One shingle pass,
    # persisted, feeds all of them (previously two independent passes with
    # different hash widths: one inside minhash_lsh_pairs, one here).
    # Cold wall-time at sf0.1 is dominated not by shingling (~3s) but by
    # the candidate set itself: this corpus draws from a ~30-word
    # vocabulary, so true inter-doc Jaccard is high and banding correctly
    # emits ~150k candidates for 256 survivors — a corpus property, not a
    # plan defect.
    # localCheckpoint (eager) instead of lazy persist: the three consumer
    # stages are submitted CONCURRENTLY inside one job, and a lazy cache
    # is populated only by whichever stage computes first — the others
    # race past the empty cache and recompute the shingling in parallel
    # (measured 47s -> 12s on the jaccard-prefix twin when materialized
    # eagerly). Eager checkpoint pays the pass exactly once, up front.
    sh = spread(docs).select(
        F.col("doc_id"), hashed.alias("shingles"), F.size(hashed).alias("sz")
    ).localCheckpoint()
    exploded = sh.select(
        F.col("doc_id").alias("id"), F.explode("shingles").alias("shingle_hash")
    )
    sigs = DD.minhash_signatures_from_hashes(exploded, num_hashes=32)
    cands = DD.lsh_band_pairs(sigs, num_hashes=32, bands=8)
    sa = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.col("sz").alias("sz_a"),
    )
    sb = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    # J >= 0.4 = 2/5 forces 2*max(sz) <= 5*min(sz) (since |A∩B| <= min and
    # 7|A∩B| >= 2(sa+sb)) — prune candidate pairs on two ints before the
    # array intersect touches the shingle arrays.
    size_ok = (
        F.lit(2) * F.greatest(F.col("sz_a"), F.col("sz_b"))
        <= F.lit(5) * F.least(F.col("sz_a"), F.col("sz_b"))
    )
    # size prune BEFORE the arrays attach: the 2·max <= 5·min guard needs
    # only the two int sizes, and every pair it kills would otherwise
    # carry a full shingle array through both verify joins (r11 profile:
    # the pair×array intermediate is the query's largest shuffle, 88 MB
    # at sf0.1; the guard drops ~20% of candidate pairs on this corpus).
    # Same rows by construction — the filter commutes with the inner
    # joins because it references only id-keyed size columns.
    za = sh.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sh.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    cands = (
        cands.join(za, "id_a").join(zb, "id_b").filter(size_ok)
        .select("id_a", "id_b", "n_bands_matched", "sz_a", "sz_b")
    )
    sa = sa.drop("sz_a")
    sb = sb.drop("sz_b")
    return (
        # merge (SMJ): sa/sb are checkpointed corpus-scale shingle
        # tables with no stats — unhinted the planner broadcasts them;
        # shuffle_hash would build an unspillable hash relation over the
        # wide arrays (measured OOM on the prefix twin at 16k docs).
        cands.hint("merge")
        .join(sa, "id_a")
        .hint("merge")
        .join(sb, "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") * F.lit(1.0)
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.4)
        .select("id_a", "id_b", "n_bands_matched", "jaccard")
        
    )


@register(
    "dedup_connected_clusters",
    oracle=f"""
WITH RECURSIVE norm AS (
  SELECT doc_id, lang, CAST(round(n_chars, -2) AS BIGINT) AS len_bucket,
         {SQL_NORM.format(col='text')} AS s
  FROM documents
), sh AS (
  SELECT doc_id, lang, len_bucket, {_SQL_SHINGLES.format(s='s')} AS shingles
  FROM norm
), edges AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib
  FROM sh a JOIN sh b
    ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
  WHERE 4 * len(list_intersect(a.shingles, b.shingles))
        >= len(a.shingles) + len(b.shingles)
), sym AS (
  SELECT ia AS a, ib AS b FROM edges UNION SELECT ib, ia FROM edges
), reach(v, w) AS (
  SELECT a, a FROM sym
  UNION
  SELECT r.v, s.b FROM reach r JOIN sym s ON s.a = r.w
)
SELECT v AS doc_id, MIN(w) AS cluster_id FROM reach GROUP BY v
""",
    description="Duplicate CLUSTERS, not just pairs: near-dup edges "
    "(blocked char-5-gram Jaccard ≥ 1/3, exact integer form 4·|A∩B| ≥ "
    "|A|+|B|) → connected components via iterative min-label propagation "
    "(operators/dedup.connected_components — driver controls iteration, "
    "data never leaves executors; rounds = cluster diameter). The "
    "transitive-closure step every keep-one dedup policy needs (A≈B, B≈C "
    "⇒ one group). Oracle: recursive-CTE reachability + MIN.",
    tags=("llm", "dedup", "iterative"),
)
def dedup_connected_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    hashed = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    d = spread(t(spark, sf_dir, "documents")).select(
        "doc_id",
        "lang",
        F.round(F.col("n_chars"), -2).cast("bigint").alias("len_bucket"),
        hashed.alias("shingles"),
    ).withColumn("sz", F.size("shingles"))
    # same lineage break as dedup_ngram_jaccard: keep inferred filters on
    # the derived shingle column from being pushed below the round-robin
    # exchange (serial one-task re-evaluation), and share one shingle
    # computation across the self-join branches
    d = d.localCheckpoint()
    sh = d.select(
        "doc_id", "lang", "len_bucket", "sz", F.explode("shingles").alias("h")
    )
    a, b = sh.alias("a"), sh.alias("b")
    pair_rows = a.join(
        b,
        (F.col("a.h") == F.col("b.h"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (
            F.greatest(F.col("a.sz"), F.col("b.sz"))
            <= F.lit(3) * F.least(F.col("a.sz"), F.col("b.sz"))
        ),
    )
    edges = (
        pair_rows.groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sz").alias("sa"),
            F.col("b.sz").alias("sb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.lit(4) * F.col("inter") >= F.col("sa") + F.col("sb"))
        .select("id_a", "id_b")
    )
    return DD.connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("cluster_id")
    )


#: (applicationId, sf_dir) -> localCheckpointed cluster assignment
_CLUSTER_CACHE: dict[tuple[str, str], DataFrame] = {}


def connected_clusters_cached(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_connected_clusters' output, localCheckpointed once per
    (SparkContext, sf_dir): the keeper-selection and corpus-cleaning
    compositions consume the SAME cluster assignment — recomputing the
    shingle join + pointer-jumping iterations per composition is the
    expensive path; the assignment itself is tiny (only docs in the
    pair graph)."""
    from news_ingestion_data_pipeline_spark.plans import artifact_cache

    key = (spark.sparkContext.applicationId, sf_dir)
    df = _CLUSTER_CACHE.get(key)
    artifact_cache.record("connected_clusters", df is not None)
    if df is None:
        df = dedup_connected_clusters(spark, sf_dir).localCheckpoint()
        _CLUSTER_CACHE[key] = df
    return df


_PROFILE_SPECS = [
    ("l_orderkey", "int"),
    ("l_suppkey", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


@register(
    "profile_lineitem",
    oracle=__import__(
        "news_ingestion_data_pipeline_spark.operators.profile", fromlist=["x"]
    ).profile_oracle_sql("lineitem", _PROFILE_SPECS),
    description="Data-quality profile of lineitem: per-column row/null/"
    "exact-distinct counts and typed-formatted min/max for 7 columns, "
    "computed in ONE wide aggregate pass (partial map-side) then unpivoted "
    "— the pre-training table audit. The oracle unions per-column SELECTs; "
    "only the Spark side is required to be single-scan.",
    tags=("llm", "profile", "agg"),
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators.profile import profile_columns

    return profile_columns(t(spark, sf_dir, "lineitem"), _PROFILE_SPECS)


@register(
    "dedup_simhash_hamming",
    oracle=OSQL.simhash_hamming_oracle(),
    description="SimHash near-duplicate pairs: banded 64-bit fingerprints "
    "(4 × 16-bit chunks, pigeonhole candidate generation — the same "
    "O(docs×bands) shuffle shape as MinHash banding) verified by exact "
    "hamming distance ≤ 6 via XOR + bit_count on two 32-bit halves. "
    "Completes the simhash path: fingerprints (text_simhash) → pairs. "
    "Oracle: generated fingerprint SQL + chunk-OR candidate join "
    "(plans/oracle_sqlgen.py) — mirrors the banding recall bound exactly.",
    tags=("llm", "dedup"),
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_hamming_pairs(
        t(spark, sf_dir, "documents"), max_hamming=6, bands=4
    )
