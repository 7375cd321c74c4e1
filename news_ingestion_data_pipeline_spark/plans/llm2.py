"""Second LLM-pipeline wave: BPE-ish tokenization, k-means assignment
(the IVF training primitive), session path mining, the composed
multimodal resize pipeline, CEP-style sequence pattern matching,
rare-anchor containment dedup, and approx_top_k heavy hitters — each
with a bit-exact DuckDB oracle.

Reference parity note: the reference (a 645-LoC scraper) has none of
these; they extend the engine along the training-data-pipeline axis the
north star requires (tokenizer-aware counting, ANN index training,
behavioral paths, image preprocessing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t

# GPT-2-style pretokenizer, simplified to the subset whose semantics are
# identical in Java regex (Spark) and RE2 (DuckDB): contraction suffixes,
# space-prefixed letter runs, space-prefixed digit runs, space-prefixed
# punctuation runs, whitespace runs. No lookarounds (RE2 has none).
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"
_BPE_RE_SQL = _BPE_RE.replace("'", "''")


@register(
    "text_bpe_token_count",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(
         lower(text) || ' #' || CAST(doc_id AS VARCHAR) || '''s done.',
         '{_BPE_RE_SQL}')) AS n_bpe,
       len(regexp_extract_all(
         lower(text) || ' #' || CAST(doc_id AS VARCHAR) || '''s done.',
         '[^\\s]+')) AS n_ws,
       CAST(n_chars AS DOUBLE)
         / len(regexp_extract_all(
             lower(text) || ' #' || CAST(doc_id AS VARCHAR) || '''s done.',
             '{_BPE_RE_SQL}')) AS chars_per_bpe
FROM documents
""",
    description="BPE-ish token counting: a GPT-2-style pretokenizer regex "
    "(contraction suffixes, space-prefixed letter/digit/punctuation runs) "
    "next to whitespace tokenization — the budget-estimation pass every "
    "training-data pipeline runs before the real tokenizer. The text is "
    "suffixed with a doc_id marker + contraction so the digit/punct/"
    "contraction branches all fire on the plain-word fixture corpus. Pure "
    "JVM regexp_extract_all — one codegen'd map stage, no shuffle, no "
    "Python; the regex subset is chosen to mean the same thing in Java "
    "regex and RE2 (no lookarounds).",
    tags=("llm", "text"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = F.concat(
        F.lower(F.col("text")),
        F.lit(" #"),
        F.col("doc_id").cast("string"),
        F.lit("'s done."),
    )
    n_bpe = F.size(F.regexp_extract_all(s, F.lit(_BPE_RE), F.lit(0)))
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        n_bpe.alias("n_bpe"),
        F.size(F.regexp_extract_all(s, F.lit(r"[^\s]+"), F.lit(0))).alias("n_ws"),
        (F.col("n_chars").cast("double") / n_bpe).alias("chars_per_bpe"),
    )


def _sqdist_sql(a: str, b: str, dim: int) -> str:
    # left-associative sum, same evaluation order as Spark's aggregate fold
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, dim + 1)
    )


@register(
    "sim_kmeans_assign",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
dists AS (
  SELECT e.vec_id, cent.cent_id,
         {_sqdist_sql('e.v', 'cent.cv', 64)} AS d
  FROM e CROSS JOIN cent
), assigned AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cent_id) AS rn
  FROM dists
)
SELECT cent_id, COUNT(*) AS n_assigned,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM assigned WHERE rn = 1
GROUP BY cent_id ORDER BY cent_id
""",
    description="One Lloyd assignment step of k-means — the training "
    "primitive behind the IVF index (sim_ivf_topk's cells): 8 seeded "
    "centroids (vec_id < 8, deterministic — RNG-free like every sampling "
    "op here) broadcast against all vectors, squared-L2 via a sequential "
    "fold with engine-identical IEEE evaluation order, nearest centroid "
    "by total (distance, id) order so ties are deterministic. Output is "
    "the exact partition of the vector set (count + id-sum per cell) — "
    "integer-exact, so the oracle certifies every single assignment. At "
    "scale this is the per-iteration shape: broadcast k centroids, one "
    "map-side argmin pass, one k-row aggregate; no shuffle of vectors.",
    tags=("llm", "similarity", "iterative"),
)
def sim_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    d = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dists = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cent_id", d.alias("d")
    )
    best = dists.groupBy("vec_id").agg(
        F.min(F.struct("d", "cent_id")).alias("m")
    )
    return (
        best.select("vec_id", F.col("m.cent_id").alias("cent_id"))
        .groupBy("cent_id")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        
    )


@register(
    "events_path_trigrams",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 600000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM flagged
), paths AS (
  SELECT event_type || ' > ' || LEAD(event_type, 1) OVER s
           || ' > ' || LEAD(event_type, 2) OVER s AS path,
         LEAD(event_type, 2) OVER s AS e3
  FROM numbered
  WINDOW s AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
)
SELECT path, COUNT(*) AS n_paths
FROM paths WHERE e3 IS NOT NULL
GROUP BY path
ORDER BY n_paths DESC, path
LIMIT 20
""",
    description="Behavioral path mining: sessionize (10-minute gap rule, "
    "the shared construction), then count event-type TRIGRAMS within each "
    "session via two leads over the (ts, event_id)-totally-ordered session "
    "window, top-20 with full tiebreak. The windows and the final count "
    "share one (user) shuffle; the trigram space is tiny so the count "
    "aggregate is map-side-partial dominated. The funnel/transition "
    "sibling queries look at single steps; this is the n-gram "
    "generalization marketing/product analytics actually asks for.",
    tags=("events", "window", "paths"),
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_user = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag(F.col("ts")).over(per_user).cast("timestamp"))
    numbered = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.when(prev_us.isNull() | (ts_us - prev_us > 600_000_000), 1)
            .otherwise(0)
            .alias("is_new"),
        )
        .withColumn("sess", F.sum("is_new").over(run_user))
    )
    sess_w = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    e2 = F.lead("event_type", 1).over(sess_w)
    e3 = F.lead("event_type", 2).over(sess_w)
    return (
        numbered.select(
            F.concat_ws(" > ", F.col("event_type"), e2, e3).alias("path"),
            e3.alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(20)
    )


@register(
    "multimodal_image_resize",
    oracle=OSQL.multimodal_image_resize_oracle(32),
    description="Composed REAL-codec preprocessing pipeline: synthesize "
    "BMP payloads -> pure-numpy BMP decode -> nearest-neighbor resize to "
    "32x32 -> BMP re-encode -> SECOND real decode -> feature extraction. "
    "Exercises that resize_images' output schema equals its input schema "
    "(stages compose arbitrarily, the property a preprocessing DAG "
    "needs). All three mapInPandas stages are Arrow-batched and "
    "partition-parallel; the oracle regenerates the resized pixels from "
    "the closed-form source formula (resized(y,x,c) = src(y*h//32, "
    "x*w//32, c)) and recomputes every stat and the phash bit-exactly.",
    tags=("llm", "multimodal"),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents")
    media = mm.synthesize_media_real(docs).repartition(
        spark.sparkContext.defaultParallelism, "media_id"
    )
    resized = mm.resize_images(media, 32, 32, decoder="real")
    return mm.extract_image_features(resized, decoder="real")


@register(
    "events_sequence_patterns",
    oracle="""
WITH seq AS (
  SELECT user_id,
         string_agg(CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                    ELSE 'e' END, '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       length(s) AS seq_len,
       CAST(len(regexp_extract_all(s, 'v[cse]*p')) AS INT) AS n_view_to_purchase,
       CAST(len(regexp_extract_all(s, 'ee+')) AS INT) AS n_error_runs,
       CAST(len(regexp_extract_all(s, 'sv')) AS INT) AS n_signup_then_view
FROM seq
""",
    description="Complex-event pattern matching (MATCH_RECOGNIZE-style) "
    "via symbolization: each user's event history becomes a one-char-per-"
    "event string in total (ts, event_id) order, and sequence patterns — "
    "view-to-purchase conversions with intervening activity, error "
    "bursts, signup-then-view — are counted with ordinary regexes "
    "(restricted to the dialect subset Java regex and RE2 scan "
    "identically: no lookarounds, no laziness). Per-user state is one "
    "bounded string; the groupBy is one shuffle; the regex scan is "
    "codegen'd. This is the batch shape of CEP that engines ship "
    "MATCH_RECOGNIZE for — symbolization covers the overwhelmingly "
    "common fixed-pattern cases with zero new machinery.",
    tags=("events", "paths", "regex"),
)
def events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    # collect_list is partition-order-dependent; sorting structs of
    # (ts, event_id, sym) restores the total order without a window
    seq = (
        t(spark, sf_dir, "events")
        .select("user_id", F.struct("ts", "event_id", sym.alias("sym")).alias("x"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("x")), lambda x: x["sym"]
                ),
                "",
            ).alias("s")
        )
    )

    def n(pat: str):
        return F.size(F.regexp_extract_all(F.col("s"), F.lit(pat), F.lit(0))).cast(
            "int"
        )

    return seq.select(
        "user_id",
        F.length("s").alias("seq_len"),
        n("v[cse]*p").alias("n_view_to_purchase"),
        n("ee+").alias("n_error_runs"),
        n("sv").alias("n_signup_then_view"),
    )


@register(
    "dedup_containment_anchored",
    oracle="""
WITH norm AS (
  SELECT doc_id, lang, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
  FROM documents
), sh AS (
  SELECT doc_id, lang,
         list_distinct(list_transform(
           list_transform(range(1, greatest(length(s) - 3, 1)),
             i -> substr(s, CAST(i AS INT), 5)),
           s2 -> CAST('0x' || substr(md5(s2), 1, 15) AS BIGINT))) AS shingles
  FROM norm
), ex AS (
  SELECT doc_id, lang, unnest(shingles) AS h FROM sh
), rare AS (
  SELECT h FROM ex GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 5
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ex a JOIN rare r ON a.h = r.h
  JOIN ex b ON b.h = r.h AND a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
             / least(len(sa.shingles), len(sb.shingles)), 6) AS containment
FROM cand
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
      / least(len(sa.shingles), len(sb.shingles)) >= 0.8
""",
    description="Containment near-dup detection (|A intersect B| / "
    "min(|A|,|B|) >= 0.8): catches a document EMBEDDED inside a larger "
    "one, which symmetric Jaccard misses entirely (a 200-token doc "
    "pasted into a 2000-token doc has J ~ 0.1 but containment 1.0) — "
    "the quote/boilerplate/aggregation-page duplication mode in web "
    "corpora. Candidates come from RARE-shingle anchors (2 <= df <= 5): "
    "a contained copy necessarily shares its source's rare shingles, "
    "while df-capping keeps the anchor join's fan-out bounded — no df^2 "
    "blowup from boilerplate shingles, by construction. The anchor rule "
    "is part of the operator's contract and the oracle mirrors it "
    "exactly.",
    tags=("llm", "dedup"),
)
def dedup_containment_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX
    from news_ingestion_data_pipeline_spark.tables import spread

    hashed = F.array_distinct(
        F.transform(
            TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    sh = (
        spread(t(spark, sf_dir, "documents"))
        .select("doc_id", "lang", hashed.alias("shingles"))
        .localCheckpoint()  # three consumers; lazy persist would race
    )
    ex = sh.select("doc_id", "lang", F.explode("shingles").alias("h"))
    rare = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 5))
        .select("h")
    )
    a = ex.alias("a").hint("shuffle_hash")
    b = ex.alias("b")
    cand = (
        a.join(rare, "h")
        .join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    cont = inter / F.least(F.size("sh_a"), F.size("sh_b"))
    return (
        # broadcast verify (planner default here): streams candidates
        # against the in-memory doc->array map, avoiding the
        # |cand| x array-width shuffle an SMJ would sort (measured 2x
        # slower) — right while the map fits; per-block verify beyond
        # (see dedup_jaccard_prefix for the measured comparison).
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(cont >= 0.8)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


@register(
    "agg_approx_top_k",
    oracle="""
WITH tok AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), _t -> _t <> '')) AS w
  FROM documents
), counts AS (
  SELECT w, COUNT(*) AS est_count FROM tok GROUP BY w
)
SELECT w, est_count,
       ROW_NUMBER() OVER (ORDER BY est_count DESC, w) AS rnk
FROM counts
ORDER BY est_count DESC, w
LIMIT 10
""",
    description="Heavy hitters via approx_top_k (space-saving sketch over "
    "exploded word tokens): the fixed-memory frequent-items path — at "
    "100 TB the sketch keeps maxItemsTracked counters per partition and "
    "merges associatively, where an exact GROUP BY must shuffle every "
    "distinct token. Run here with maxItemsTracked well above the "
    "stream's distinct count, where space-saving is provably EXACT, so "
    "the sketch output hash-matches the exact oracle; re-sorted by "
    "(count DESC, item) since the sketch's tie order is unspecified.",
    tags=("agg", "sketch", "text"),
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("w")
    ).where(F.col("w") != "")  # empty doc → split('') = [''] — drop it,
    # matching tokens('') = [] semantics (and the oracle's list_filter)
    # ask the sketch for MORE than the final k: which item the sketch
    # returns among boundary-count ties is unspecified, so over-fetch
    # past any possible tie span and let the total (count DESC, item)
    # order pick the final 10 deterministically
    top = toks.agg(F.expr("approx_top_k(w, 100, 100000)").alias("tk"))
    exploded = top.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("w"), F.col("e.count").alias("est_count")
    )
    # top-10 first (TakeOrderedAndProject over the 100-entry sketch),
    # THEN the rank window over only the 10 kept rows
    w_rnk = Window.orderBy(F.desc("est_count"), "w")
    return (
        exploded.orderBy(F.desc("est_count"), "w")
        .limit(10)
        .withColumn("rnk", F.row_number().over(w_rnk))
    )
