"""Third wave: the scale-path variants a 100 TB deployment reaches for —
BLAS-GEMM exact search, SemDeDup cluster-pruned semantic dedup, weighted
reservoir sampling, incremental aggregate maintenance (partial-state
merge), an explicit bloom-prefiltered join, and bit-exact recursive EWMA
smoothing — each with a DuckDB oracle.

Reference parity note: the reference (NeerajBassi/news_ingestion_data_pipeline,
a 645-LoC scrape-ETL) has none of these; they extend the engine along the
training-data-pipeline axis (exact ANN baseline at GEMM throughput,
semantic dedup, deterministic sampling) and the warehouse axis
(incremental aggregates, runtime join pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.operators import similarity as SIM
from news_ingestion_data_pipeline_spark.plans.registry import (
    SQL_DSUM,
    dsum,
    register,
    t,
)


@register(
    "sim_gemm_topk",
    oracle="""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
     q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(a.v, q.v) / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(q.v, q.v))), 6) AS cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY round(list_dot_product(a.v, q.v)
                              / (sqrt(list_dot_product(a.v, a.v))
                                 * sqrt(list_dot_product(q.v, q.v))), 6) DESC,
                            a.vec_id) AS rank
  FROM c a CROSS JOIN q
  WHERE a.vec_id != q.vec_id
) WHERE rank <= 5
""",
    description="Exact cosine top-5 via Arrow-batched numpy GEMM "
    "(operators/similarity.py:gemm_topk): the query set is broadcast to "
    "every corpus partition as a dense float64 matrix, each Arrow batch is "
    "scored with ONE BLAS matrix multiply, and only per-batch top "
    "candidates (k plus an epsilon tie-guard) leave the partition — the "
    "map-side-combine shape of distributed top-k, no vector shuffle. Same "
    "oracle as sim_cosine_topk: both the Catalyst-fold baseline and this "
    "GEMM path hash-match the same exact result, proving the fast path "
    "is a pure physical rewrite.",
    tags=("llm", "similarity", "pandas-udf"),
)
def sim_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    emb = t(spark, sf_dir, "embeddings")
    query_rows = [
        (r["vec_id"], list(r["embedding"]))
        # driver-ok: ≤10 probe queries (vec_id < 10 filter)
        for r in emb.filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .collect()
    ]
    return SIM.gemm_topk(spread(emb), query_rows, k=5).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def _sqdist_sql(a: str, b: str, dim: int) -> str:
    # left-associative sum: identical IEEE evaluation order to Spark's fold
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, dim + 1)
    )


@register(
    "sim_semdedup",
    oracle=f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT e.vec_id, e.v, cent.cent_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sqdist_sql('e.v', 'cent.cv', 64)},
                              cent.cent_id) AS rn
    FROM e CROSS JOIN cent
  ) WHERE rn = 1
), dup AS (
  SELECT b.vec_id, MIN(a.vec_id) AS dup_of
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))
        * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.85
  GROUP BY b.vec_id
)
SELECT assigned.vec_id, cell,
       dup.dup_of IS NULL AS kept,
       dup.dup_of
FROM assigned LEFT JOIN dup ON assigned.vec_id = dup.vec_id
""",
    description="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic "
    "dedup = cluster the embedding space coarsely, then prune only WITHIN "
    "each cluster — the quadratic pairwise pass is bounded to "
    "O(sum cell_i^2) instead of O(n^2), and cells are embarrassingly "
    "parallel. Assignment reuses sim_kmeans_assign's deterministic seeded "
    "centroids and bit-exact left-assoc squared-L2 fold; within-cell "
    "pruning keeps the min-id representative of every >= 0.85-cosine "
    "group (keep/prune decision + blame pointer per vector, "
    "integer-exact output). At 100 TB the cell becomes a partition "
    "column: the self-join never crosses partitions.",
    tags=("llm", "similarity", "dedup"),
)
def sim_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.tables import spread

    # spread: the centroid-assignment distance folds are interpreted
    # array compute and the one-row-group scan would serialize them on a
    # single task (profiled r11: every stage of this query was tasks=1)
    e0 = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e = spread(e0)
    # centroids come off the raw scan (8 rows) — no need to route the
    # broadcast side through the spread exchange
    cent = e0.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv")
    )
    d = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "v", "cent_id", d.alias("d"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct("d", "cent_id")).alias("m"),
            F.first("v").alias("v"),
        )
        .select("vec_id", "v", F.col("m.cent_id").alias("cell"))
        .localCheckpoint()  # two consumers of a shuffle-bearing plan
    )
    # Salted within-cell self-join: the cell domain has 8 values, so a
    # plain join on "cell" runs the quadratic cosine pass in <= 8 tasks —
    # and AQE coalesces those to ONE because the shuffled BYTES are tiny
    # while the pair COMPUTE is the whole query (profiled r11: a 3.7 s
    # single-task join stage). Salting id_a over _SD_SALT buckets and
    # replicating the b side per salt splits each cell's pair space into
    # _SD_SALT independent tasks; the explicit repartition count is
    # AQE-coalesce-proof. Pair set is unchanged: each (id_a, id_b) meets
    # exactly once, at b's copy of a's deterministic salt. Same recipe as
    # join_salted_skew; at 100 TB _SD_SALT rides the same dial.
    _SD_SALT = 32
    n_parts = 8 * _SD_SALT
    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        V.norm(F.col("v")).alias("na"),
        "cell",
        F.pmod(F.col("vec_id"), F.lit(_SD_SALT)).cast("int").alias("salt"),
    ).repartition(n_parts, "cell", "salt")
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        V.norm(F.col("v")).alias("nb"),
        "cell",
        F.explode(F.lit(list(range(_SD_SALT)))).alias("salt"),
    ).repartition(n_parts, "cell", "salt")
    cos = F.round(
        V.cosine_from_norms(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")), 6
    )
    dup = (
        a.join(b, ["cell", "salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= 0.85)
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.min("id_a").alias("dup_of"))
    )
    return assigned.join(dup, "vec_id", "left").select(
        "vec_id",
        "cell",
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
    )


@register(
    "curation_sample_weighted",
    oracle="""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         -ln((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                   AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0)
           / n_chars AS k
  FROM documents
)
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rn
  FROM keyed
) WHERE rn <= 50
ORDER BY doc_id
""",
    description="Weighted sampling without replacement (Efraimidis-"
    "Spirakis A-ES, 'Weighted random sampling with a reservoir', IPL "
    "2006): each doc draws an Exp(weight) key = -ln(u)/w and the 50 "
    "smallest keys win — longer documents (w = n_chars) proportionally "
    "likelier, single top-K pass, no RNG state: u is a 52-bit uniform "
    "derived from md5(doc_id), so the 'random' draw is reproducible and "
    "engine-identical. At 100 TB this is one TakeOrderedAndProject "
    "(per-partition heap of 50, driver merge) over a map-only stage — "
    "the distributed reservoir. Keys are excluded from the projection; "
    "selection is robust to libm ln() ulp differences unless two keys "
    "tie within 1e-15 at the cut boundary.",
    tags=("llm", "curation", "sampling"),
)
def curation_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(4503599627370496.0)  # 2^52
    k = -F.log(u) / F.col("n_chars")
    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars", k.alias("k"))
        .orderBy("k", "doc_id")  # TakeOrderedAndProject: per-partition heap
        .limit(50)
        .select("doc_id", "lang", "n_chars")
        
    )


@register(
    "pipeline_incremental_agg",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {SQL_DSUM.format(col='o_totalprice')} AS total_price,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    description="Incremental aggregate maintenance (partial-state merge): "
    "the 'state' side aggregates history (o_orderdate < 1997-01-01) and "
    "the 'delta' side aggregates only the new slice, then the two partial "
    "states merge with the aggregate algebra itself — counts add, DECIMAL "
    "sums add exactly, min/max fold through least/greatest, via a "
    "full-outer join on the group key so groups born in the delta appear. "
    "This is Spark's own map-side partial aggregation lifted to table "
    "granularity: at 100 TB the history state is a stored table and each "
    "increment scans ONLY the delta — the oracle recomputes from scratch "
    "and the hash-match proves merge(state, delta) == recompute(all).",
    tags=("pipeline", "agg", "incremental"),
)
def pipeline_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-01-01").cast("date")
    orders = t(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            F.min("o_orderdate").alias("mn"),
            F.max("o_orderdate").alias("mx"),
        )

    state = partial(orders.filter(F.col("o_orderdate") < cutoff)).select(
        "o_orderpriority",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("mn").alias("mn_a"),
        F.col("mx").alias("mx_a"),
    )
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff)).select(
        "o_orderpriority",
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("mn").alias("mn_b"),
        F.col("mx").alias("mx_b"),
    )
    merged = state.join(delta, "o_orderpriority", "full_outer")
    zero = F.lit(0).cast("decimal(18,2)")
    return merged.select(
        "o_orderpriority",
        (F.coalesce("n_a", F.lit(0)) + F.coalesce("n_b", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("s_a", zero) + F.coalesce("s_b", zero))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_price"),
        F.date_format(
            F.least(F.coalesce("mn_a", "mn_b"), F.coalesce("mn_b", "mn_a")),
            "yyyy-MM-dd",
        ).alias("first_order"),
        F.date_format(
            F.greatest(F.coalesce("mx_a", "mx_b"), F.coalesce("mx_b", "mx_a")),
            "yyyy-MM-dd",
        ).alias("last_order"),
    )


# Bloom parameters: 3 hash functions into a 4096-bit filter packed as 64
# words of 64 bits. Frozen seeds; xxhash64 is Spark-side only — the filter
# is transparent to semantics (false positives are removed by the real
# join), so the oracle is the plain semi-join.
_BLOOM_BITS = 4096
_BLOOM_SEEDS = (101, 202, 303)


@register(
    "join_bloom_prefiltered",
    oracle=f"""
SELECT l.l_suppkey,
       COUNT(*) AS n_items,
       {SQL_DSUM.format(col='l.l_quantity')} AS total_qty
FROM lineitem l
WHERE l.l_suppkey IN (
  SELECT s.s_suppkey FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7')
)
GROUP BY l.l_suppkey
ORDER BY l.l_suppkey
""",
    description="Explicit bloom-prefiltered join (the runtime-filter "
    "pattern Spark injects as spark.sql.optimizer.runtime.bloomFilter, "
    "made visible): the dim side (suppliers of two nations) builds a 4096-bit/"
    "3-hash bloom filter AS AN AGGREGATE — explode each key's bit "
    "positions, bit_or the words — yielding a <=64-row bitmap folded "
    "into ONE map literal broadcast to the fact scan. Each lineitem row "
    "tests its 3 xxhash64 positions with pure bit arithmetic BEFORE the "
    "join, so at 100 TB the shuffle/join sees only rows that probably "
    "match (false-positive rate (1-e^(-kn/m))^k ~ 1e-4 at 100 keys); the "
    "broadcast semi-join afterwards removes false positives, which is "
    "why the oracle is the plain semi-join — the bloom is a pure "
    "physical prefilter.",
    tags=("join", "bloom", "scale"),
)
def join_bloom_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )

    def positions(key):
        return [
            F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BLOOM_BITS))
            for seed in _BLOOM_SEEDS
        ]

    # build: key -> 3 bit positions -> (word, bit) -> bit_or per word ->
    # one row holding map<word, bits>. 32-bit words so the bit value
    # 2^(pos mod 32) is an exactly-representable double (shiftleft's
    # numBits argument can't be a Column).
    def bit_value(p):
        return F.pow(F.lit(2.0), F.pmod(p, F.lit(32)).cast("double")).cast("long")

    pos = dim.select(
        F.explode(F.array(*positions(F.col("s_suppkey")))).alias("pos")
    )
    bitmap = (
        pos.select(
            (F.col("pos") / 32).cast("int").alias("word"),
            bit_value(F.col("pos")).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(
                "bloom"
            )
        )
    )
    fact = t(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    probed = fact.crossJoin(F.broadcast(bitmap))
    checks = []
    for p in positions(F.col("l_suppkey")):
        word = (p / 32).cast("int")
        checks.append(
            F.coalesce(F.element_at(F.col("bloom"), word), F.lit(0).cast("long"))
            .bitwiseAND(bit_value(p))
            != 0
        )
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    prefiltered = probed.filter(cond).drop("bloom")
    exact = prefiltered.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    return (
        exact.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("total_qty"),
        )
        
    )


@register(
    "events_ewma_smooth",
    oracle="""
WITH vals AS (
  SELECT user_id, event_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS win
  FROM events
)
SELECT user_id, event_id, ts_s, value,
       round(list_reduce(win, (acc, x) -> 0.8 * acc + 0.2 * x), 6) AS ewma
FROM vals
""",
    description="Recursive EWMA smoothing (alpha = 0.2) over each user's "
    "trailing 16 events: the window collects the ordered frame and ONE "
    "left fold applies ewma = 0.8*acc + 0.2*x — the textbook recurrence, "
    "seeded from the oldest frame element. Because both engines run the "
    "identical sequence of IEEE multiply-adds (Spark aggregate fold, "
    "DuckDB list_reduce — both left-associative, both seeded from the "
    "first element), the smoothed values are BIT-exact across engines, "
    "with no pow() in sight. One (user) shuffle shared by window and "
    "projection; the bounded 16-row frame caps per-row state so the "
    "same plan streams in constant memory at any history length.",
    tags=("events", "window", "timeseries"),
)
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    vals = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "value",
        F.collect_list("value").over(w).alias("win"),
    )
    ewma = F.aggregate(
        F.slice(F.col("win"), 2, F.greatest(F.size("win") - 1, F.lit(0))),
        F.element_at(F.col("win"), 1),
        lambda acc, x: acc * 0.8 + x * 0.2,
    )
    return vals.select(
        "user_id", "event_id", "ts_s", "value", F.round(ewma, 6).alias("ewma")
    )
