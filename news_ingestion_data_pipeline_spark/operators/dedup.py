"""Deduplication operators for the training-data pipeline.

Five strategies over a document table (id col + text col), each returning a
DataFrame; all deterministic (md5-derived hashing, no RNG at runtime) so
results are reproducible and — where SQL-expressible — oracle-checkable.

Scale design (100 TB):
  * exact       — one hash-aggregate on a 32-byte key; partial aggregation
                  map-side, shuffle carries only (key, min_id).
  * minhash LSH — explode to (band_signature, id) pairs: shuffle volume is
                  O(docs × bands), not O(docs²); candidate pairs come from
                  an equi-join on band signature (hash join on a short key),
                  then exact Jaccard verifies candidates only.
  * simhash     — fingerprint is computed in the project stage; near-dup =
                  equi-join on fingerprint (or banded fingerprint chunks for
                  hamming-distance tolerance).
  * ngram-jaccard — inverted-index style: explode distinct shingles, self
                  equi-join on shingle, count common shingles per pair. The
                  join key is a shingle, so frequent shingles are skew —
                  capped via document-frequency pruning (drop shingles
                  appearing in > max_df docs: they can't discriminate and
                  they quadratically blow up the pair count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.tables import spread

# Deterministic MinHash parameter sets: signature h_i(x) = (a_i*(x mod P) + b_i)
# mod P over the 32-bit shingle hash x. P = 2^31-1 (Mersenne prime); operands
# stay < 2^31 so a*(x mod P)+b < 2^62 never overflows int64. a/b are fixed
# constants derived from a seeded LCG (generated once, frozen here).
_MINHASH_P = (1 << 31) - 1


def _minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    params = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state | 1) % _MINHASH_P or 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _MINHASH_P
        params.append((a, b))
    return params


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on the normalized-text fingerprint; keeps the lowest id
    per duplicate group. Returns (fingerprint, keep_id, dup_count)."""
    return (
        docs.select(
            F.col(id_col), TX.doc_fingerprint(F.col(text_col)).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The deduplicated table itself: one surviving row (min id) per
    fingerprint group, original columns preserved."""
    fp = docs.withColumn("fingerprint", TX.doc_fingerprint(F.col(text_col)))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "fingerprint")
    )


def shingle_hashes(docs: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, shingle_hash:int32) — exploded distinct character-n-gram
    shingles, hashed to 32-bit ints via md5-prefix (engine-portable).

    ``spread`` first: shingling + hashing is the pipeline's heaviest
    map-side compute and must not inherit a one-row-group scan's single
    partition."""
    docs = spread(docs)
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(TX.char_ngrams(F.col(text_col), n))).alias("shingle"),
    ).select(
        "id",
        F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long").alias("shingle_hash"),
    ).distinct()


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures.

    One explode + one groupBy: for each permutation i, min((a_i*x+b_i) mod P)
    over the doc's shingle hashes. The aggregate is a single pass computing
    all num_hashes minima (array of F.min columns), shuffle carries only the
    per-doc signature.
    """
    return minhash_signatures_from_hashes(
        shingle_hashes(docs, id_col, text_col, shingle_n), num_hashes
    )


def minhash_signatures_from_hashes(sh: DataFrame, num_hashes: int = 32) -> DataFrame:
    """(id, shingle_hash) → (id, sig): the signature aggregate alone, for
    callers that already hold an exploded shingle-hash table (e.g. the
    verified pipeline, which reuses ONE shingle pass for both candidate
    generation and exact verification)."""
    params = _minhash_params(num_hashes)
    x = sh.withColumn("x", F.col("shingle_hash") % F.lit(_MINHASH_P))
    mins = [
        F.min((F.col("x") * F.lit(a) + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = x.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    rows-per-band = num_hashes/bands; two docs are candidates iff they agree
    on *all* rows of at least one band. Emits (id_a, id_b, n_bands_matched).
    Shuffle is O(docs × bands); the per-band equi-join is a hash join on the
    band-signature string.

    The band-entry table is eagerly localCheckpoint'ed before the
    self-join: Spark's exchange reuse does not fire across the two aliased
    sides here, and a LAZY persist loses the race when both join sides'
    map stages launch concurrently (each misses the empty cache and
    recomputes the whole shingle→signature pipeline — the same pathology
    measured at 47s vs 12s on the jaccard-prefix twin). The materialized
    table is docs×bands short rows, negligible next to the corpus; at
    100 TB the same role is played by materializing signatures once
    (they're reused across dedup runs anyway).
    """
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    return lsh_band_pairs(sigs, num_hashes, bands)


def lsh_band_pairs(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, sig) → candidate pairs via banding; the join stage of
    minhash_lsh_pairs, split out for callers with precomputed signatures."""
    band_entries = band_entry_table(sigs, num_hashes, bands).localCheckpoint()

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )
    return pairs


def band_entry_table(
    sigs: DataFrame, num_hashes: int, bands: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(id, sig) → one (id, band, bucket) row per band — the LSH index
    table itself. At 100 TB this is the table you MATERIALIZE once and
    keep partitioned by (band, bucket): every later dedup run joins new
    documents against it instead of re-signing the corpus.

    ``carry`` names extra per-id columns of ``sigs`` to ride through the
    explode (e.g. an ingest-batch flag): cheaper than joining them back
    on id afterwards, which would re-run the signature pipeline's
    row-defining aggregate just to recover the id set."""
    rows_per_band = num_hashes // bands
    return sigs.select(
        "id",
        *carry,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "id", *carry, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_band_pairs_incremental(
    sigs: DataFrame,
    num_hashes: int,
    bands: int,
    delta_col: str = "is_delta",
) -> DataFrame:
    """Incremental LSH candidate generation: candidates for the DELTA
    documents only — delta-vs-index and delta-vs-delta pairs, never
    index-vs-index (that work was done when the index rows were
    ingested). ``sigs`` carries a boolean ``delta_col``.

    This is the production shape of continuous corpus ingestion: the
    band-entry table is the persistent LSH index; each new batch signs
    only its own documents and equi-joins its band entries against the
    index. Shuffle is O(delta x bands) probe-side; the index side is a
    (band, bucket)-partitioned table at rest, so at scale the join
    degenerates to partition-local lookups. Emits
    (id_a, id_b, n_bands_matched, vs) with vs in ('index', 'delta')
    telling whether the new doc duplicates the corpus or its own batch.
    """
    # The slim post-explode band table is pinned; the signature frame
    # itself is NOT (r11 pinned it and regressed: materializing the full
    # num_hashes-array RDD cost more than the recompute it saved —
    # min-of-3 1.59 -> 2.69 s). The delta flag RIDES the band explode
    # instead of being joined back on id: the former join-back branch
    # could not be column-pruned (the signature groupBy defines the id
    # row set), so it re-ran the whole shingle pipeline (~40 CPU-s at
    # sf0.1) just to produce (id, flag).
    entries = (
        band_entry_table(sigs.withColumnRenamed(delta_col, "_delta"),
                         num_hashes, bands, carry=("_delta",))
        .localCheckpoint()
    )

    a = entries.alias("a")
    d = entries.filter(F.col("_delta")).alias("d")
    return (
        a.join(
            d,
            (F.col("a.band") == F.col("d.band"))
            & (F.col("a.bucket") == F.col("d.bucket"))
            & (F.col("a.id") < F.col("d.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("d.id").alias("id_b"),
            F.col("a._delta").alias("a_delta"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_bands_matched"),
            F.first("a_delta").alias("a_delta"),
        )
        .select(
            "id_a",
            "id_b",
            "n_bands_matched",
            F.when(F.col("a_delta"), F.lit("delta"))
            .otherwise(F.lit("index"))
            .alias("vs"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index self-join: |A∩B| from the shingle join, |A|,|B| from
    per-doc shingle counts, jaccard = inter/(|A|+|B|-inter). ``max_df``
    drops shingles present in more than max_df docs (skew + noise control —
    at 100 TB this is mandatory; boilerplate shingles otherwise create
    quadratic buckets).
    Returns (id_a, id_b, jaccard) with jaccard ≥ threshold, 6 dp.
    """
    sh = shingle_hashes(docs, id_col, text_col, shingle_n)
    if max_df is not None:
        df_counts = sh.groupBy("shingle_hash").agg(F.count(F.lit(1)).alias("df"))
        sh = (
            sh.join(df_counts.filter(F.col("df") <= max_df).select("shingle_hash"),
                    "shingle_hash", "inner")
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle_hash") == F.col("b.shingle_hash")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 3
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash hex fingerprints.

    Set-oriented construction (the shape that scales): explode word-n-gram
    shingles to rows, hash each to 64 bits (4×16-bit words via md5-prefix),
    then one hash-aggregate computing all 64 bit-vote sums as integer
    shift/mask expressions — whole-stage-codegen'd, partial-aggregated
    map-side. Shuffle carries (id, 64 ints). Docs with zero shingles get the
    all-zeros fingerprint.
    """
    shingled = spread(docs).select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.array_distinct(TX.word_ngrams(F.col(text_col), ngram))
        ).alias("shingle"),
    )
    h = F.md5("shingle")
    # 4 × 16-bit words of the 64-bit hash prefix
    words = shingled.select(
        "id",
        *[
            F.coalesce(
                F.conv(F.substring(h, 1 + 4 * q, 4), 16, 10).cast("int"), F.lit(0)
            ).alias(f"w{q}")
            for q in range(4)
        ],
        F.col("shingle").isNotNull().cast("int").alias("has_shingle"),
    )
    # The 64 bit-vote aggregates and the 16-nibble hex fold are built as
    # F.expr strings (one driver round trip each / one for the final
    # concat) instead of nested Column operators — the Column-API form
    # cost ~10k py4j calls and ~2 s of plan construction per build for
    # the IDENTICAL analyzed expressions.
    votes = [
        F.expr(
            "sum(CASE WHEN has_shingle = 0 THEN 0 ELSE "
            f"CASE WHEN (shiftright(w{b // 16}, {15 - b % 16}) & 1) = 1 "
            "THEN 1 ELSE -1 END END)"
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = words.groupBy("id").agg(*votes)
    bit = lambda b: f"(CASE WHEN b{b} > 0 THEN 1 ELSE 0 END)"  # noqa: E731
    nibbles = ", ".join(
        "lower(conv(CAST("
        f"{bit(i * 4)} * 8 + {bit(i * 4 + 1)} * 4 + "
        f"{bit(i * 4 + 2)} * 2 + {bit(i * 4 + 3)}"
        " AS STRING), 10, 16))"
        for i in range(16)
    )
    return agg.select("id", F.expr(f"concat({nibbles})").alias("simhash"))


def simhash_dup_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", ngram: int = 3
) -> DataFrame:
    """Groups of docs sharing an identical SimHash fingerprint (hamming
    distance 0 — near-identical token distributions). For distance-k
    tolerance, band the fingerprint into k+1 chunks and equi-join per chunk
    (pigeonhole), same LSH shape as minhash_lsh_pairs."""
    fp = simhash_fingerprints(docs, id_col, text_col, ngram)
    return (
        fp.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("id").alias("keep_id"))
        .filter(F.col("dup_count") > 1)
    )


def occupancy_plane_depth(
    n_rows: int,
    max_planes: int,
    target_occupancy: int = 16,
    min_planes: int = 4,
) -> int:
    """Signature depth that keeps expected LSH bucket occupancy constant.

    ``k = clamp(ceil(log2(n / target_occupancy)), min_planes, max_planes)``
    so expected rows-per-bucket stays ~``target_occupancy`` as the corpus
    grows: at 8x data the depth gains 3 bits and in-bucket pair work stays
    linear in n instead of quadratic in occupancy. The formula is pure
    double-precision arithmetic so a SQL oracle can replay it bit-identically
    (``ceil(log2(count(*)/16.0))``).
    """
    import math

    raw = math.ceil(math.log2(max(n_rows, 1) / float(target_occupancy)))
    return max(min_planes, min(max_planes, raw))


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_hyperplanes: list[list[float]] | None = None,
    target_occupancy: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    With ``bucket_hyperplanes``: LSH-bucketed self-join (sign signature as
    join key) — the 100 TB path; candidates only within a bucket. Without:
    full O(n²) self-join (correct baseline for verification).
    Returns (id_a, id_b, cos_sim).

    With ``target_occupancy`` set, ``bucket_hyperplanes`` is treated as the
    MAX plane set and the effective signature depth is derived from the
    corpus count via :func:`occupancy_plane_depth` — expected bucket
    occupancy (hence per-bucket pair work) stays constant as the corpus
    grows, so total candidates scale linearly in n rather than
    quadratically in occupancy. One scalar ``count()`` job at plan-build
    time buys a depth that is correct at any scale; the seeded plane
    stream makes ``planes[:k]`` a stable prefix, so the bucketing is
    continuous in n.
    """
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.tables import spread

    # Norms projected once per vector (cosine in the pair stage is then just
    # a dot product); spread so the per-pair scoring isn't serialized by a
    # one-row-group scan.
    base = spread(emb).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("nrm"),
    )
    if bucket_hyperplanes is not None:
        planes = bucket_hyperplanes
        if target_occupancy is not None:
            k = occupancy_plane_depth(
                emb.count(), len(bucket_hyperplanes), target_occupancy
            )
            planes = bucket_hyperplanes[:k]
        base = base.withColumn(
            "bucket", V.hyperplane_signature("vec", planes)
        )
        # Salted bucket self-join: a plain shuffle join on `bucket` caps
        # parallelism at 2^n_planes tasks, and broadcasting one side (the
        # former shape) ships the WHOLE corpus to every executor — the
        # 100x-killer. Salting multiplies parallelism by `salt` at the
        # cost of replicating the build side `salt` times in the shuffle
        # (S*n rows, bounded, vs executors*n for a broadcast): a-side
        # rows carry salt = id % S, the b-side is replicated across all
        # S salts, so every in-bucket pair matches exactly once. With
        # occupancy-derived depth the bucket count itself grows with n,
        # so salt is a fixed parallelism multiplier, not a scale knob.
        salt = 8
        a = base.withColumn(
            "salt", F.pmod(F.col("id"), F.lit(salt))
        ).alias("a")
        b = base.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        ).alias("b")
        join_cond = (
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.id") < F.col("b.id"))
        )
    else:
        # exact all-pairs baseline (no caller in the registry; the scale
        # path for exhaustive pairs is the GEMM-tiled
        # sim_pairs_above_threshold) — no broadcast hint, planner decides
        a, b = base.alias("a"), base.alias("b")
        join_cond = F.col("a.id") < F.col("b.id")
    return (
        a.join(b, join_cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                V.cosine_from_norms(
                    F.col("a.vec"), F.col("b.vec"), F.col("a.nrm"), F.col("b.nrm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_pairs_banded(
    emb: DataFrame,
    bands: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    salt: int = 8,
) -> DataFrame:
    """OR-banded hyperplane LSH near-dup pairs: candidates share ANY
    band's FULL signature (union over bands, then one exact-cosine
    verify per distinct pair). Versus one wide signature, banding is
    the quadratic-killer: b bands of k planes give recall
    1-(1-p^k)^b > p^(k') at equal work while each band's buckets stay
    2^k-way small — the same AND-OR construction as minhash-LSH,
    applied to sign signatures. Candidate joins are salted like the
    single-signature path (no corpus broadcast, no bucket-count
    parallelism cap)."""
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.tables import spread

    base = spread(emb).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("nrm"),
    )
    cand = None
    for planes in bands:
        sig = base.select(
            "id", V.hyperplane_signature("vec", planes).alias("bucket")
        )
        a = sig.withColumn("salt", F.pmod(F.col("id"), F.lit(salt))).alias(
            "a"
        )
        b = sig.withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        ).alias("b")
        part = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.distinct()
    va = base.select(
        F.col("id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
    )
    vb = base.select(
        F.col("id").alias("id_b"),
        F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                V.cosine_from_norms(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair graph → (node,
    component) with component = min node id in the component.

    Iterative min-label propagation with pointer jumping, as plain
    DataFrame joins: each round every node takes the min of its own label
    and its neighbors' labels (one hop), then follows its label's label
    (comp(comp), halving chain length). Convergence when no label changes
    (checked with a driver-side count — iteration CONTROL on the driver,
    never data). Rounds needed = O(log diameter), bounded by ``max_iter``
    (20 covers diameters up to ~2^20; near-dup graphs are star-shaped
    clusters that converge in 2-3).

    This is the duplicate-CLUSTERING step after pair generation: a keep-one
    policy needs the transitive closure (A≈B, B≈C ⇒ {A,B,C} one group),
    not the raw pairs. At 100 TB the same two join primitives survive; the
    large-star/small-star alternation is the further refinement if hot
    nodes skew the neighbor-min shuffle. Each round ends in a
    ``localCheckpoint`` — the self-join would otherwise TRIPLE the logical
    plan per round (persist caches blocks but does not truncate lineage,
    so the analyzer re-walks an exponentially growing tree and OOMs the
    driver around round 15); checkpointing resets the plan to a leaf.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("nmin"))
        )
        hop = (
            labels.join(neighbor_min, F.col("node") == F.col("node2"), "left_outer")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
            )
            .persist()
        )
        # Pointer jumping: comp ← min(comp, comp(comp)). Every comp value
        # is itself a node (invariant holds from init and both updates), so
        # the self-join is total. This halves label-chain length each
        # round, turning O(diameter) rounds into O(log diameter) — a
        # 31-node path converges in ~6 rounds, not 30.
        new_labels = (
            hop.alias("l1")
            .join(hop.alias("l2"), F.col("l1.comp") == F.col("l2.node"))
            .select(
                F.col("l1.node").alias("node"),
                F.least(F.col("l1.comp"), F.col("l2.comp")).alias("comp"),
            )
            .localCheckpoint()
        )
        hop.unpersist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", "comp")


def simhash_hamming_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ ``max_hamming``.

    Banded candidate generation (pigeonhole): split the 64-bit fingerprint
    into ``bands`` chunks — any pair within hamming ≤ max_hamming agrees
    exactly on at least one chunk whenever max_hamming < bands... strictly,
    a pair differing in ≤ (bands-1) chunk-disjoint bit positions must match
    on ≥1 chunk; with 4 bands this is guaranteed for hamming ≤ 3 and
    heuristic above (standard banded-simhash recall trade-off). Candidates
    equi-join on (band, chunk); exact hamming via XOR + bit_count verifies.
    Shuffle is O(docs × bands) — the same scale shape as MinHash banding.
    """
    rows_per_band = 16 // bands  # hex chars per band over the 16-hex hash
    # 64-bit hash as two 32-bit halves for XOR+bit_count: conv of the full
    # 16 hex chars can exceed 2^63 and corrupt the signed long.
    hi = F.conv(F.substring("simhash", 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring("simhash", 9, 8), 16, 10).cast("long")
    fp = simhash_fingerprints(docs, id_col, text_col).select(
        "id", "simhash", hi.alias("hi"), lo.alias("lo")
    )
    entries = fp.select(
        "id",
        "simhash",
        "hi",
        "lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("simhash", b * rows_per_band + 1, rows_per_band).alias(
                            "chunk"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "simhash", "hi", "lo", F.col("bc.band"), F.col("bc.chunk"))
    a, b = entries.alias("a"), entries.alias("b")
    ham = F.bit_count(
        F.col("a.hi").bitwiseXOR(F.col("b.hi"))
    ) + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
