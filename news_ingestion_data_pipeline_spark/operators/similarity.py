"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — exact baseline; a cross join that Spark
    executes as broadcast-nested-loop when the query side is small (it
    always is: k query vectors vs N corpus vectors). Corpus side streams;
    memory is O(queries). The per-partition TakeOrdered keeps only k rows.
  * LSH-bucketed top-k — sign-of-hyperplane signature as the bucket key;
    candidates share a bucket (optionally with multi-probe via hamming-1
    neighbor buckets). At 100 TB the equi-join on bucket replaces the cross
    join: shuffle O(N), candidate set per query ~N/2^bits.

Deterministic: hyperplanes are seeded constants baked into the plan.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import vectors as V


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes (frozen at plan-build time)."""
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, neighbor_id, cos_sim, rank) — rank 1..k, ties broken
    by neighbor_id (deterministic). Self-matches (same id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("query_vec"),
            V.norm(F.col(query_vec_col)).alias("q_norm"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("vec"), F.col("query_vec"), F.col("c_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def flip_bit(bucket: Column, pos: int, n_bits: int) -> Column:
    """Flip the 1-based ``pos``-th character of a '0'/'1' signature string."""
    flipped = F.when(F.substring(bucket, pos, 1) == "1", F.lit("0")).otherwise(
        F.lit("1")
    )
    return F.concat(
        F.substring(bucket, 1, pos - 1), flipped, F.substring(bucket, pos + 1, n_bits - pos)
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k via the standard LSH AND-OR construction:
    ``n_tables`` independent hash tables of ``n_planes`` hyperplane-sign
    bits each; a pair is a candidate if it collides in ANY table (OR) on
    ALL bits (AND). Exact cosine re-ranks the candidate set.

    Why the composition matters: with one 8-bit table a cos≈0.5 neighbor
    agrees on all bits with probability (1-θ/π)^8 ≈ 0.04 — recall@5 was
    0.02 on the 500-vector fixture. Four independent 4-bit tables give
    1-(1-p⁴)⁴ per neighbor, plus hamming-1 multi-probe on each table;
    measured recall@5 0.94 (both sf0.001 and sf0.01) at 4× index size and
    a still-linear candidate join. The dials: n_planes ↓ or
    n_tables/probes ↑ → recall ↑, candidates ↑.

    Scale shape: the corpus side materializes one (table, bucket) row per
    table — the classic LSH index; candidate generation is an equi-join on
    (table, bucket); probes multiply only the query side. Candidate pairs
    are deduped (a pair may collide in several tables) before the exact
    re-rank so each pair's cosine is computed once.

    Output schema matches brute_force_topk.
    """
    tables = [make_hyperplanes(dim, n_planes, seed + ti) for ti in range(n_tables)]

    def entries(df: DataFrame, idc: str, vecc: str, normc: str, probe: bool) -> DataFrame:
        # Project each table's signature ONCE, then assemble the (tbl,
        # bucket) probe array from plain column REFERENCES. Inlining the
        # signature tree into every probe struct (the former shape) made
        # every later plan-construction step re-analyze n_tables*(1+
        # n_planes) copies of the literal-heavy dot-product trees —
        # classic-mode Dataset ops analyze eagerly, so tree size is a
        # per-transform driver cost. CollapseProject keeps the split
        # (the signature is non-cheap and multiply-referenced), so each
        # signature also evaluates once per row per table at runtime.
        base = df.select(
            F.col(idc),
            F.col(vecc),
            F.col(normc),
            *[
                V.hyperplane_signature(vecc, planes).alias(f"__sig{ti}")
                for ti, planes in enumerate(tables)
            ],
        )
        sigs = []
        for ti in range(len(tables)):
            sig = F.col(f"__sig{ti}")
            sigs.append(F.struct(F.lit(ti).alias("tbl"), sig.alias("bucket")))
            if probe:
                # hamming-1 probes: flip each bit of this table's signature
                for b in range(n_planes):
                    sigs.append(
                        F.struct(
                            F.lit(ti).alias("tbl"),
                            flip_bit(sig, b + 1, n_planes).alias("bucket"),
                        )
                    )
        return base.select(
            F.col(idc),
            F.col(vecc),
            F.col(normc),
            F.explode(F.array(*sigs)).alias("tb"),
        ).select(idc, vecc, normc, F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))

    c = entries(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("vec"),
            V.norm(F.col(vec_col)).alias("c_norm"),
        ),
        "neighbor_id", "vec", "c_norm", probe=False,
    )
    q = F.broadcast(
        entries(
            queries.select(
                F.col(query_id_col).alias("query_id"),
                F.col(query_vec_col).alias("query_vec"),
                V.norm(F.col(query_vec_col)).alias("q_norm"),
            ),
            "query_id", "query_vec", "q_norm", probe=multi_probe,
        )
    )
    # Score per collision row, THEN dedup: a pair colliding in several
    # tables re-evaluates the dot product (≤ n_tables times), but the dedup
    # shuffle carries only (query_id, neighbor_id, cos) instead of both
    # 64-float vectors — the vector-array shuffle was the dominant cost of
    # dedup-before-score (measured 5.1s → 1.4s at sf0.1). max() merges the
    # identical values deterministically.
    scored = (
        c.join(q, ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("vec"), F.col("query_vec"), F.col("c_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer of ``n_cells``
    centroids partitions the corpus into cells; each query probes its
    ``n_probe`` nearest cells and re-ranks exactly within them.

    The quantizer is deterministic: centroids are the corpus vectors with
    ``id < n_cells`` (seed vectors, zero k-means iterations), so both
    engines derive the identical partition. Assignment = argmax cosine with
    centroid-id tie-break.

    Scale shape: at 100 TB the assignment pass is a one-off materialization
    (cell becomes a partition column of the stored table); queries then
    touch only ``n_probe/n_cells`` of the data via partition pruning — the
    cross join in this one-shot form exists only because the fixture isn't
    pre-partitioned. Candidate search is an equi-join on ``cell`` exactly
    like the LSH path.
    """
    # bcast-ok: exactly n_cells rows survive the id < n_cells filter — the
    # centroid set is k-row by construction, SF-independent.
    cent = F.broadcast(
        corpus.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cvec"),
            V.norm(F.col(vec_col)).alias("cent_norm"),
        )
    )

    def rank_cells(df: DataFrame, idc: str, vecc: str, normc: str) -> DataFrame:
        scored = df.crossJoin(cent).select(
            df["*"],
            F.col("cent_id"),
            F.round(
                V.cosine_from_norms(
                    F.col(vecc), F.col("cvec"), F.col(normc), F.col("cent_norm")
                ),
                6,
            ).alias("cell_sim"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("cell_sim").desc(), F.col("cent_id"))
        return scored.withColumn("cell_rn", F.row_number().over(w))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        V.norm(F.col(vec_col)).alias("c_norm"),
    )
    assign = (
        rank_cells(c, "neighbor_id", "vec", "c_norm")
        .filter(F.col("cell_rn") == 1)
        .select("neighbor_id", "vec", "c_norm", F.col("cent_id").alias("cell"))
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("query_vec"),
        V.norm(F.col(query_vec_col)).alias("q_norm"),
    )
    probes = F.broadcast(
        rank_cells(q, "query_id", "query_vec", "q_norm")
        .filter(F.col("cell_rn") <= n_probe)
        .select("query_id", "query_vec", "q_norm", F.col("cent_id").alias("cell"))
    )
    scored = (
        assign.join(probes, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                V.cosine_from_norms(
                    F.col("vec"), F.col("query_vec"), F.col("c_norm"), F.col("q_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def gemm_topk(
    corpus: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched BLAS GEMM — the scale path for
    EXACT search.

    ``brute_force_topk`` evaluates the dot product per pair inside Catalyst
    (an interpreted higher-order-function fold: ~dim lambda steps per pair).
    Correct, but at 100 TB x thousands of queries the inner loop dominates.
    This variant ships the (small) query set to every partition as a dense
    float64 matrix and lets numpy compute ``corpus_batch @ Q.T`` per Arrow
    batch — one BLAS call scoring batch x queries pairs at memory-bandwidth
    throughput, ~10-100x the per-pair fold.

    Distribution shape: mapInPandas over corpus partitions (no shuffle of
    vectors); each batch emits only its LOCAL top candidates per query
    (k + an epsilon-tie guard), so the global exchange carries
    O(partitions x queries x k) scalar rows — the map-side-combine shape of
    a distributed top-k. Final ranking happens JVM-side on rounded scores
    with deterministic (cos DESC, neighbor_id) tie-break, identical to the
    other top-k paths.

    Numerical note: BLAS sums in a different order than the sequential HOF
    fold; scores agree to ~1e-13 and the projected value is rounded to 6
    decimals (the repo-wide cosine contract). The per-batch prune keeps
    every candidate within 1e-9 of the k-th local score, so rounding can
    never evict a true global top-k member before the exact final rank.
    """
    import pandas as pd

    qids = [int(q[0]) for q in query_rows]
    qmat_rows = [list(map(float, q[1])) for q in query_rows]

    def score_batches(it):
        import numpy as np

        Q = np.asarray(qmat_rows, dtype=np.float64)  # (m, d)
        qn = np.linalg.norm(Q, axis=1)
        qn_safe = np.where(qn > 0, qn, 1.0)
        qid_arr = np.asarray(qids, dtype=np.int64)
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.asarray(
                np.stack(pdf[vec_col].to_numpy()), dtype=np.float64
            )  # (n, d)
            cn = np.linalg.norm(V, axis=1)
            cn_safe = np.where(cn > 0, cn, 1.0)
            sims = (V @ Q.T) / np.outer(cn_safe, qn_safe)
            sims[cn == 0, :] = 0.0
            sims[:, qn == 0] = 0.0
            out_q, out_n, out_s = [], [], []
            for j in range(len(qid_arr)):
                s = sims[:, j]
                mask = ids != qid_arr[j]
                s_m, ids_m = s[mask], ids[mask]
                if len(s_m) == 0:
                    continue
                if len(s_m) > k:
                    kth = np.partition(s_m, len(s_m) - k)[len(s_m) - k]
                    keep = s_m >= kth - 1e-9
                    s_m, ids_m = s_m[keep], ids_m[keep]
                out_q.append(np.full(len(s_m), qid_arr[j]))
                out_n.append(ids_m)
                out_s.append(s_m)
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cos_full": np.concatenate(out_s),
                    }
                )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, "query_id long, neighbor_id long, cos_full double"
    )
    scored = cand.select(
        "query_id", "neighbor_id", F.round(F.col("cos_full"), 6).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def gemm_eps_pairs(
    corpus: DataFrame,
    eps2: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs within squared-L2 ``eps2`` via block-partitioned Arrow/
    numpy GEMM — the epsilon-neighborhood twin of ``gemm_topk`` (DBSCAN's
    candidate stage), EXACT (every qualifying pair is emitted, unlike LSH
    bucketing which can miss cross-bucket neighbors).

    Scale shape: vectors are assigned to ``n_blocks`` blocks by id; each
    of the B·(B+1)/2 block PAIRS becomes one applyInPandas group that
    GEMMs its two tiles vectorized (evaluating the 64-term distance per
    pair inside a BroadcastNestedLoop condition is interpreted
    row-at-a-time — measured 29-122 s on the 4M-pair sf0.1 scan — vs <1 s
    for the numpy plane). Nothing is collected to the driver and no task
    closure carries the corpus (the round-2 shape this replaces): shuffle
    volume is O(n·B) replicated rows, per-task memory two n/B tiles, and
    raising ``n_blocks`` scales the same plan to any corpus size —
    B ~ sqrt(n·d / tile_budget) keeps tiles constant-sized.

    Numerical note: numpy's pairwise summation over the 64-dim axis is
    identical regardless of tiling (per-pair, not cross-pair); it differs
    from a sequential fold by ~1 ulp, and the fixtures' closest pair sits
    1.2e-6 from the eps2 = 1.40 boundary (measured across all SFs), so no
    threshold decision can flip. Emits BOTH directions (u, w) and (w, u);
    no self-pairs.
    """
    import pandas as pd

    B = int(n_blocks)
    if B <= 0:
        # pmod(id, 0) is NULL, so sequence/explode would silently drop
        # every row — a caller typo would yield zero pairs (and zero
        # DBSCAN clusters) with no error. Fail loudly instead.
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(B)).cast("int").alias("blk"),
    )
    # A-side: block k participates in tile pairs (k, k..B-1); B-side in
    # (0..k, k). Together every unordered block pair (i <= j) sees block i
    # as side 'a' and block j as side 'b' exactly once.
    a_side = base.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("bj"),
        F.lit("a").alias("side"),
        "id",
        "vec",
    )
    b_side = base.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit("b").alias("side"),
        "id",
        "vec",
    )
    tiles = a_side.unionByName(b_side)

    def tile_pairs(key, pdf):
        import numpy as np

        bi, bj = int(key[0]), int(key[1])
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"u": [], "w": []}).astype("int64")
        ia = a["id"].to_numpy(dtype=np.int64)
        ib = b["id"].to_numpy(dtype=np.int64)
        Vb = np.asarray(np.stack(b["vec"].to_numpy()), dtype=np.float64)
        Va_all = np.asarray(np.stack(a["vec"].to_numpy()), dtype=np.float64)
        out_u, out_w = [], []
        # chunk the A tile so the (chunk, |b|) distance plane stays small
        for s in range(0, len(Va_all), 256):
            Va, iac = Va_all[s : s + 256], ia[s : s + 256]
            d2 = ((Va[:, None, :] - Vb[None, :, :]) ** 2).sum(-1)
            ui, wi = np.nonzero(d2 <= eps2)
            u, w = iac[ui], ib[wi]
            keep = u != w
            u, w = u[keep], w[keep]
            if len(u):
                out_u.append(u)
                out_w.append(w)
                if bi != bj:
                    # off-diagonal tiles see each unordered pair once;
                    # mirror to emit both directions (diagonal tiles get
                    # both from the full matrix minus the diagonal)
                    out_u.append(w)
                    out_w.append(u)
        if not out_u:
            return pd.DataFrame({"u": [], "w": []}).astype("int64")
        return pd.DataFrame(
            {"u": np.concatenate(out_u), "w": np.concatenate(out_w)}
        )

    # Explicit-count repartition on the tile keys: the Python GEMM's cost
    # is invisible to AQE, which coalesces the B·(B+1)/2 groups down to a
    # handful of tasks by SHUFFLE BYTES (profiled at sf0.1: 36 tiles ->
    # 4 tasks, 7 CPU-s of numpy serialized onto 4 slots). A
    # REPARTITION_BY_NUM shuffle is not AQE-coalescable and satisfies the
    # groupBy's clustered distribution, so the tile stage keeps ~one
    # group per task; the count scales with B (corpus size), not cores.
    return (
        tiles.repartition(B * (B + 1), "bi", "bj")
        .groupBy("bi", "bj")
        .applyInPandas(tile_pairs, "u long, w long")
    )


def gemm_cos_pairs(
    corpus: DataFrame,
    min_cos: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) with cosine >= ``min_cos`` via the
    same block-partitioned Arrow/numpy GEMM tiling as ``gemm_eps_pairs`` —
    the scale shape for a full-corpus near-dup sweep that previously
    required broadcasting the whole embedding table into a theta join.

    Scale shape: B·(B+1)/2 block-pair tiles, each one applyInPandas group;
    shuffle volume O(n·B), per-task memory two n/B tiles, nothing in the
    task closure, raising ``n_blocks`` scales the identical plan to any
    corpus size. Emitted ``cos`` is the raw numpy double — callers apply
    their own rounding/threshold JVM-side; the tile stage pre-filters with
    a 1e-9 slack so a boundary pair can never be lost to summation-order
    noise (numpy pairwise sum vs a sequential fold differs by ~1 ulp).
    """
    import pandas as pd

    B = int(n_blocks)
    if B <= 0:
        raise ValueError(f"n_blocks must be >= 1, got {n_blocks}")
    slack = float(min_cos) - 1e-9
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.col(id_col), F.lit(B)).cast("int").alias("blk"),
    )
    a_side = base.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("bj"),
        F.lit("a").alias("side"),
        "id",
        "vec",
    )
    b_side = base.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit("b").alias("side"),
        "id",
        "vec",
    )
    tiles = a_side.unionByName(b_side)

    def tile_pairs(key, pdf):
        import numpy as np

        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        a = pdf[pdf["side"] == "a"]
        b = pdf[pdf["side"] == "b"]
        if len(a) == 0 or len(b) == 0:
            return empty
        ia = a["id"].to_numpy(dtype=np.int64)
        ib = b["id"].to_numpy(dtype=np.int64)
        Vb = np.asarray(np.stack(b["vec"].to_numpy()), dtype=np.float64)
        Va_all = np.asarray(np.stack(a["vec"].to_numpy()), dtype=np.float64)
        nb = np.sqrt((Vb * Vb).sum(-1))
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(Va_all), 256):
            Va, iac = Va_all[s : s + 256], ia[s : s + 256]
            na = np.sqrt((Va * Va).sum(-1))
            cos = (Va @ Vb.T) / (na[:, None] * nb[None, :])
            ui, wi = np.nonzero(cos >= slack)
            u, w, c = iac[ui], ib[wi], cos[ui, wi]
            keep = u != w
            u, w, c = u[keep], w[keep], c[keep]
            if len(u):
                lo = np.minimum(u, w)
                hi = np.maximum(u, w)
                out_a.append(lo)
                out_b.append(hi)
                out_c.append(c)
        if not out_a:
            return empty
        res = pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )
        # the diagonal tile sees each unordered pair twice (full matrix);
        # off-diagonal tiles exactly once — dedup is a per-tile local op
        return res.drop_duplicates(subset=["id_a", "id_b"])

    # same AQE-coalesce guard as gemm_eps_pairs: keep ~one tile per task
    return (
        tiles.repartition(B * (B + 1), "bi", "bj")
        .groupBy("bi", "bj")
        .applyInPandas(tile_pairs, "id_a long, id_b long, cos double")
    )
