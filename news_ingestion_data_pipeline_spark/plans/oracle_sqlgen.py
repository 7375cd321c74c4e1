"""Generated DuckDB oracle SQL for the hash-arithmetic dedup queries.

text_simhash / dedup_simhash_hamming / dedup_minhash_candidates /
dedup_minhash_verified were rows-only in round 1 ("bit-vote arithmetic is
not practical in SQL"). It *is* practical — just verbose: 64 bit-vote sum
columns, 32 MinHash permutation minima. This module generates those SQL
strings with Python loops so the arithmetic mirrors the Spark expressions
(functions/text.py simhash, operators/dedup.py minhash) term for term:

  * both engines hash shingles with md5 and parse hex via
    CAST('0x…' AS INT/BIGINT) ≡ F.conv(hex, 16, 10), so even hash
    collisions agree — parity is exact by construction;
  * MinHash (a_i, b_i) constants come from the SAME frozen LCG
    (operators/dedup._minhash_params), embedded as literals;
  * integer products stay < 2^62 — no overflow divergence.

Reference parity note: the reference pipeline has no near-dup stage (it
dedups on exact md5 keys, database_utils/database_methods.py); these
oracles certify the LLM-pipeline extension required by the north star.
"""

from __future__ import annotations

from news_ingestion_data_pipeline_spark.operators.dedup import (
    _MINHASH_P,
    _minhash_params,
)
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM

_NORM_CTE = f"SELECT doc_id AS id, {SQL_NORM.format(col='text')} AS s FROM documents"


# ---------------------------------------------------------------------------
# SimHash: 64-bit fingerprints over word 3-grams (mirrors
# functions/text.py simhash words/votes construction used by
# operators/dedup.simhash_fingerprints)
# ---------------------------------------------------------------------------

def _simhash_fp_ctes() -> str:
    """CTE chain ending in ``fp(id, simhash)`` for ALL documents (docs with
    < 3 tokens get the all-zeros fingerprint, like Spark's explode_outer)."""
    votes = ",\n    ".join(
        # bit b lives in 16-bit word b//16 at position 15 - b%16 (MSB first)
        f"SUM(CASE WHEN ((w{b // 16} >> {15 - b % 16}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS b{b}"
        for b in range(64)
    )
    nibbles = " || ".join(
        "substr('0123456789abcdef', "
        + " + ".join(
            f"(CASE WHEN b{i * 4 + k} > 0 THEN {8 >> k} ELSE 0 END)"
            for k in range(4)
        )
        + " + 1, 1)"
        for i in range(16)
    )
    return f"""norm AS (
  {_NORM_CTE}
), toks AS (
  SELECT id, CASE WHEN s = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split(s, ' ') END AS tk
  FROM norm
), shingle_rows AS (
  SELECT id, unnest(list_distinct(
    CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(1, len(tk) - 1),
                i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]
                     || ' ' || tk[CAST(i AS INT) + 2])
    END)) AS shingle
  FROM toks
), words AS (
  SELECT id,
    CAST('0x' || substr(md5(shingle), 1, 4) AS INTEGER) AS w0,
    CAST('0x' || substr(md5(shingle), 5, 4) AS INTEGER) AS w1,
    CAST('0x' || substr(md5(shingle), 9, 4) AS INTEGER) AS w2,
    CAST('0x' || substr(md5(shingle), 13, 4) AS INTEGER) AS w3
  FROM shingle_rows
), votes AS (
  SELECT id,
    {votes}
  FROM words GROUP BY id
), fp AS (
  SELECT n.id, coalesce(v.simhash, '0000000000000000') AS simhash
  FROM norm n LEFT JOIN (SELECT id, {nibbles} AS simhash FROM votes) v
    ON n.id = v.id
)"""


def simhash_oracle() -> str:
    return f"WITH {_simhash_fp_ctes()}\nSELECT id, simhash FROM fp"


def simhash_hamming_oracle(max_hamming: int = 6, bands: int = 4) -> str:
    """Banded candidates (any of the ``bands`` 4-hex chunks equal) verified
    by exact hamming ≤ max_hamming — mirrors
    operators/dedup.simhash_hamming_pairs including its recall bound: pairs
    within hamming but sharing NO chunk are (correctly) absent here too."""
    rows_per_band = 16 // bands
    chunks = ", ".join(
        f"substr(simhash, {b * rows_per_band + 1}, {rows_per_band}) AS c{b}"
        for b in range(bands)
    )
    any_chunk = " OR ".join(f"a.c{b} = x.c{b}" for b in range(bands))
    return f"""WITH {_simhash_fp_ctes()}, halves AS (
  SELECT id, {chunks},
         CAST('0x' || substr(simhash, 1, 8) AS BIGINT) AS hi,
         CAST('0x' || substr(simhash, 9, 8) AS BIGINT) AS lo
  FROM fp
)
SELECT a.id AS id_a, x.id AS id_b,
       bit_count(xor(a.hi, x.hi)) + bit_count(xor(a.lo, x.lo)) AS hamming
FROM halves a JOIN halves x ON a.id < x.id
WHERE ({any_chunk})
  AND bit_count(xor(a.hi, x.hi)) + bit_count(xor(a.lo, x.lo)) <= {max_hamming}"""


# ---------------------------------------------------------------------------
# MinHash-LSH: 32 seeded permutations, 8 bands × 4 rows (mirrors
# operators/dedup.minhash_signatures_from_hashes + lsh_band_pairs)
# ---------------------------------------------------------------------------

def _sig_cols(num_hashes: int) -> str:
    params = _minhash_params(num_hashes)
    return ",\n    ".join(
        f"MIN(({a} * x + {b}) % {_MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )


def _band_union(num_hashes: int, bands: int) -> str:
    rpb = num_hashes // bands
    return "\n  UNION ALL ".join(
        f"SELECT id, {b} AS band, "
        f"[{', '.join(f'h{b * rpb + r}' for r in range(rpb))}] AS bucket FROM sig"
        for b in range(bands)
    )


_CAND_JOIN = """cand AS (
  SELECT a.id AS id_a, x.id AS id_b, COUNT(*) AS n_bands_matched
  FROM bands a JOIN bands x
    ON a.band = x.band AND a.bucket = x.bucket AND a.id < x.id
  GROUP BY a.id, x.id
)"""


def minhash_candidates_oracle(num_hashes: int = 32, bands: int = 8) -> str:
    """32-bit shingle hashes (md5 8-hex prefix), as in
    operators/dedup.shingle_hashes."""
    return f"""WITH norm AS (
  {_NORM_CTE}
), xrows AS (
  SELECT id, unnest(list_distinct(list_transform(
    range(1, greatest(length(s) - 3, 1)),
    i -> CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 8) AS BIGINT)
  ))) % {_MINHASH_P} AS x
  FROM norm
), sig AS (
  SELECT id,
    {_sig_cols(num_hashes)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(num_hashes, bands)}
), {_CAND_JOIN}
SELECT id_a, id_b, n_bands_matched FROM cand"""


def minhash_incremental_oracle(num_hashes: int = 32, bands: int = 8) -> str:
    """Incremental variant of minhash_candidates_oracle: candidate pairs
    touching the DELTA slice only (doc_id % 10 < 3), never index-vs-index
    — mirrors operators/dedup.lsh_band_pairs_incremental."""
    return f"""WITH norm AS (
  {_NORM_CTE}
), xrows AS (
  SELECT id, unnest(list_distinct(list_transform(
    range(1, greatest(length(s) - 3, 1)),
    i -> CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 8) AS BIGINT)
  ))) % {_MINHASH_P} AS x
  FROM norm
), sig AS (
  SELECT id,
    {_sig_cols(num_hashes)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(num_hashes, bands)}
), cand AS (
  SELECT a.id AS id_a, x.id AS id_b, COUNT(*) AS n_bands_matched
  FROM bands a JOIN bands x
    ON a.band = x.band AND a.bucket = x.bucket AND a.id < x.id
  WHERE (x.id % 10) < 3
  GROUP BY a.id, x.id
)
SELECT id_a, id_b, n_bands_matched,
       CASE WHEN (id_a % 10) < 3 THEN 'delta' ELSE 'index' END AS vs
FROM cand"""


def minhash_verified_oracle(
    num_hashes: int = 32, bands: int = 8, threshold: str = "0.4"
) -> str:
    """Candidates from signatures over the 60-bit (15-hex) shingle hashes —
    the shared-shingle-pass variant dedup_minhash_verified actually runs
    (intentionally different hash width from dedup_minhash_candidates; see
    that query's description) — then exact Jaccard ≥ threshold on the same
    hash sets, filtered on the 6-dp ROUNDED value exactly as Spark does."""
    jac = (
        "round(len(list_intersect(da.shingles, db.shingles)) * 1.0 / "
        "(len(da.shingles) + len(db.shingles) "
        "- len(list_intersect(da.shingles, db.shingles))), 6)"
    )
    return f"""WITH norm AS (
  {_NORM_CTE}
), doc AS (
  SELECT id, list_distinct(list_transform(
    range(1, greatest(length(s) - 3, 1)),
    i -> CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 15) AS BIGINT)
  )) AS shingles
  FROM norm
), xrows AS (
  SELECT id, unnest(shingles) % {_MINHASH_P} AS x FROM doc
), sig AS (
  SELECT id,
    {_sig_cols(num_hashes)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(num_hashes, bands)}
), {_CAND_JOIN}
SELECT c.id_a, c.id_b, c.n_bands_matched, {jac} AS jaccard
FROM cand c
  JOIN doc da ON da.id = c.id_a
  JOIN doc db ON db.id = c.id_b
WHERE {jac} >= {threshold}"""


# ---------------------------------------------------------------------------
# Multimodal REAL-decode oracles. The synthetic real corpus
# (operators/multimodal.synthesize_media_real) generates payload content
# from closed-form doc_id+coordinate formulas, encodes it through the real
# codecs (BMP/WAV/framepack), and the queries decode it back through the
# real parsers — so the oracle can regenerate the decoded content with the
# same arithmetic and certify the whole encode→decode→feature path.
# Feature float math is integer sums + one IEEE division (+ sqrt) on both
# sides, hence bit-identical.
# ---------------------------------------------------------------------------

def multimodal_image_features_oracle() -> str:
    """Mirrors _real_image + extract_image_features(decoder='real') +
    the integer-exact _phash64 (block sums vs middle-pair-of-sorted)."""
    return """WITH d AS (
  SELECT doc_id, 64 + (doc_id % 3) * 8 AS h, 64 + (doc_id % 4) * 8 AS w
  FROM documents
), px AS (
  SELECT doc_id, h, w, unnest(range(0, h * w)) AS p FROM d
), vals AS (
  SELECT doc_id, h, w,
    (3 * doc_id + p) % 256 AS v0,
    (3 * doc_id + 1 + p) % 256 AS v1,
    (3 * doc_id + 2 + p) % 256 AS v2,
    ((p // w) // (h // 8)) * 8 + ((p % w) // (w // 8)) AS block_id
  FROM px
), agg AS (
  SELECT doc_id, h, w,
    SUM(v0) AS s0, SUM(v1) AS s1, SUM(v2) AS s2, SUM(v0 * v0) AS ss0
  FROM vals GROUP BY doc_id, h, w
), blocks AS (
  SELECT doc_id, block_id, SUM(v0 + v1 + v2) AS bsum
  FROM vals GROUP BY doc_id, block_id
), med AS (
  SELECT doc_id, list_sort(list(bsum)) AS srt FROM blocks GROUP BY doc_id
), ph AS (
  SELECT b.doc_id,
    SUM(CASE WHEN b.block_id > 0 AND 2 * b.bsum > m.srt[32] + m.srt[33]
        THEN (CAST(1 AS BIGINT) << CAST(63 - b.block_id AS INT)) ELSE 0 END)
    + SUM(CASE WHEN b.block_id = 0 AND 2 * b.bsum > m.srt[32] + m.srt[33]
        THEN -9223372036854775808 ELSE 0 END) AS phash
  FROM blocks b JOIN med m USING (doc_id) GROUP BY b.doc_id
)
SELECT a.doc_id AS media_id, 'image' AS kind,
  CAST(a.h AS INT) AS height, CAST(a.w AS INT) AS width, 3 AS channels,
  CAST(s0 AS DOUBLE) / (a.h * a.w) AS mean_0,
  CAST(s1 AS DOUBLE) / (a.h * a.w) AS mean_1,
  CAST(s2 AS DOUBLE) / (a.h * a.w) AS mean_2,
  sqrt(CAST(ss0 AS DOUBLE) / (a.h * a.w)
       - (CAST(s0 AS DOUBLE) / (a.h * a.w)) * (CAST(s0 AS DOUBLE) / (a.h * a.w)))
    AS std_0,
  CAST(ph.phash AS BIGINT) AS phash
FROM agg a JOIN ph ON a.doc_id = ph.doc_id"""


def multimodal_audio_windows_oracle() -> str:
    """Mirrors _real_audio (8 kHz, (doc_id%8)*250+500 ms) decoded from real
    WAV bytes + extract_audio_features(window_ms=250): win = 2000 samples,
    all windows full by construction (durations are multiples of 250 ms)."""
    return """WITH d AS (
  SELECT doc_id, (doc_id % 8) * 250 + 500 AS duration_ms
  FROM documents ORDER BY doc_id LIMIT 200
), s AS (
  SELECT doc_id, unnest(range(0, 8 * duration_ms)) AS i FROM d
), v AS (
  SELECT doc_id, i, CAST(i // 2000 AS INT) AS win_no,
    (31 * doc_id + 7 * i) % 65536 - 32768 AS smp
  FROM s
), sg AS (
  SELECT doc_id, i, win_no, smp,
    CASE WHEN smp > 0 THEN 1 WHEN smp < 0 THEN -1 ELSE 0 END AS sgn,
    LAG(CASE WHEN smp > 0 THEN 1 WHEN smp < 0 THEN -1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY i) AS psgn
  FROM v
)
SELECT doc_id AS media_id, win_no,
  CAST(win_no * 250 AS INT) AS win_start_ms,
  sqrt(CAST(CAST(SUM(smp * smp) AS VARCHAR) AS DOUBLE) / 2000) AS rms,
  CAST(SUM(CASE WHEN i % 2000 > 0 AND abs(sgn - psgn) > 1 THEN 1 ELSE 0 END)
       AS INT) AS zero_crossings,
  MAX(abs(smp)) AS peak
FROM sg GROUP BY doc_id, win_no"""


def multimodal_frame_sample_oracle() -> str:
    """Mirrors the framepack real path: frames at 500 ms intervals, each a
    16×16 BMP from _real_image(doc_id, frame=f); the sampled frame's 8×8
    top-left crop bytes (row-major y, x, c) hashed as md5(lower-hex)."""
    return """WITH d AS (
  SELECT doc_id, (doc_id % 6) * 500 + 1000 AS duration_ms
  FROM documents ORDER BY doc_id LIMIT 200
), fr AS (
  SELECT doc_id, unnest(range(0, duration_ms // 500)) AS f FROM d
), fb AS (
  SELECT doc_id, f, unnest(range(0, 192)) AS k FROM fr
), hx AS (
  SELECT doc_id, f, k,
    printf('%02x',
      (3 * doc_id + 17 * f + (k % 3) + (k // 24) * 16 + ((k % 24) // 3)) % 256)
      AS hex2
  FROM fb
)
SELECT doc_id AS media_id, CAST(f AS INT) AS frame_no,
  CAST(f * 500 AS INT) AS frame_ms,
  md5(string_agg(hex2, '' ORDER BY k)) AS frame_md5
FROM hx GROUP BY doc_id, f"""


# ---------------------------------------------------------------------------
# PageRank: 15 fixed iterations unrolled as a CTE chain (mirrors
# plans/relational_ext6.graph_pagerank_transitions). Recursive CTEs are
# avoided on purpose: the update needs the previous iteration THREE times
# (contrib join, dangling-mass scan, full node relist), which the standard
# single-reference recursive form can't express — unrolling the fixed
# iteration count into r0..r15 CTEs keeps every reference legal and the
# arithmetic term-for-term identical to the Spark loop (same IEEE double
# divisions, damping 0.85, uniform dangling redistribution, round(.,8)).
# ---------------------------------------------------------------------------

def pagerank_oracle(iters: int = 15, damping: float = 0.85) -> str:
    base = """WITH raw AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS src
  FROM events
), e0 AS (
  SELECT src, event_type AS dst, COUNT(*) AS weight
  FROM raw WHERE src IS NOT NULL GROUP BY src, event_type
), outw AS (
  SELECT src, SUM(weight) AS out_weight FROM e0 GROUP BY src
), edges AS MATERIALIZED (
  SELECT e0.src, e0.dst,
         CAST(e0.weight AS DOUBLE) / CAST(outw.out_weight AS DOUBLE) AS prob
  FROM e0 JOIN outw USING (src)
), nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), has_out AS MATERIALIZED (
  SELECT DISTINCT src FROM edges
), r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""
    steps = []
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        steps.append(f""", dang{k} AS (
  SELECT COALESCE(SUM(r.rank), 0.0) AS d
  FROM {prev} r LEFT JOIN has_out h ON r.node = h.src
  WHERE h.src IS NULL
), r{k} AS MATERIALIZED (
  SELECT nd.node,
         {1 - damping} / (SELECT n FROM nn)
         + {damping} * (COALESCE(c.contrib, 0.0)
                        + (SELECT d FROM dang{k}) / (SELECT n FROM nn))
           AS rank
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank * e.prob) AS contrib
    FROM {prev} r JOIN edges e ON r.node = e.src
    GROUP BY e.dst
  ) c ON nd.node = c.node
)""")
    final = (
        f"\nSELECT node, round(rank, 8) AS pagerank FROM r{iters} "
        "ORDER BY pagerank DESC, node"
    )
    return base + "".join(steps) + final


def multimodal_image_resize_oracle(out: int = 32) -> str:
    """Mirrors decode -> nearest-neighbor resize (yi = y*h//out) ->
    re-encode -> second decode -> extract_image_features: the resized
    pixel (y, x, c) is the source pixel ((y*h)//out, (x*w)//out, c), so the
    whole composed pipeline is regenerable from the _real_image formula."""
    bs = out // 8
    n = out * out
    op = f"((p // {out}) * h // {out}) * w + ((p % {out}) * w // {out})"
    return f"""WITH d AS (
  SELECT doc_id, 64 + (doc_id % 3) * 8 AS h, 64 + (doc_id % 4) * 8 AS w
  FROM documents
), px AS (
  SELECT doc_id, h, w, unnest(range(0, {n})) AS p FROM d
), vals AS (
  SELECT doc_id,
    (3 * doc_id + {op}) % 256 AS v0,
    (3 * doc_id + 1 + {op}) % 256 AS v1,
    (3 * doc_id + 2 + {op}) % 256 AS v2,
    ((p // {out}) // {bs}) * 8 + ((p % {out}) // {bs}) AS block_id
  FROM px
), agg AS (
  SELECT doc_id, SUM(v0) AS s0, SUM(v1) AS s1, SUM(v2) AS s2,
         SUM(v0 * v0) AS ss0
  FROM vals GROUP BY doc_id
), blocks AS (
  SELECT doc_id, block_id, SUM(v0 + v1 + v2) AS bsum
  FROM vals GROUP BY doc_id, block_id
), med AS (
  SELECT doc_id, list_sort(list(bsum)) AS srt FROM blocks GROUP BY doc_id
), ph AS (
  SELECT b.doc_id,
    SUM(CASE WHEN b.block_id > 0 AND 2 * b.bsum > m.srt[32] + m.srt[33]
        THEN (CAST(1 AS BIGINT) << CAST(63 - b.block_id AS INT)) ELSE 0 END)
    + SUM(CASE WHEN b.block_id = 0 AND 2 * b.bsum > m.srt[32] + m.srt[33]
        THEN -9223372036854775808 ELSE 0 END) AS phash
  FROM blocks b JOIN med m USING (doc_id) GROUP BY b.doc_id
)
SELECT a.doc_id AS media_id, 'image' AS kind,
  CAST({out} AS INT) AS height, CAST({out} AS INT) AS width, 3 AS channels,
  CAST(s0 AS DOUBLE) / {n} AS mean_0,
  CAST(s1 AS DOUBLE) / {n} AS mean_1,
  CAST(s2 AS DOUBLE) / {n} AS mean_2,
  sqrt(CAST(ss0 AS DOUBLE) / {n}
       - (CAST(s0 AS DOUBLE) / {n}) * (CAST(s0 AS DOUBLE) / {n})) AS std_0,
  CAST(ph.phash AS BIGINT) AS phash
FROM agg a JOIN ph ON a.doc_id = ph.doc_id"""


def minhash_streaming_dedup_oracle(num_hashes: int = 32, bands: int = 8) -> str:
    """First-seen-wins verdict per document: dup iff ANY smaller-id
    document shares a full LSH band; dup_of = the smallest such id.
    Mirrors stream_incremental_minhash_dedup's drained final state — the
    streaming run probes a persistent band index built batch-by-batch in
    doc_id order, which yields exactly this smaller-id-mate relation."""
    return f"""WITH norm AS (
  {_NORM_CTE}
), xrows AS (
  SELECT id, unnest(list_distinct(list_transform(
    range(1, greatest(length(s) - 3, 1)),
    i -> CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 8) AS BIGINT)
  ))) % {_MINHASH_P} AS x
  FROM norm
), sig AS (
  SELECT id,
    {_sig_cols(num_hashes)}
  FROM xrows GROUP BY id
), bands AS (
  {_band_union(num_hashes, bands)}
), dup AS (
  SELECT x.id AS id, CAST(MIN(a.id) AS BIGINT) AS dup_of
  FROM bands a JOIN bands x
    ON a.band = x.band AND a.bucket = x.bucket AND a.id < x.id
  GROUP BY x.id
)
SELECT n.id AS doc_id,
       d.dup_of IS NOT NULL AS is_dup,
       d.dup_of
FROM norm n LEFT JOIN dup d ON d.id = n.id
ORDER BY doc_id"""


def minhash_dup_flag_cte(num_hashes: int = 32, bands: int = 8) -> str:
    """CTE chain ending in ``mh_dup(id)`` — the set of documents with at
    least one SMALLER-id full-band LSH mate (first-seen-wins dup flag),
    for composition into multi-stage funnels."""
    return f"""mh_xrows AS (
  SELECT id, unnest(list_distinct(list_transform(
    range(1, greatest(length(s) - 3, 1)),
    i -> CAST('0x' || substr(md5(substr(s, CAST(i AS INT), 5)), 1, 8) AS BIGINT)
  ))) % {_MINHASH_P} AS x
  FROM norm
), mh_sig AS (
  SELECT id,
    {_sig_cols(num_hashes)}
  FROM mh_xrows GROUP BY id
), mh_bands AS (
  {_band_union(num_hashes, bands).replace("FROM sig", "FROM mh_sig")}
), mh_dup AS (
  SELECT DISTINCT x.id
  FROM mh_bands a JOIN mh_bands x
    ON a.band = x.band AND a.bucket = x.bucket AND a.id < x.id
)"""
