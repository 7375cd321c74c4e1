"""Honest dedup scaling evidence: a controlled-duplicate-rate corpus.

The 8x-replication smoke (tools/scale_smoke.py) is the WRONG instrument
for dedup operators — replicating documents manufactures an
every-doc-has-8-near-dups corpus, i.e. a duplicate explosion, so the
candidate-pair count grows quadratically by construction and says nothing
about the plan. This tool instead *generates* synthetic corpora at 1x and
Kx document counts with the SAME duplicate rate and the same vocabulary
richness, so a well-bucketed near-dup plan should scale ~linearly in docs
(candidate pairs grow with dup_rate * docs, not docs^2).

Corpus model (all deterministic from SEED):
  * 20000-word vocabulary of random 3-9 letter strings, sampled with a
    flattened Zipf weight (rank+5)^-0.7 — realistic token skew AND
    realistic background inter-document similarity. (A harsher 1/rank
    over a small vocab inflates background shingle overlap far above real
    text, which floods LSH bands with random collisions and turns the
    measurement into a corpus artifact — the same failure mode as the
    sf-fixture's ~30-word vocabulary that manufactured ~150k candidates.)
  * base docs: 80-250 tokens;
  * dup_rate of all docs are near-dups of a uniformly chosen earlier base
    doc: each token independently mutated with prob 0.04, then a 3%-length
    random suffix appended — Jaccard-similar but not identical;
  * embeddings mirror the same structure: unit vectors, with each dup's
    vector = its base + N(0, 0.02) noise, renormalized.

Usage: python tools/dedup_scale_smoke.py [n_base] [factor] [dup_rate]
Defaults: 4000 docs, 4x, 0.10. Prints per-query seconds at 1x and Kx and
the ratio; the PLANS.md dedup-scaling table is refreshed from this output.
"""

from __future__ import annotations

import os
import random
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY

SEED = 0x5EED
OUT = "/tmp/spark_graft_dedup_scale"
DIM = 64  # embeddings fixture dimensionality

QUERIES = [
    "dedup_exact_rows",
    "text_simhash",
    "dedup_simhash_hamming",
    "dedup_minhash_candidates",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "dedup_connected_clusters",
    "dedup_embedding_neardup",
    "dedup_containment_anchored",
    "dedup_incremental_minhash",
    # sim_semdedup is deliberately absent: its registered form fixes 8
    # seeded centroids (right for the 500-vector fixture), so within-cell
    # pairwise work grows ~quadratically here BY PARAMETERIZATION — the
    # operator's scale contract is cells ∝ n (SemDeDup uses tens of
    # thousands of clusters), which the fixture-scale query can't show.
    "sim_gemm_topk",
    "sim_quantized_topk",
    "curation_span_dedup",
    "text_oov_rate",
    "text_term_burstiness",
    "text_kneser_ney_bigram",
]

LANGS = ["en", "en", "en", "de", "es", "fr", "zh"]


def make_corpus(n_docs: int, dup_rate: float, seed: int):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(3, 9)))
        for _ in range(20000)
    ]
    weights = [(r + 5) ** -0.7 for r in range(len(vocab))]
    texts: list[str] = []
    base_of: list[int] = []  # -1 for base docs, else index of the original
    for i in range(n_docs):
        if i > 0 and rng.random() < dup_rate:
            j = rng.randrange(i)
            toks = texts[j].split()
            toks = [
                (rng.choices(vocab, weights)[0] if rng.random() < 0.04 else tk)
                for tk in toks
            ]
            toks += rng.choices(vocab, weights, k=max(1, len(toks) // 33))
            texts.append(" ".join(toks))
            base_of.append(j)
        else:
            n_tok = rng.randint(80, 250)
            texts.append(" ".join(rng.choices(vocab, weights, k=n_tok)))
            base_of.append(-1)
    return texts, base_of


def write_tables(dir_: str, texts, base_of, seed: int) -> None:
    os.makedirs(dir_, exist_ok=True)
    n = len(texts)
    rng = random.Random(seed ^ 0xE)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[i % len(LANGS)] for i in range(n)]),
            "source": pa.array([f"src{i % 7}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(dir_, "documents.parquet"))
    npr = np.random.default_rng(seed)
    vecs = npr.standard_normal((n, DIM)).astype(np.float32)
    for i, j in enumerate(base_of):
        if j >= 0:
            vecs[i] = vecs[j] + npr.standard_normal(DIM).astype(np.float32) * 0.02
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([rng.randrange(8) for _ in range(n)], pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(dir_, "embeddings.parquet"))


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        t0 = time.time()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        out[name] = time.time() - t0
        print(f"  {name}: {out[name]:.2f}s ({n} rows)", flush=True)
    return out


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dup_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.10
    shutil.rmtree(OUT, ignore_errors=True)
    d1 = os.path.join(OUT, "x1")
    dk = os.path.join(OUT, f"x{factor}")
    t, b = make_corpus(n_base, dup_rate, SEED)
    write_tables(d1, t, b, SEED)
    t, b = make_corpus(n_base * factor, dup_rate, SEED)
    write_tables(dk, t, b, SEED)

    spark = get_spark("dedup_scale_smoke")
    # warmup: first job pays JVM/codegen startup; keep it out of the 1x column
    REGISTRY["dedup_exact_rows"].fn(spark, d1).count()
    print(f"-- 1x ({n_base} docs, dup_rate={dup_rate}) --", flush=True)
    t1 = run_suite(spark, d1)
    print(f"-- {factor}x ({n_base * factor} docs) --", flush=True)
    tk = run_suite(spark, dk)
    print(f"\n{'query':32s} {'1x':>7s} {factor}x{'':>4s} ratio  (linear == {factor}.0)")
    for name in QUERIES:
        r = tk[name] / t1[name] if t1[name] > 0 else float("inf")
        print(f"{name:32s} {t1[name]:6.2f}s {tk[name]:6.2f}s {r:5.1f}x")


if __name__ == "__main__":
    main()
