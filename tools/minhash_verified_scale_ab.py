"""A/B the dedup_minhash_verified size-guard at a larger-than-sf0.1 corpus.

The r11 guard (prune candidate pairs on two int sizes BEFORE the shingle
arrays attach — 2*max(sz) <= 5*min(sz), implied by J >= 0.4) cut the
pair-by-array shuffle ~20% by bytes at sf0.1 but was wall-flat there.
This tool answers the r11 verdict's item 8: does the byte cut convert to
wall once the corpus is big enough that the verify joins dominate?

Corpus: tools/dedup_scale_smoke's controlled-duplicate-rate generator
(realistic token skew, duplicate count linear in docs — NOT the 8x
replication smoke, which manufactures quadratic pair growth). Variant B
is a local copy of the query with the guard removed (r10 shape); the
registered query is untouched.

Usage: python tools/minhash_verified_scale_ab.py [n_docs] [repeats]
Defaults: 48000 docs, 2 timed noop-sink runs per variant (min reported).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark import get_spark
from news_ingestion_data_pipeline_spark.plans import REGISTRY
from news_ingestion_data_pipeline_spark.plans import llm as L
from tools.dedup_scale_smoke import SEED, make_corpus, write_tables

OUT = "/tmp/spark_graft_mhv_ab"


def unguarded(spark, sf_dir):
    """dedup_minhash_verified without the r11 size guard (r10 shape)."""
    from news_ingestion_data_pipeline_spark.tables import spread

    docs = L.t(spark, sf_dir, "documents")
    hashed = F.array_distinct(
        F.transform(
            L.TX.char_ngrams(F.col("text"), 5),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    sh = spread(docs).select(
        F.col("doc_id"), hashed.alias("shingles"), F.size(hashed).alias("sz")
    ).localCheckpoint()
    exploded = sh.select(
        F.col("doc_id").alias("id"), F.explode("shingles").alias("shingle_hash")
    )
    sigs = L.DD.minhash_signatures_from_hashes(exploded, num_hashes=32)
    cands = L.DD.lsh_band_pairs(sigs, num_hashes=32, bands=8)
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
    return (
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


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 48000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    d = os.path.join(OUT, f"x{n_docs}")
    if not os.path.isdir(d):
        shutil.rmtree(OUT, ignore_errors=True)
        texts, base_of = make_corpus(n_docs, 0.10, SEED)
        write_tables(d, texts, base_of, SEED)

    spark = get_spark("mhv_scale_ab")
    REGISTRY["dedup_exact_rows"].fn(spark, d).count()  # JVM/codegen warmup

    def timed(build) -> float:
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(repeats):
            s0, t0 = _steal(), time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(f"    run {dt:.2f}s steal={(_steal()-s0)/100:.1f}s", flush=True)
            best = min(best, dt)
        return best

    # row-identity check before timing: the guard must not change results
    ga = REGISTRY["dedup_minhash_verified"].fn(spark, d)
    gb = unguarded(spark, d)
    na, nb = ga.count(), gb.count()
    diff = ga.exceptAll(gb).count() + gb.exceptAll(ga).count()
    print(f"rows guarded={na} unguarded={nb} symmetric-diff={diff}", flush=True)
    assert na == nb and diff == 0, "variants disagree — abort"

    variants = [
        ("guarded", lambda: REGISTRY["dedup_minhash_verified"].fn(spark, d)),
        ("unguarded", lambda: unguarded(spark, d)),
    ]
    if "rev" in sys.argv[3:]:  # flip order to control for JIT/weather bias
        variants.reverse()
    res = {}
    for label, build in variants:
        print(f"-- {label} @ {n_docs} docs --", flush=True)
        res[label] = timed(build)
    a, b = res["guarded"], res["unguarded"]
    print(f"\nguarded min={a:.2f}s  unguarded min={b:.2f}s  "
          f"speedup={b / a:.2f}x", flush=True)


if __name__ == "__main__":
    main()
