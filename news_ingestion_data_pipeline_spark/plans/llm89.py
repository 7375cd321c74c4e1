"""Eighty-ninth wave: crawl-URL canonicalization dedup and
source-diverse contrastive batch construction.

Two curation stages every production LLM crawl pipeline runs that the
registry didn't cover yet: URL-level dedup (the cheapest dedup of all —
kill refetches of the same page BEFORE content hashing; CommonCrawl-style
pipelines canonicalize scheme/host case, default ports, trailing
slashes, and tracking parameters first) and contrastive-training batch
assembly (round-robin over per-source ranks so every batch carries at
most one document per source — in-batch negatives are only informative
when they're NOT near-duplicates from the same site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans import oracle_sqlgen as OSQL
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

#: deterministic raw-URL synthesis — doc_id residues inject the classic
#: crawl noise: %2 upper-cases the host, %3 appends an explicit default
#: port, %5 adds a trailing slash, %3==1 appends utm tracking params,
#: %7==0 appends a MEANINGFUL page param that canonicalization must keep
_RAW_URL_SQL = """
  'https://'
  || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
  || '.Example.COM'
  || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
  || '/docs/' || CAST(doc_id % 50 AS VARCHAR)
  || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
  || CASE WHEN doc_id % 3 = 1 THEN '?utm_source=feed&utm_campaign=c'
          WHEN doc_id % 7 = 0 THEN '?page=' || CAST(doc_id % 4 AS VARCHAR)
          ELSE '' END
"""


@register(
    "dedup_url_canonical",
    oracle=f"""
WITH raw AS (
  SELECT doc_id, {_RAW_URL_SQL} AS raw_url FROM documents
), canon AS (
  SELECT doc_id, raw_url,
         'https://'
         || regexp_replace(
              lower(regexp_extract(raw_url, '^https://([^/?]+)', 1)),
              ':443$', '')
         || rtrim(regexp_extract(raw_url, '^https://[^/?]+(/[^?]*)', 1), '/')
         || CASE WHEN regexp_extract(raw_url, '[?&]page=([^&]*)', 1) <> ''
                 THEN '?page=' || regexp_extract(raw_url, '[?&]page=([^&]*)', 1)
                 ELSE '' END AS canonical_url
  FROM raw
)
SELECT canonical_url,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_variants
FROM canon
GROUP BY canonical_url
ORDER BY canonical_url
""",
    description="URL-canonicalization dedup — the cheapest dedup stage in "
    "a crawl pipeline, run BEFORE any content hashing: lowercase the "
    "host, strip the explicit default port (:443), strip the trailing "
    "slash, drop tracking parameters (utm_*) while KEEPING meaningful "
    "ones (page=...), then keep the first doc_id per canonical URL. Raw "
    "URLs are synthesized deterministically with all four noise classes "
    "injected by doc_id residue. Pure map-side string expressions "
    "(parse_url/regexp inside WholeStageCodegen) + one hash aggregate on "
    "the canonical key — at 100 TB this is exactly the shape of exact "
    "dedup: no skew risk beyond genuinely popular pages, which AQE "
    "handles, and the aggregate is map-side combinable.",
    tags=("dedup", "curation", "url"),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    raw = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 1, F.lit("?utm_source=feed&utm_campaign=c")
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("?page="), (F.col("doc_id") % 4).cast("string")),
        )
        .otherwise(F.lit("")),
    )
    u = d.select("doc_id", raw.alias("raw_url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("raw_url", r"^https://([^/?]+)", 1)),
        r":443$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract("raw_url", r"^https://[^/?]+(/[^?]*)", 1), r"/+$", ""
    )
    page = F.regexp_extract("raw_url", r"[?&]page=([^&]*)", 1)
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(page != "", F.concat(F.lit("?page="), page)).otherwise(
            F.lit("")
        ),
    )
    return (
        u.select("doc_id", "raw_url", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("raw_url").cast("bigint").alias("n_raw_variants"),
        )
        
    )


@register(
    "curation_contrastive_batches",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
)
SELECT CAST(rn - 1 AS BIGINT) AS batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM ranked
GROUP BY rn - 1
ORDER BY batch_id
""",
    description="Contrastive-training batch assembly with guaranteed "
    "in-batch negative diversity: rank documents within each source by "
    "(n_chars DESC, doc_id) and assign batch_id = rank - 1, so batch b "
    "holds the b-th best document OF EACH source — by construction no "
    "batch ever contains two documents from the same site, which is the "
    "property that keeps in-batch negatives from being accidental "
    "near-duplicates (n_docs == n_sources in every output row IS that "
    "proof, hash-checked against the oracle). The per-source window's "
    "parallelism equals the source count; a giant/skewed source at "
    "100 TB uses the same two-pass bucket-rank decomposition shipped in "
    "operators/ranking.py (coarse n_chars range buckets per source).",
    tags=("curation", "llm", "sampling"),
)
def curation_contrastive_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    ranked = d.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy((F.col("rn") - 1).cast("bigint").alias("batch_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        
    )


_ROOT = scratch_root("llm89")


def _sfx(sf_dir: str) -> str:
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "pipeline_upsert_partition_pruned",
    oracle="""
WITH v1 AS (
  SELECT doc_id, lang, 'old' AS version FROM documents
), updates AS (
  SELECT doc_id, lang, 'new' AS version FROM documents
  WHERE lang = 'en' AND doc_id % 2 = 0
), merged AS (
  SELECT doc_id, lang, version FROM updates
  UNION ALL
  SELECT doc_id, lang, version FROM v1
  WHERE doc_id NOT IN (SELECT doc_id FROM updates)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN version = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       (lang = 'en') AS rewritten
FROM merged
GROUP BY lang
ORDER BY lang
""",
    description="Partition-pruned MERGE (operators/upsert.py "
    "upsert_partitioned — the Delta/Iceberg file-pruning story the flat "
    "emulation's full rewrite stands in for): seed a lang-partitioned "
    "table from all documents, then MERGE a batch touching ONLY lang = "
    "'en'. The `rewritten` column is OBSERVED from the filesystem — true "
    "iff that partition's owning snapshot pointer changed across the "
    "commit — while the oracle asserts it must equal (lang = 'en'); an "
    "implementation that rewrote (or even re-pointed) any other "
    "partition hash-fails. Row fingerprints certify merge semantics per "
    "partition. At 100 TB this is the difference between a MERGE that "
    "scans/writes one day's partition and one that rewrites the table.",
    tags=("pipeline", "storage", "upsert"),
)
def pipeline_upsert_partition_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import upsert as UP

    path = f"{_ROOT}/partpruned_{_sfx(sf_dir)}"
    UP.drop_table(path)
    docs = t(spark, sf_dir, "documents")
    v1 = docs.select(
        F.col("doc_id").alias("Article_id"),
        "lang",
        F.lit("old").alias("version"),
    )
    updates = docs.filter(
        (F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)
    ).select(
        F.col("doc_id").alias("Article_id"),
        "lang",
        F.lit("new").alias("version"),
    )
    UP.upsert_partitioned(spark, path, v1, "lang")
    m1 = UP._read_pmanifest(path)["parts"]
    UP.upsert_partitioned(spark, path, updates, "lang")
    m2 = UP._read_pmanifest(path)["parts"]
    moved = {p for p in m2 if m1.get(p) != m2[p]}
    cur = UP.read_partitioned(spark, path)
    moved_lit = F.array(*[F.lit(p) for p in sorted(moved)])
    return (
        cur.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum((F.col("version") == "new").cast("bigint"))
            .cast("bigint")
            .alias("n_new"),
            F.sum("Article_id").cast("bigint").alias("sum_ids"),
        )
        .withColumn("rewritten", F.array_contains(moved_lit, F.col("lang")))
        .select("lang", "n_rows", "n_new", "sum_ids", "rewritten")
        
    )


@register(
    "stream_incremental_minhash_dedup",
    oracle=OSQL.minhash_streaming_dedup_oracle(),
    description="Streaming incremental MinHash-LSH dedup — the production "
    "continuous-ingestion shape, end to end: documents are re-laid as 4 "
    "doc_id-ordered files streamed one per micro-batch (AvailableNow); "
    "each batch signs ONLY its own documents (32 perms, 8 bands), probes "
    "the PERSISTENT band-entry index built by the earlier batches "
    "(equi-join on (band, bucket), never index-vs-index), emits a "
    "first-seen-wins verdict (dup_of = smallest band-mate id), and "
    "appends its entries to the index. The drained verdict table "
    "hash-matches the generated whole-corpus SQL oracle — proving four "
    "real incremental probe-and-append commits reproduce the batch "
    "answer exactly. At 100 TB the index is the (band, bucket)-"
    "partitioned table dedup.band_entry_table documents, and each "
    "micro-batch's join cost is O(batch x bands) probe-side lookups, "
    "independent of corpus size.",
    tags=("streaming", "dedup", "llm"),
)
def stream_incremental_minhash_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob
    import os
    import shutil

    from news_ingestion_data_pipeline_spark.operators import dedup as DD

    sfx = _sfx(sf_dir)
    src = f"{_ROOT}/docs_4files_{sfx}"
    index = f"{_ROOT}/mh_index_{sfx}"
    verd = f"{_ROOT}/mh_verdicts_{sfx}"
    for p in (src, index, verd):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(src)

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    # 4 id-ordered quartile files with ascending mtimes: FileStreamSource
    # orders by (modTime, path), so batch k holds the k-th id quartile
    # and every smaller doc_id is in the same or an earlier batch — the
    # invariant that makes the incremental verdicts equal the batch
    # answer. (ntile window = driver-side prep of a test harness, not
    # the measured operator.)
    q = docs.withColumn("q", F.ntile(4).over(Window.orderBy("doc_id")))
    base_t = 1_700_000_000
    for k in range(1, 5):
        tmp = f"{src}/_tmp{k}"
        q.filter(F.col("q") == k).drop("q").coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        tgt = f"{src}/{k:02d}.parquet"
        shutil.move(part, tgt)
        shutil.rmtree(tmp)
        os.utime(tgt, (base_t + k, base_t + k))

    def probe_and_append(batch: DataFrame, _bid: int) -> None:
        s = batch.sparkSession
        sigs = DD.minhash_signatures(batch, id_col="doc_id", text_col="text")
        entries = DD.band_entry_table(sigs, num_hashes=32, bands=8)
        x, a = entries.alias("x"), entries.alias("a")
        same = (
            (F.col("a.band") == F.col("x.band"))
            & (F.col("a.bucket") == F.col("x.bucket"))
            & (F.col("a.id") < F.col("x.id"))
        )
        cands = x.join(a, same).select(
            F.col("x.id").alias("id"), F.col("a.id").alias("mate")
        )
        if os.path.exists(index):
            idx = s.read.parquet(index).alias("a")
            cands = cands.unionByName(
                x.join(idx, same).select(
                    F.col("x.id").alias("id"), F.col("a.id").alias("mate")
                )
            )
        dup = cands.groupBy("id").agg(F.min("mate").alias("dup_of"))
        (
            batch.select("doc_id")
            .join(dup, batch["doc_id"] == dup["id"], "left")
            .select("doc_id", "dup_of")
            .write.mode("append")
            .parquet(verd)
        )
        entries.write.mode("append").parquet(index)

    name = f"stream_mhdedup_{sfx}"
    for qq in spark.streams.active:
        if qq.name == name:
            qq.stop()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(probe_and_append)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    stream.stop()
    return (
        spark.read.parquet(verd)
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.col("dup_of").cast("bigint").alias("dup_of"),
        )
        
    )


@register(
    "stream_minhash_dedup_late_data",
    oracle=OSQL.minhash_streaming_dedup_oracle(),
    description="Out-of-order (late-data) variant of "
    "stream_incremental_minhash_dedup: the four quartile files are "
    "streamed in REVERSE id order, so most of a document's smaller-id "
    "band-mates arrive AFTER it. Each micro-batch therefore probes both "
    "directions — new-vs-index for smaller-id mates already seen AND "
    "index-vs-new for already-seen docs whose smaller-id mate just "
    "arrived late (the reconciliation a watermark-correction sink "
    "performs) — appending candidate-pair facts; the drain-time "
    "aggregate min(mate) yields verdicts IDENTICAL to the in-order run "
    "and to the whole-corpus oracle, proving arrival-order independence. "
    "Every pair (a < x) is discovered exactly once-or-more: by x's "
    "forward probe if a arrived first, by a's reverse probe if x did, "
    "by the in-batch self-join if together — so no late arrival is ever "
    "lost, without ever joining index-vs-index.",
    tags=("streaming", "dedup", "llm"),
)
def stream_minhash_dedup_late_data(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob
    import os
    import shutil

    from news_ingestion_data_pipeline_spark.operators import dedup as DD

    sfx = _sfx(sf_dir)
    src = f"{_ROOT}/docs_rev4_{sfx}"
    index = f"{_ROOT}/mhl_index_{sfx}"
    pairs = f"{_ROOT}/mhl_pairs_{sfx}"
    for p in (src, index, pairs):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(src)

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    q = docs.withColumn("q", F.ntile(4).over(Window.orderBy("doc_id")))
    base_t = 1_700_000_000
    for k in range(1, 5):
        tmp = f"{src}/_tmp{k}"
        q.filter(F.col("q") == k).drop("q").coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        # reversed mtimes AND reversed names: quartile 4 streams first
        tgt = f"{src}/{5 - k:02d}.parquet"
        shutil.move(part, tgt)
        shutil.rmtree(tmp)
        os.utime(tgt, (base_t + 5 - k, base_t + 5 - k))

    def probe_both_ways(batch: DataFrame, _bid: int) -> None:
        s = batch.sparkSession
        sigs = DD.minhash_signatures(batch, id_col="doc_id", text_col="text")
        entries = DD.band_entry_table(sigs, num_hashes=32, bands=8)
        x, a = entries.alias("x"), entries.alias("a")
        same = (
            (F.col("a.band") == F.col("x.band"))
            & (F.col("a.bucket") == F.col("x.bucket"))
            & (F.col("a.id") < F.col("x.id"))
        )
        found = x.join(a, same).select(
            F.col("x.id").alias("id"), F.col("a.id").alias("mate")
        )
        if os.path.exists(index):
            idx = s.read.parquet(index)
            # forward: new docs vs earlier-arrived smaller ids
            fwd = entries.alias("x").join(idx.alias("a"), same).select(
                F.col("x.id").alias("id"), F.col("a.id").alias("mate")
            )
            # reverse: earlier-arrived docs whose smaller-id mate is LATE
            rev = idx.alias("x").join(entries.alias("a"), same).select(
                F.col("x.id").alias("id"), F.col("a.id").alias("mate")
            )
            found = found.unionByName(fwd).unionByName(rev)
        found.write.mode("append").parquet(pairs)
        entries.write.mode("append").parquet(index)

    name = f"stream_mhlate_{sfx}"
    for qq in spark.streams.active:
        if qq.name == name:
            qq.stop()
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(probe_both_ways)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination()
    stream.stop()

    found = (
        spark.read.parquet(pairs)
        if glob.glob(f"{pairs}/*.parquet")
        else spark.createDataFrame([], "id long, mate long")
    )
    dup = found.groupBy("id").agg(F.min("mate").alias("dup_of"))
    return (
        docs.select("doc_id")
        .join(dup, docs["doc_id"] == dup["id"], "left")
        .select(
            "doc_id",
            F.col("dup_of").isNotNull().alias("is_dup"),
            F.col("dup_of").cast("bigint").alias("dup_of"),
        )
        
    )


_CANON_SQL = """'https://'
         || regexp_replace(
              lower(regexp_extract(raw_url, '^https://([^/?]+)', 1)),
              ':443$', '')
         || rtrim(regexp_extract(raw_url, '^https://[^/?]+(/[^?]*)', 1), '/')
         || CASE WHEN regexp_extract(raw_url, '[?&]page=([^&]*)', 1) <> ''
                 THEN '?page=' || regexp_extract(raw_url, '[?&]page=([^&]*)', 1)
                 ELSE '' END"""


def _dedup_funnel_oracle() -> str:
    from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM

    return f"""WITH norm AS (
  SELECT doc_id AS id, {SQL_NORM.format(col='text')} AS s FROM documents
), raw AS (
  SELECT doc_id, {_RAW_URL_SQL} AS raw_url FROM documents
), canon AS (
  SELECT doc_id, {_CANON_SQL} AS cu FROM raw
), url_dup AS (
  SELECT c.doc_id AS id
  FROM canon c JOIN (SELECT cu, MIN(doc_id) AS m FROM canon GROUP BY cu) g
    ON c.cu = g.cu AND c.doc_id > g.m
), exact_dup AS (
  SELECT n.id
  FROM norm n JOIN (SELECT md5(s) AS k, MIN(id) AS m FROM norm GROUP BY 1) g
    ON md5(n.s) = g.k AND n.id > g.m
), {OSQL.minhash_dup_flag_cte()},
labeled AS (
  SELECT n.id,
         CASE WHEN n.id IN (SELECT id FROM url_dup) THEN '1_url'
              WHEN n.id IN (SELECT id FROM exact_dup) THEN '2_exact'
              WHEN n.id IN (SELECT id FROM mh_dup) THEN '3_near'
              ELSE '4_kept' END AS stage
  FROM norm n
)
SELECT stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM labeled), 4) AS pct
FROM labeled GROUP BY stage ORDER BY stage"""


@register(
    "curation_dedup_funnel",
    oracle=_dedup_funnel_oracle(),
    description="The multi-stage dedup funnel every training-data report "
    "leads with: URL-canonical dedup (cheapest, no content reads) -> "
    "exact content dedup (md5 of normalized text) -> MinHash-LSH "
    "near-dedup (32 perms, 8 bands), each doc labeled with the FIRST "
    "stage that would drop it (smaller-id winner per group / band-mate), "
    "aggregated to per-stage drop counts and percentages. Stage flags "
    "are each one hash-aggregate or banded equi-join over the corpus — "
    "the cascade is label arithmetic, not repeated filtering, so the "
    "whole funnel costs one pass per stage at 100 TB and the cheap "
    "stages' labels are not recomputed by the expensive ones.",
    tags=("curation", "dedup", "llm"),
)
def curation_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import text as TX
    from news_ingestion_data_pipeline_spark.operators import dedup as DD

    docs = t(spark, sf_dir, "documents")
    total = docs.count()

    d = docs.select("doc_id", "source", "text")
    raw = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 1, F.lit("?utm_source=feed&utm_campaign=c")
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit("?page="), (F.col("doc_id") % 4).cast("string")),
        )
        .otherwise(F.lit("")),
    )
    u = d.select("doc_id", raw.alias("raw_url"), "text")
    host = F.regexp_replace(
        F.lower(F.regexp_extract("raw_url", r"^https://([^/?]+)", 1)),
        r":443$",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract("raw_url", r"^https://[^/?]+(/[^?]*)", 1), r"/+$", ""
    )
    page = F.regexp_extract("raw_url", r"[?&]page=([^&]*)", 1)
    canonical = F.concat(
        F.lit("https://"),
        host,
        path,
        F.when(page != "", F.concat(F.lit("?page="), page)).otherwise(
            F.lit("")
        ),
    )
    wu = Window.partitionBy("cu")
    wx = Window.partitionBy("k")
    flagged = (
        u.select(
            "doc_id",
            canonical.alias("cu"),
            F.md5(TX.normalize_text(F.col("text"))).alias("k"),
        )
        .withColumn("url_dup", F.col("doc_id") > F.min("doc_id").over(wu))
        .withColumn("exact_dup", F.col("doc_id") > F.min("doc_id").over(wx))
    )
    near_ids = (
        DD.minhash_lsh_pairs(docs, num_hashes=32, bands=8)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    labeled = flagged.join(near_ids, "doc_id", "left").select(
        F.when(F.col("url_dup"), "1_url")
        .when(F.col("exact_dup"), "2_exact")
        .when(F.col("near_dup").isNotNull(), "3_near")
        .otherwise("4_kept")
        .alias("stage")
    )
    return (
        labeled.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "pct",
            F.round(F.col("n_docs") * F.lit(100.0) / F.lit(total), 4),
        )
        
    )
