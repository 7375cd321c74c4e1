"""Hundred-sixtieth wave: KMV intersection estimation and hybrid
lexical+dense retrieval fusion.

  * agg_kmv_intersection — set-INTERSECTION cardinality from two
    bottom-k sketches (the audience-overlap question answered without
    touching raw data twice): Jaccard is estimated from the k smallest
    hashes of the union (rho = fraction of the merged sketch present in
    BOTH sides), |A∩B| ~= rho x |A∪B|_kmv. Same seedless md5 hashing
    as the agg_kmv_* family, so the oracle replays the sketch
    bit-for-bit, with exact counts riding along as the baseline.
  * sim_hybrid_rrf_retrieval — more-like-this retrieval fusing a DENSE
    ranker (exact cosine over the embedding column) with a LEXICAL
    ranker (character-5-gram overlap count on the documents' text,
    doc_id = vec_id) via reciprocal-rank fusion — the hybrid-retrieval
    combiner production search stacks use because ranks need no score
    calibration across modalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.functions import text as TX
from news_ingestion_data_pipeline_spark.plans.llm import _SQL_COS
from news_ingestion_data_pipeline_spark.plans.llm50 import (
    _h01,
    _sql_h01,
)
from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.plans.pipeline import SQL_NORM

_KI_K = 32
_KI_A, _KI_B = "click", "view"


@register(
    "agg_kmv_intersection",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT event_type,
         CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d') AS k
  FROM events WHERE event_type IN ('{_KI_A}', '{_KI_B}')
), hashed AS (
  SELECT event_type, k, {_sql_h01('k')} AS h FROM keys
), sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) WHERE rn <= {_KI_K}
), merged AS (
  SELECT h, rn FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE rn <= {_KI_K}
), stats AS (
  SELECT (SELECT COUNT(*) FROM merged) AS m_in,
         (SELECT MAX(h) FROM merged) AS h_k,
         (SELECT COUNT(*) FROM merged
          WHERE h IN (SELECT h FROM sk WHERE event_type = '{_KI_A}')
            AND h IN (SELECT h FROM sk WHERE event_type = '{_KI_B}'))
           AS m_both
), exact AS (
  SELECT
    (SELECT COUNT(*) FROM keys WHERE event_type = '{_KI_A}') AS n_a,
    (SELECT COUNT(*) FROM keys WHERE event_type = '{_KI_B}') AS n_b,
    (SELECT COUNT(*) FROM
      (SELECT k FROM keys WHERE event_type = '{_KI_A}'
       INTERSECT
       SELECT k FROM keys WHERE event_type = '{_KI_B}')) AS n_inter
)
SELECT CAST(exact.n_a AS BIGINT) AS exact_a,
       CAST(exact.n_b AS BIGINT) AS exact_b,
       CAST(exact.n_inter AS BIGINT) AS exact_intersection,
       round(stats.m_both * 1.0 / stats.m_in, 4) AS jaccard_est,
       round((stats.m_both * 1.0 / stats.m_in) *
             (CASE WHEN stats.m_in < {_KI_K}
                   THEN CAST(stats.m_in AS DOUBLE)
                   ELSE ({_KI_K} - 1) / stats.h_k END), 4)
         AS intersection_est
FROM stats CROSS JOIN exact
""",
    description="KMV set-intersection estimate (audience overlap) from "
    f"two bottom-{_KI_K} sketches over '{_KI_A}' and '{_KI_B}' user-days: "
    "merge the sketches, keep the k smallest union hashes, and the "
    "fraction present in BOTH sides estimates Jaccard; multiplied by the "
    "merged-sketch union estimate (k-1)/h_(k) it yields |A INTERSECT B| "
    "— the Bar-Yossef/Beyer K-minimum-values algebra that lets 100 TB of "
    "per-partition sketches answer overlap questions without a second "
    "pass over raw data. Seedless md5 hashing = the oracle replays every "
    "sketch member; exact counts ride along as the error baseline.",
    tags=("agg", "sketch", "approx"),
)
def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KI_A, _KI_B))
        .select(
            "event_type",
            F.concat(
                F.col("user_id").cast("string"),
                F.lit("@"),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("k"),
        )
        .distinct()
    )

    # Per-type bottom-k via orderBy().limit() = TakeOrderedAndProject:
    # every partition keeps its local k smallest hashes and the driver
    # merges k*P numbers — no global sort of the SF-proportional distinct
    # user-day domain (the former 2-partition row_number window capped
    # parallelism at the number of event types regardless of cluster
    # size). The event_type filter sits on a grouping column, so Catalyst
    # pushes it below the distinct and down to the parquet scan.
    def _bottomk(typ: str) -> DataFrame:
        return (
            keys.filter(F.col("event_type") == typ)
            .select(_h01(F.col("k")).alias("h"))
            .orderBy("h")
            .limit(_KI_K)
        )

    a_set = _bottomk(_KI_A)
    b_set = _bottomk(_KI_B)
    # The merged union sketch is bottom-k over at most 2k rows — again
    # TakeOrderedAndProject, never a windowed global sort.
    merged = (
        a_set.unionByName(b_set)
        .distinct()
        .orderBy("h")
        .limit(_KI_K)
        .select("h")
    )
    both = (
        merged.join(a_set, "h", "left_semi")
        .join(
            b_set.select(F.col("h").alias("h_b")),
            F.col("h") == F.col("h_b"),
            "left_semi",
        )
    )
    stats = merged.agg(
        F.count(F.lit(1)).alias("m_in"), F.max("h").alias("h_k")
    ).crossJoin(both.agg(F.count(F.lit(1)).alias("m_both")))
    exact = keys.agg(
        F.sum(F.when(F.col("event_type") == _KI_A, 1).otherwise(0)).alias(
            "n_a"
        ),
        F.sum(F.when(F.col("event_type") == _KI_B, 1).otherwise(0)).alias(
            "n_b"
        ),
    ).crossJoin(
        keys.groupBy("k")
        .agg(F.countDistinct("event_type").alias("nt"))
        .filter(F.col("nt") == 2)
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    u_est = F.when(
        F.col("m_in") < _KI_K, F.col("m_in").cast("double")
    ).otherwise(F.lit(float(_KI_K - 1)) / F.col("h_k"))
    jac = F.col("m_both") * F.lit(1.0) / F.col("m_in")
    return stats.crossJoin(exact).select(
        F.col("n_a").cast("bigint").alias("exact_a"),
        F.col("n_b").cast("bigint").alias("exact_b"),
        F.col("n_inter").cast("bigint").alias("exact_intersection"),
        F.round(jac, 4).alias("jaccard_est"),
        F.round(jac * u_est, 4).alias("intersection_est"),
    )


_HY_K = 60  # RRF constant
_HY_NQ = 5  # queries: doc_id < 5
_HY_TOP = 10

_SQL_SHINGLE_SET = (
    "list_distinct(list_transform("
    "range(1, length({s}) - 3), "
    "i -> substr({s}, CAST(i AS INT), 5)))"
)


@register(
    "sim_hybrid_rrf_retrieval",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), dense AS (
  SELECT qid, cand, ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY cos DESC, cand) AS drank
  FROM (
    SELECT q.vec_id AS qid, a.vec_id AS cand, {_SQL_COS} AS cos
    FROM e a CROSS JOIN e q
    WHERE q.vec_id < {_HY_NQ} AND a.vec_id <> q.vec_id
  ) sub
), docs_n AS (
  SELECT doc_id, {SQL_NORM.format(col='text')} AS s FROM documents
), sh AS (
  SELECT doc_id, {_SQL_SHINGLE_SET.format(s='s')} AS sg FROM docs_n
), lex AS (
  SELECT q.doc_id AS qid, c.doc_id AS cand,
         ROW_NUMBER() OVER (PARTITION BY q.doc_id
           ORDER BY len(list_intersect(q.sg, c.sg)) DESC, c.doc_id)
           AS lrank
  FROM sh q JOIN sh c ON c.doc_id <> q.doc_id
  WHERE q.doc_id < {_HY_NQ}
), fused AS (
  SELECT COALESCE(d.qid, l.qid) AS query_id,
         COALESCE(d.cand, l.cand) AS doc_id,
         round(COALESCE(1.0 / ({_HY_K} + d.drank), 0)
             + COALESCE(1.0 / ({_HY_K} + l.lrank), 0), 9) AS rrf
  FROM dense d FULL JOIN lex l ON d.qid = l.qid AND d.cand = l.cand
)
SELECT query_id, doc_id, rrf,
       CAST(rnk AS BIGINT) AS fused_rank
FROM (
  SELECT query_id, doc_id, rrf,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id) AS rnk
  FROM fused
) WHERE rnk <= {_HY_TOP}
""",
    description="Hybrid retrieval: per query document (doc_id = vec_id "
    f"< {_HY_NQ}), a DENSE ranking (exact cosine over the embedding "
    "column) and a LEXICAL ranking (distinct character-5-gram overlap "
    "count on normalized text) are fused by reciprocal-rank fusion "
    f"1/({_HY_K}+rank) — the combiner real search stacks use because "
    "ranks compose without cross-modality score calibration; top-"
    f"{_HY_TOP} per query by fused score. Scale shape: the dense side "
    "is the brute-force baseline (GEMM/LSH variants are the registry's "
    "scale paths), the lexical side is the shingle inverted-index join, "
    "and the fusion itself is a full outer join on (query, candidate) "
    "ranks + one windowed top-K — all shuffle-partitioned by query.",
    tags=("llm", "similarity", "text"),
)
def sim_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.functions import vectors as V
    from news_ingestion_data_pipeline_spark.tables import spread

    emb = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qs = emb.filter(F.col("vec_id") < _HY_NQ).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    cos = F.round(
        V.dot(F.col("v"), F.col("qv"))
        / (V.norm(F.col("v")) * V.norm(F.col("qv"))),
        6,
    )
    wd = Window.partitionBy("qid").orderBy(F.desc("cos"), "cand")
    # bcast-ok: qs is the fixed 5-query probe set
    dense = (
        emb.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cand"), cos.alias("cos"))
        .withColumn("drank", F.row_number().over(wd))
        .select("qid", "cand", "drank")
    )
    sh = spread(t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.array_distinct(
            TX.char_ngrams(F.col("text"), 5)
        ).alias("sg"),
    )
    shq = sh.filter(F.col("doc_id") < _HY_NQ).select(
        F.col("doc_id").alias("qid"), F.col("sg").alias("qsg")
    )
    wl = Window.partitionBy("qid").orderBy(F.desc("overlap"), "cand")
    # bcast-ok: shq is the fixed 5-query probe set
    lex = (
        sh.crossJoin(F.broadcast(shq))
        .filter(F.col("doc_id") != F.col("qid"))
        .select(
            "qid",
            F.col("doc_id").alias("cand"),
            F.size(F.array_intersect("sg", "qsg")).alias("overlap"),
        )
        .withColumn("lrank", F.row_number().over(wl))
        .select("qid", "cand", "lrank")
    )
    fused = dense.join(lex, ["qid", "cand"], "full").select(
        F.col("qid").alias("query_id"),
        F.col("cand").alias("doc_id"),
        F.round(
            F.coalesce(F.lit(1.0) / (_HY_K + F.col("drank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (_HY_K + F.col("lrank")), F.lit(0.0)),
            9,
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .filter(F.col("fused_rank") <= _HY_TOP)
        .select(
            "query_id",
            "doc_id",
            "rrf",
            F.col("fused_rank").cast("bigint").alias("fused_rank"),
        )
    )
