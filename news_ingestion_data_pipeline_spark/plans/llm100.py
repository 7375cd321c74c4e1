"""Hundredth wave: permissive CSV corrupt-record handling and an IVF
probe-budget recall sweep.

  * scan_csv_corrupt_records — the CSV twin of scan_jsonl_permissive:
    real corrupted lines (non-numeric field, extra column) written to
    disk and read back with PERMISSIVE mode + columnNameOfCorruptRecord.
    Spark's measured semantics (pinned by experiment): a type-mismatch
    row keeps its parseable columns and carries the raw line in the
    corrupt column; an extra-column row parses fully but is still
    flagged; a missing-column row is flagged; an empty field is just
    NULL, not corrupt.  Clean-row aggregates + per-class corrupt counts
    are all oracle-pinned.
  * sim_ivf_nprobe_sweep — the recall-vs-cost curve an ANN deployment
    is tuned by: IVF top-5 at n_probe 1, 2, 4 against the exact
    brute-force top-5, recall@5 averaged over the 10 query vectors.
    All three configs share ONE centroid-assignment pass (the ranked
    cell table) — the sweep costs one assignment plus three cheap
    cell-pruned candidate joins, which is exactly how a parameter
    sweep should be shaped at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_ROOT = scratch_root("llm100")


@register(
    "scan_csv_corrupt_records",
    oracle="""
WITH cls AS (
  SELECT doc_id, lang, n_chars,
         (doc_id % 23 = 11) AS extra_col,
         (doc_id % 19 = 7 AND doc_id % 23 <> 11) AS bad_int
  FROM documents
), clean AS (
  SELECT lang, COUNT(*) AS n_rows, SUM(n_chars) AS sum_chars
  FROM cls WHERE NOT extra_col AND NOT bad_int
  GROUP BY lang
)
SELECT lang,
       CAST(n_rows AS BIGINT) AS n_rows,
       CAST(sum_chars AS BIGINT) AS sum_chars,
       CAST((SELECT COUNT(*) FROM cls WHERE extra_col OR bad_int) AS BIGINT)
         AS n_corrupt,
       CAST((SELECT COUNT(*) FROM cls WHERE extra_col) AS BIGINT)
         AS n_extra_col,
       CAST((SELECT COUNT(*) FROM cls WHERE bad_int) AS BIGINT)
         AS n_bad_int
FROM clean
ORDER BY lang
""",
    description="Permissive CSV ingestion with real corrupted lines "
    "(the CSV twin of scan_jsonl_permissive): documents serialized to "
    "CSV with doc_id%19=7 rows carrying a non-numeric n_chars and "
    "doc_id%23=11 rows an extra trailing column, read back with "
    "PERMISSIVE + columnNameOfCorruptRecord. Spark's measured "
    "semantics are the contract: type-mismatch rows keep parseable "
    "columns but carry the raw line in the corrupt column; "
    "extra-column rows parse fully yet are flagged — clean-row "
    "per-lang aggregates and both corrupt-class counts (classified "
    "from the RAW quarantined lines, the way a production quarantine "
    "triages) are oracle-pinned. At 100 TB this is one scan: the "
    "corrupt column costs nothing on clean rows and quarantine "
    "routing is a map-side filter.",
    tags=("scan", "pipeline"),
)
def scan_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/csv_{sfx}"
    shutil.rmtree(path, ignore_errors=True)

    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    line = F.concat(
        F.col("doc_id").cast("string"),
        F.lit(","),
        F.col("lang"),
        F.lit(","),
        F.when(
            (F.col("doc_id") % 19 == 7) & (F.col("doc_id") % 23 != 11),
            F.lit("NA"),
        ).otherwise(F.col("n_chars").cast("string")),
        F.when(F.col("doc_id") % 23 == 11, F.lit(",x")).otherwise(F.lit("")),
    )
    d.select(line.alias("value")).write.text(path)

    parsed = (
        spark.read.schema(
            "doc_id long, lang string, n_chars long, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        # Spark refuses corrupt-column-only queries on the lazy scan
        # (the column is filled during full-row parsing) — materialize
        # once, then clean stats and quarantine triage share the parse
        .localCheckpoint(eager=True)
    )
    clean = parsed.filter(F.col("_corrupt_record").isNull())
    corrupt = parsed.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    # triage from the RAW quarantined line, as a production DLQ would
    extra = corrupt.filter(F.col("_corrupt_record").endswith(",x")).count()
    bad_int = corrupt.filter(
        ~F.col("_corrupt_record").endswith(",x")
    ).count()
    return (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .withColumn("n_corrupt", F.lit(extra + bad_int).cast("bigint"))
        .withColumn("n_extra_col", F.lit(extra).cast("bigint"))
        .withColumn("n_bad_int", F.lit(bad_int).cast("bigint"))
        
    )


def _nprobe_sweep_oracle() -> str:
    from news_ingestion_data_pipeline_spark.plans.llm import (
        _SQL_CELL_SIM,
        _SQL_COS,
    )

    probes = (1, 2, 4)
    per_np = []
    for np_ in probes:
        per_np.append(
            f"""cand{np_} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, a.vec_id) AS rank
    FROM a JOIN (SELECT vec_id, v, cent_id AS cell FROM ranked
                 WHERE vec_id < 10 AND rn <= {np_}) q
      ON a.cell = q.cell
    WHERE a.vec_id != q.vec_id
  ) WHERE rank <= 5
), hits{np_} AS (
  SELECT COUNT(*) AS h FROM cand{np_} c
  JOIN exact x ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {np_} AS n_probe, CAST((SELECT h FROM hits{np_}) AS BIGINT)"
        f" AS n_hits FROM (SELECT 1)"
        for np_ in probes
    )
    return f"""
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
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS} DESC, a.vec_id) AS rank
    FROM (SELECT vec_id, v FROM e) a
    JOIN (SELECT vec_id, v FROM e WHERE vec_id < 10) q
      ON a.vec_id != q.vec_id
  ) WHERE rank <= 5
),
{",".join(per_np)}
SELECT n_probe, n_hits,
       CAST(n_hits AS DOUBLE) / 50 AS recall_at_5,
       CAST(10 AS BIGINT) AS n_queries
FROM ({selects})
ORDER BY n_probe
"""


@register(
    "sim_ivf_nprobe_sweep",
    oracle=_nprobe_sweep_oracle(),
    description="IVF probe-budget recall sweep — the tuning curve an "
    "ANN deployment chooses its operating point from: top-5 retrieval "
    "at n_probe 1, 2, 4 (16 deterministic seed centroids) measured as "
    "recall@5 against the exact brute-force top-5, averaged over the "
    "10 query vectors. All three configs reuse ONE cell-assignment "
    "pass (the ranked centroid table) and differ only in how many "
    "probed cells the candidate join keeps — so the sweep costs one "
    "assignment plus three cell-pruned joins, not three scans. "
    "Monotonicity (recall rises with n_probe) falls out of the "
    "oracle-pinned counts; at 100 TB the assignment is the stored "
    "partition column and each config's cost is n_probe/n_cells of "
    "the data.",
    tags=("similarity", "llm"),
)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.operators import similarity as SIM

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = (
        SIM.brute_force_topk(emb, queries, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    parts = []
    for np_ in (1, 2, 4):
        approx = SIM.ivf_topk(
            emb, queries, k=5, n_cells=16, n_probe=np_
        ).select("query_id", "neighbor_id")
        hits = approx.join(exact, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits")
        )
        parts.append(hits.withColumn("n_probe", F.lit(np_)))
    swept = parts[0]
    for p in parts[1:]:
        swept = swept.unionByName(p)
    return swept.select(
        "n_probe",
        "n_hits",
        (F.col("n_hits").cast("double") / 50).alias("recall_at_5"),
        F.lit(10).cast("bigint").alias("n_queries"),
    )
