"""Hundred-thirty-seventh wave: exact energy distance and gzip
ingestion.

  * agg_energy_distance — the two-sample test that sees ANY
    distributional difference (location, scale, shape): energy
    distance 2·E|X-Y| - E|X-X'| - E|Y-Y'|.  The naive form is O(n²)
    pairwise |differences|; the exact O(n log n) identity used here
    computes every pairwise-sum term from SORTED prefix sums
    (Σ_i Σ_j |x_i - y_j| = Σ over the merged order of
    rank-weighted gaps), all in exact decimal arithmetic — a
    quadratic statistic at linearithmic cost, relationally.
  * scan_gzip_jsonl — compressed-feed ingestion: documents land as
    gzip-compressed JSONL (written executor-side), Spark's text codec
    auto-detection decompresses on read, and per-language md5
    certificates prove content integrity through the compression hop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

# Σ_i Σ_j |a_i - b_j| for a column of values v with group tags, via the
# merged sort: for each value, its contribution against the OTHER group's
# values below it is (count_below * v - sum_below); summing that over both
# directions gives the full pairwise sum. All decimal-exact.


@register(
    "agg_energy_distance",
    oracle="""
WITH vals AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'x' ELSE 'y' END AS g,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         o_orderkey AS k
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
ordered AS (
  SELECT g, v,
         SUM(CASE WHEN g = 'x' THEN 1 ELSE 0 END) OVER w AS cx,
         SUM(CASE WHEN g = 'y' THEN 1 ELSE 0 END) OVER w AS cy,
         SUM(CASE WHEN g = 'x' THEN v END) OVER w AS sx,
         SUM(CASE WHEN g = 'y' THEN v END) OVER w AS sy
  FROM vals
  WINDOW w AS (ORDER BY v, k ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING)
),
pair AS (
  SELECT
    SUM(CASE WHEN g = 'x'
             THEN COALESCE(cy, 0) * v - COALESCE(sy, CAST(0 AS DECIMAL(18,2)))
             ELSE COALESCE(cx, 0) * v - COALESCE(sx, CAST(0 AS DECIMAL(18,2)))
        END) AS sxy,
    SUM(CASE WHEN g = 'x'
             THEN COALESCE(cx, 0) * v - COALESCE(sx, CAST(0 AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(38,2)) END) AS sxx,
    SUM(CASE WHEN g = 'y'
             THEN COALESCE(cy, 0) * v - COALESCE(sy, CAST(0 AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(38,2)) END) AS syy,
    SUM(CASE WHEN g = 'x' THEN 1 ELSE 0 END) AS nx,
    SUM(CASE WHEN g = 'y' THEN 1 ELSE 0 END) AS ny
  FROM ordered
)
SELECT CAST(nx AS BIGINT) AS n_x,
       CAST(ny AS BIGINT) AS n_y,
       2.0 * (CAST(CAST(sxy AS VARCHAR) AS DOUBLE) / (nx * ny))
         - 2.0 * (CAST(CAST(sxx AS VARCHAR) AS DOUBLE) / (nx * nx))
         - 2.0 * (CAST(CAST(syy AS VARCHAR) AS DOUBLE) / (ny * ny))
         AS energy_distance
FROM pair
""",
    description="Exact two-sample energy distance between URGENT and LOW "
    "order values: 2E|X-Y| - E|X-X'| - E|Y-Y'|, sensitive to ANY "
    "distributional difference where KS sees only the max CDF gap and "
    "MWU only rank shifts. The O(n²) pairwise sums collapse to ONE "
    "global sort via the prefix-sum identity (each value contributes "
    "count_below·v - sum_below against the other group), so the "
    "quadratic statistic costs one window pass — and because values are "
    "exact decimals the pairwise sums are EXACT, no sampling, no float "
    "drift (within-group sums use the same identity; the x2 in E|X-X'| "
    "cancels against ordered-pair counting). Scale: the global prefix "
    "sums decompose over value-range buckets (the distributed_row_number "
    "two-pass shape): per-bucket partial counts/sums roll into histogram-"
    "sized cumulative offsets, then each bucket computes its local prefix "
    "window in parallel — no single-partition sort anywhere.",
    tags=("agg", "stats"),
)
def agg_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    vals = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", "x")
            .otherwise("y")
            .alias("g"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
            F.col("o_orderkey").alias("k"),
        )
    )
    zero2 = F.lit(0).cast("decimal(18,2)")
    zero38b = F.lit(0).cast("decimal(38,2)")
    # bucket = range-quantized v: coarse-monotone in the (v, k) order
    # (equal v always shares a bucket), so global prefix state below a
    # row = cumulative per-bucket totals of all LOWER buckets + the local
    # in-bucket prefix window. ~300 buckets at any SF (value range, not
    # row count, sets the bucket count; raise the divisor for wider data).
    b = vals.withColumn("__b", F.floor(F.col("v") / 2048).cast("long"))
    per = b.groupBy("__b").agg(
        F.sum(F.when(F.col("g") == "x", 1).otherwise(0)).alias("bcx"),
        F.sum(F.when(F.col("g") == "y", 1).otherwise(0)).alias("bcy"),
        F.sum(
            F.when(F.col("g") == "x", F.col("v")).otherwise(zero2)
        ).alias("bsx"),
        F.sum(
            F.when(F.col("g") == "y", F.col("v")).otherwise(zero2)
        ).alias("bsy"),
    )
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    off = per.select(
        "__b",
        F.coalesce(F.sum("bcx").over(wb), F.lit(0)).alias("ocx"),
        F.coalesce(F.sum("bcy").over(wb), F.lit(0)).alias("ocy"),
        F.coalesce(
            F.sum("bsx").over(wb).cast("decimal(38,2)"), zero38b
        ).alias("osx"),
        F.coalesce(
            F.sum("bsy").over(wb).cast("decimal(38,2)"), zero38b
        ).alias("osy"),
    )
    wloc = Window.partitionBy("__b").orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ordered = b.join(F.broadcast(off), "__b").select(
        "g",
        "v",
        (
            F.coalesce(
                F.sum(F.when(F.col("g") == "x", 1).otherwise(0)).over(wloc),
                F.lit(0),
            )
            + F.col("ocx")
        ).alias("cx"),
        (
            F.coalesce(
                F.sum(F.when(F.col("g") == "y", 1).otherwise(0)).over(wloc),
                F.lit(0),
            )
            + F.col("ocy")
        ).alias("cy"),
        (
            F.coalesce(
                F.sum(F.when(F.col("g") == "x", F.col("v"))).over(wloc),
                zero2,
            ).cast("decimal(38,2)")
            + F.col("osx")
        ).alias("sx"),
        (
            F.coalesce(
                F.sum(F.when(F.col("g") == "y", F.col("v"))).over(wloc),
                zero2,
            ).cast("decimal(38,2)")
            + F.col("osy")
        ).alias("sy"),
    )
    x_term = F.coalesce("cy", F.lit(0)) * F.col("v") - F.coalesce(
        "sy", zero2
    )
    y_term = F.coalesce("cx", F.lit(0)) * F.col("v") - F.coalesce(
        "sx", zero2
    )
    xx_term = F.coalesce("cx", F.lit(0)) * F.col("v") - F.coalesce(
        "sx", zero2
    )
    yy_term = F.coalesce("cy", F.lit(0)) * F.col("v") - F.coalesce(
        "sy", zero2
    )
    zero38 = F.lit(0).cast("decimal(38,2)")
    pair = ordered.agg(
        F.sum(
            F.when(F.col("g") == "x", x_term).otherwise(y_term)
        ).alias("sxy"),
        F.sum(
            F.when(F.col("g") == "x", xx_term.cast("decimal(38,2)")).otherwise(
                zero38
            )
        ).alias("sxx"),
        F.sum(
            F.when(F.col("g") == "y", yy_term.cast("decimal(38,2)")).otherwise(
                zero38
            )
        ).alias("syy"),
        F.sum(F.when(F.col("g") == "x", 1).otherwise(0)).alias("nx"),
        F.sum(F.when(F.col("g") == "y", 1).otherwise(0)).alias("ny"),
    )
    return pair.select(
        F.col("nx").cast("bigint").alias("n_x"),
        F.col("ny").cast("bigint").alias("n_y"),
        (
            2.0 * (F.col("sxy").cast("double") / (F.col("nx") * F.col("ny")))
            - 2.0
            * (F.col("sxx").cast("double") / (F.col("nx") * F.col("nx")))
            - 2.0
            * (F.col("syy").cast("double") / (F.col("ny") * F.col("ny")))
        ).alias("energy_distance"),
    )


_ROOT = scratch_root("llm137")


@register(
    "scan_gzip_jsonl",
    oracle="""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       md5(string_agg(md5(text), '' ORDER BY doc_id)) AS content_md5
FROM documents
GROUP BY lang
ORDER BY lang
""",
    description="Compressed-feed ingestion: documents re-land as "
    "gzip-compressed JSONL (one .jsonl.gz per executor batch, written "
    "with Python's gzip inside mapInPandas — the shape of every vendor "
    "drop), then Spark's codec auto-detection decompresses on read and "
    "the JSON parser restores the rows. Per-language counts plus an "
    "order-pinned md5-of-md5s over the round-tripped text certify "
    "nothing was truncated mid-member or double-decoded. Scale note: "
    "gzip members are NOT splittable — one file = one task, which is "
    "the documented reason vendor drops should be many medium files "
    "(same trade as multiLine CSV).",
    tags=("scan", "pipeline"),
)
def scan_gzip_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import gzip
    import hashlib
    import json
    import os
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/gz_{sfx}"
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def write_gz(it):
        import pandas as pd

        for i, pdf in enumerate(it):
            if len(pdf) == 0:
                continue
            part = os.getpid()
            fname = f"{path}/part-{part}-{i}.jsonl.gz"
            with gzip.open(fname, "wt", encoding="utf-8") as fh:
                for rec in pdf.to_dict("records"):
                    fh.write(json.dumps(rec) + "\n")
            yield pd.DataFrame({"n": [len(pdf)]})

    written = docs.repartition(4).mapInPandas(write_gz, schema="n long")
    assert written.agg(F.sum("n")).collect()[0][0] == docs.count()

    back = spark.read.schema("doc_id long, lang string, text string").json(
        path
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("doc_id", F.md5("text").alias("h"))
                            )
                        ),
                        lambda s: s["h"],
                    ),
                    "",
                )
            ).alias("content_md5"),
        )
        
    )
