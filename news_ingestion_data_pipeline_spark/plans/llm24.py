"""Twenty-fourth wave: entity resolution and data layout — blocked
record linkage (fuzzy match over the DISTINCT value domain, not the row
domain) and a Z-order clustering layout whose zone-map tightness is
measured against naive row-order files. Both fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_LEV_MAX = 3


@register(
    "join_record_linkage",
    oracle=f"""
WITH names AS (
  SELECT p_name AS name, COUNT(*) AS n_rows
  FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS edit_dist,
       a.n_rows AS rows_a, b.n_rows AS rows_b
FROM names a JOIN names b
  ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
 AND a.name < b.name
 AND abs(length(a.name) - length(b.name)) <= {_LEV_MAX}
WHERE levenshtein(a.name, b.name) <= {_LEV_MAX}
ORDER BY name_a, name_b
""",
    description="Blocked record linkage (entity resolution) over part "
    "names: candidate pairs are generated on the DISTINCT name domain — "
    "vocabulary-sized, not row-sized — blocked on (first character, "
    f"length within ±{_LEV_MAX}), then scored with Levenshtein and kept "
    f"at distance <= {_LEV_MAX}; each surviving name pair carries the row "
    "counts it would merge. The two-level design is the 100 TB shape: "
    "fuzzy comparison cost is O(|vocab in block|²), never O(rows²), and "
    "the length predicate is sound because edit distance >= length "
    "difference (no true match is lost to that filter). Rows map back to "
    "resolved entities by an equi-join on the exact name — a plain "
    "hash join the optimizer can broadcast. Equivalent of dedupe-style "
    "blocking+scoring (Fellegi-Sunter candidate generation).",
    tags=("join", "similarity", "linkage"),
)
def join_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = (
        t(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("rows_a"),
        F.substring("name", 1, 1).alias("blk"),
        F.length("name").alias("len_a"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("rows_b"),
        F.substring("name", 1, 1).alias("blk"),
        F.length("name").alias("len_b"),
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= _LEV_MAX)
        )
        .where(F.levenshtein("name_a", "name_b") <= _LEV_MAX)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("edit_dist"),
            "rows_a",
            "rows_b",
        )
        
    )


_ZBITS = 8  # 8 bits per dimension -> 16-bit z-value, 65536 cells
_ZSIDE = 1 << _ZBITS
_ZCELLS = _ZSIDE * _ZSIDE
_ZFILES = 64


def _quant(col, lo, hi):
    """Scale a key into [0, 2^_ZBITS) with exact integer arithmetic."""
    return ((col - lo) * _ZSIDE / (hi - lo + 1)).cast("long")


def _zval(x, y):
    z = F.lit(0).cast("long")
    for i in range(_ZBITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _sql_zval(x: str, y: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "storage_zorder_layout",
    oracle=f"""
WITH stats AS (
  SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
         MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax,
         COUNT(*) AS n
  FROM lineitem
), q AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor((l_partkey - pmin) * {_ZSIDE} / (pmax - pmin + 1)) AS BIGINT) AS x,
         CAST(floor((l_suppkey - smin) * {_ZSIDE} / (smax - smin + 1)) AS BIGINT) AS y,
         n
  FROM lineitem, stats
), z AS (
  SELECT x, y, n, {_sql_zval('x', 'y')} AS zval, l_orderkey, l_linenumber
  FROM q
), assigned AS (
  SELECT x, y,
         CAST(floor((ROW_NUMBER() OVER (ORDER BY zval, l_orderkey, l_linenumber) - 1)
              * {_ZFILES} / n) AS BIGINT) AS zfile,
         CAST(floor((ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
              * {_ZFILES} / n) AS BIGINT) AS seqfile
  FROM z
), per_file AS (
  SELECT 'zorder' AS layout, zfile AS file_id,
         MAX(x) - MIN(x) + 1 AS x_span, MAX(y) - MIN(y) + 1 AS y_span
  FROM assigned GROUP BY zfile
  UNION ALL
  SELECT 'rowseq' AS layout, seqfile AS file_id,
         MAX(x) - MIN(x) + 1 AS x_span, MAX(y) - MIN(y) + 1 AS y_span
  FROM assigned GROUP BY seqfile
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       round(CAST(SUM(x_span) AS DOUBLE) / COUNT(*), 4) AS avg_x_span,
       round(CAST(SUM(y_span) AS DOUBLE) / COUNT(*), 4) AS avg_y_span,
       round(CAST(SUM(x_span * y_span) AS DOUBLE)
             / ({_ZCELLS}.0 * COUNT(*)), 6) AS avg_area_frac
FROM per_file
GROUP BY layout
ORDER BY layout
""",
    description="Z-order (Morton-curve) clustering layout vs naive row "
    "order, judged by zone-map tightness: quantize (l_partkey, l_suppkey) "
    f"to {_ZBITS}-bit grid coordinates, interleave the bits into a "
    "16-bit z-value, split the sorted stream into "
    f"{_ZFILES} equal-row files, and report each layout's average "
    "per-file min/max bounding box. Z-order files cover a small fraction "
    "of the (x, y) plane, so a reader filtering on EITHER key prunes "
    "most files from min/max footer stats alone — rowseq files span the "
    "full secondary-key range and prune nothing. This is exactly what "
    "Delta/Iceberg OPTIMIZE ZORDER does, and the ranks are computed the "
    "way it must run at 100 TB: range-partitioned on coarse z-value / "
    "orderkey buckets with per-bucket sorts plus broadcast prefix "
    "offsets (operators/ranking.py — the agg_percentile_ranks two-pass "
    "decomposition), no single-partition sort window anywhere.",
    tags=("storage", "layout", "scan"),
)
def storage_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    from news_ingestion_data_pipeline_spark.operators.ranking import (
        distributed_row_number,
    )

    stats = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
        F.min("l_orderkey").alias("omin"),
        F.max("l_orderkey").alias("omax"),
        F.count(F.lit(1)).alias("n"),
    )
    q = li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        "n",
        "omin",
        "omax",
        _quant(F.col("l_partkey"), F.col("pmin"), F.col("pmax")).alias("x"),
        _quant(F.col("l_suppkey"), F.col("smin"), F.col("smax")).alias("y"),
    )
    z = q.withColumn("zval", _zval(F.col("x"), F.col("y")))
    # Both global ranks run as the range-partitioned two-pass form
    # (operators/ranking.py), never a single-partition sort window:
    # z-rank buckets on the top 8 z-value bits (256 coarse Morton
    # ranges), seq-rank buckets on a 256-way orderkey range split.
    # localCheckpoint between the two rank passes: each pass consumes its
    # input twice (bucket histogram + offset join), so an unbroken
    # lineage would re-run the z-rank pipeline for every consumer.
    zranked = distributed_row_number(
        z,
        ["zval", "l_orderkey", "l_linenumber"],
        F.shiftright(F.col("zval"), 2 * _ZBITS - 8),
        out="zrn",
    ).localCheckpoint()
    assigned = distributed_row_number(
        zranked,
        ["l_orderkey", "l_linenumber"],
        F.floor(
            (F.col("l_orderkey") - F.col("omin"))
            * 256
            / (F.col("omax") - F.col("omin") + 1)
        ),
        out="srn",
    ).select(
        "x",
        "y",
        ((F.col("zrn") - 1) * _ZFILES / F.col("n")).cast("long").alias("zfile"),
        ((F.col("srn") - 1) * _ZFILES / F.col("n")).cast("long").alias("seqfile"),
    )

    # one pass over `assigned` for BOTH layouts: explode each row into its
    # (layout, file_id) memberships, then a single (layout, file_id)
    # aggregate — a union of two groupBys would scan `assigned` twice
    per = (
        assigned.select(
            "x",
            "y",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("zorder").alias("layout"),
                        F.col("zfile").alias("file_id"),
                    ),
                    F.struct(
                        F.lit("rowseq").alias("layout"),
                        F.col("seqfile").alias("file_id"),
                    ),
                )
            ).alias("lf"),
        )
        .select("x", "y", F.col("lf.layout").alias("layout"), F.col("lf.file_id").alias("file_id"))
        .groupBy("layout", "file_id")
        .agg(
            (F.max("x") - F.min("x") + 1).alias("x_span"),
            (F.max("y") - F.min("y") + 1).alias("y_span"),
        )
        .select("layout", "file_id", "x_span", "y_span")
    )
    return (
        per.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.round(F.sum("x_span").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_x_span"
            ),
            F.round(F.sum("y_span").cast("double") / F.count(F.lit(1)), 4).alias(
                "avg_y_span"
            ),
            F.round(
                F.sum(F.col("x_span") * F.col("y_span")).cast("double")
                / (F.lit(float(_ZCELLS)) * F.count(F.lit(1))),
                6,
            ).alias("avg_area_frac"),
        )
        
    )
