"""Thirty-eighth wave: point-in-polygon containment (ray casting as a
pure columnar expression — the second spatial primitive next to the
grid-banded radius join) and a struct-type scalar suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# non-convex pentagon (lon, lat) inside the synthetic coordinate box
# lat in [40, 60), lon in [-10, 30) — same md5-derived points as
# join_geo_radius
_POLY = [(0.0, 45.0), (10.0, 42.0), (20.0, 46.0), (15.0, 55.0), (5.0, 57.0)]


def _u01_sql(prefix: str, expr: str) -> str:
    return (
        f"(CAST('0x' || substr(md5('{prefix}' || CAST({expr} AS VARCHAR)), 1, 13)"
        f" AS BIGINT) + 0.5) / 4503599627370496.0"
    )


def _crossings_sql(lon: str, lat: str) -> str:
    terms = []
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        terms.append(
            f"CASE WHEN (({y1} > {lat}) <> ({y2} > {lat})) AND "
            f"{lon} < ({x2} - {x1}) * ({lat} - {y1}) / ({y2} - {y1}) + {x1} "
            f"THEN 1 ELSE 0 END"
        )
    return " + ".join(terms)


@register(
    "join_point_in_polygon",
    oracle=f"""
WITH pts AS (
  SELECT user_id,
         40 + {_u01_sql('lat', 'user_id')} * 20 AS lat,
         -10 + {_u01_sql('lon', 'user_id')} * 40 AS lon
  FROM (SELECT DISTINCT user_id FROM events)
), tested AS (
  SELECT user_id, ({_crossings_sql('lon', 'lat')}) % 2 = 1 AS inside
  FROM pts
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CASE WHEN inside THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
       CAST(SUM(CASE WHEN inside THEN user_id ELSE 0 END) AS BIGINT)
         AS inside_id_sum
FROM tested
""",
    description="Point-in-polygon containment by ray casting: for each "
    "user's md5-derived coordinate (the same synthetic points as "
    "join_geo_radius), count how many of the polygon's 5 edges a "
    "rightward horizontal ray crosses — odd parity means inside; the "
    "polygon is deliberately NON-convex, which bounding-box or "
    "half-plane tests get wrong. The whole predicate is a fixed "
    "5-term branch-free columnar expression (one CASE per edge, no "
    "join, no UDF) that whole-stage codegen fuses into the scan — at "
    "100 TB this is a map-only filter; for polygon SETS the edges "
    "become a broadcast table grid-banded like join_geo_radius's "
    "cells. Output fingerprints the exact containment set (count + "
    "id-sum). Vertex-grazing rays are a measure-zero concern for "
    "hash-derived continuous coordinates.",
    tags=("join", "spatial",),
)
def join_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    def u01(prefix: str, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 13
                ),
                16,
                10,
            ).cast("double")
            + 0.5
        ) / F.lit(4503599627370496.0)

    pts = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            (40 + u01("lat", F.col("user_id")) * 20).alias("lat"),
            (-10 + u01("lon", F.col("user_id")) * 40).alias("lon"),
        )
    )
    crossings = None
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        c = F.when(
            ((F.lit(y1) > F.col("lat")) != (F.lit(y2) > F.col("lat")))
            & (
                F.col("lon")
                < (x2 - x1) * (F.col("lat") - y1) / (y2 - y1) + x1
            ),
            1,
        ).otherwise(0)
        crossings = c if crossings is None else crossings + c
    tested = pts.select("user_id", ((crossings % 2) == 1).alias("inside"))
    return tested.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum(F.when(F.col("inside"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_inside"),
        F.sum(F.when(F.col("inside"), F.col("user_id")).otherwise(0))
        .cast("bigint")
        .alias("inside_id_sum"),
    )


@register(
    "scalar_struct_suite",
    oracle="""
SELECT o_orderkey,
       o_custkey AS cust_from_struct,
       CAST(o_totalprice AS DECIMAL(18,2)) > 100000.0 AS is_big,
       CAST(CASE WHEN o_custkey % 2 = 0
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS even_price,
       o_orderpriority || '#' || CAST(o_custkey AS VARCHAR) AS packed_key
FROM orders
WHERE o_orderkey % 97 = 0
ORDER BY o_orderkey
""",
    description="Struct-type scalar surface: build a named struct per "
    "row, extract fields, nest a struct inside a struct, compare and "
    "CASE over struct fields, and re-serialize to a packed string key — "
    "the manipulations semi-structured pipelines do around "
    "STRUCT-column parquet. Spark side genuinely round-trips through "
    "named_struct / getField / nested access; the oracle states the "
    "equivalent flat values (struct construction is a projection-time "
    "concept — it must never change the values, which is exactly what "
    "the hash check certifies). Filter keeps the output sample "
    "deterministic and small.",
    tags=("scalar",),
)
def scalar_struct_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.struct(
                F.col("o_orderpriority").alias("prio"),
                (F.col("o_custkey") % 2).alias("parity"),
            ).alias("meta"),
        ).alias("rec"),
    )
    return s.select(
        "o_orderkey",
        F.col("rec.cust").alias("cust_from_struct"),
        (F.col("rec.price") > 100000.0).alias("is_big"),
        F.when(F.col("rec.meta.parity") == 0, F.col("rec.price"))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("even_price"),
        F.concat(
            F.col("rec.meta.prio"), F.lit("#"), F.col("rec.cust").cast("string")
        ).alias("packed_key"),
    )
