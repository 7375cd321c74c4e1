"""Nineteenth wave: spatial radius join — grid-cell banding (the 2-D
analog of the LSH bucket join) with exact haversine verification —
with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_CELL_DEG = "0.5"  # ~55 km at these latitudes: cell edge >= radius
_RADIUS_KM = "50.0"
_EARTH_KM = "6371.0"

# deterministic synthetic coordinates: md5-derived uniforms mapped into
# a 20x40-degree box (the fixture has no geo columns; the derivation is
# the same RNG-free trick as the weighted-sampling uniforms)
_LAT_SQL = (
    "40 + (CAST(CAST('0x' || substr(md5('lat' || CAST({u} AS VARCHAR)), 1, 13)"
    " AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0 * 20"
)
_LON_SQL = (
    "-10 + (CAST(CAST('0x' || substr(md5('lon' || CAST({u} AS VARCHAR)), 1, 13)"
    " AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0 * 40"
)

_HAV = (
    "2 * {R} * asin(sqrt("
    "sin(radians(({lat2} - {lat1}) / 2)) * sin(radians(({lat2} - {lat1}) / 2))"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * sin(radians(({lon2} - {lon1}) / 2))"
    " * sin(radians(({lon2} - {lon1}) / 2))))"
)


@register(
    "join_geo_radius",
    oracle=f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), pts AS (
  SELECT user_id,
         {_LAT_SQL.format(u='user_id')} AS lat,
         {_LON_SQL.format(u='user_id')} AS lon
  FROM users
), pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         {_HAV.format(R=_EARTH_KM, lat1='a.lat', lat2='b.lat',
                      lon1='a.lon', lon2='b.lon')} AS dist_km
  FROM pts a JOIN pts b
    ON a.user_id < b.user_id
   AND abs(floor(a.lat / {_CELL_DEG}) - floor(b.lat / {_CELL_DEG})) <= 1
   AND abs(floor(a.lon / {_CELL_DEG}) - floor(b.lon / {_CELL_DEG})) <= 1
)
SELECT user_a, user_b, round(dist_km, 6) AS dist_km
FROM pairs WHERE dist_km <= {_RADIUS_KM}
ORDER BY user_a, user_b
""",
    description="Spatial radius join — find all user pairs within 50 km "
    "— via grid-cell banding, the 2-D analog of the engine's LSH bucket "
    "joins: points land in 0.5-degree cells (edge >= radius at these "
    "latitudes), candidates must sit in the same or an adjacent cell "
    "(the 3x3 neighborhood — multi-probe in two dimensions), and exact "
    "haversine verifies. At 100 TB the cell id is the shuffle key: the "
    "all-pairs O(n^2) collapses to sum-over-cells O(cell^2) exactly "
    "like the banded text dedups, and the neighbor probe replicates "
    "only the probe side 9x (in this one-shot form the cell predicate "
    "lives in the join condition; materialized, it becomes the "
    "partition column). Coordinates are md5-derived uniforms (the "
    "fixture has no geo columns — same RNG-free derivation as the "
    "weighted sampler); trig is libm on both engines with the usual "
    "round-6 + threshold contract.",
    tags=("join", "geo", "scale"),
)
def join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    cell = float(_CELL_DEG)
    radius = float(_RADIUS_KM)
    earth = float(_EARTH_KM)

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
        .withColumn("cell_lat", F.floor(F.col("lat") / cell))
        .withColumn("cell_lon", F.floor(F.col("lon") / cell))
        .localCheckpoint()  # both join sides
    )
    # probe side replicates into its 3x3 neighbor cells so candidate
    # generation is a pure EQUI-join on the cell key (the honest banded
    # plan — an abs(cell diff) <= 1 predicate would degenerate to a
    # nested-loop join)
    probe = pts.select(
        F.col("user_id"),
        F.col("lat"),
        F.col("lon"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cell_lat") + dy).alias("cl"),
                        (F.col("cell_lon") + dx).alias("cn"),
                    )
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                ]
            )
        ).alias("nb"),
    ).select(
        "user_id", "lat", "lon",
        F.col("nb.cl").alias("cell_lat"), F.col("nb.cn").alias("cell_lon"),
    )
    a = probe.alias("a")
    b = pts.alias("b")

    def hav(lat1, lat2, lon1, lon2):
        dlat = F.radians((lat2 - lat1) / 2)
        dlon = F.radians((lon2 - lon1) / 2)
        return (
            2
            * earth
            * F.asin(
                F.sqrt(
                    F.sin(dlat) * F.sin(dlat)
                    + F.cos(F.radians(lat1))
                    * F.cos(F.radians(lat2))
                    * F.sin(dlon)
                    * F.sin(dlon)
                )
            )
        )

    dist = hav(
        F.col("a.lat"), F.col("b.lat"), F.col("a.lon"), F.col("b.lon")
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cell_lat") == F.col("b.cell_lat"))
            & (F.col("a.cell_lon") == F.col("b.cell_lon"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            dist.alias("dist_km"),
        )
        .filter(F.col("dist_km") <= radius)
    )
    return pairs.select(
        "user_a", "user_b", F.round("dist_km", 6).alias("dist_km")
    )
