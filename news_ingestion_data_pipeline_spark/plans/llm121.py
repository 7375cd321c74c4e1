"""Hundred-twenty-first wave: Dynamic Time Warping distance between
event-type time series.

DTW is THE classic alignment distance for time series that drift in
phase (two metrics spiking a day apart are "similar" to DTW and "far"
to Euclidean).  Here: daily event-count series per type, all 10 type
pairs, full DP matrix

    D[i][j] = |a_i - b_j| + min(D[i-1][j], D[i][j-1], D[i-1][j-1])

run as a NESTED fold entirely in integer arithmetic — the outer fold
walks series A (accumulator = previous DP row), the inner fold walks
series B building the next row (its accumulator carries the running
row so the D[i][j-1] dependency is available).  Costs are integer
|count - count|, so the distance is BIGINT-exact and the oracle's
list_reduce replay matches bit for bit — the same cross-engine fold
contract as Holt/Croston/Viterbi, extended to two dimensions.

Scale shape: series are calendar-bounded (30 points), pairs are
type-bounded (10); the corpus-sized work is one (type, day) count.
At 100 TB with thousands of series the same plan shards pairs across
executors — each DP is a single-row expression evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_BIG = 1 << 55


@register(
    "events_dtw_distance",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         COUNT(*) AS c
  FROM events GROUP BY event_type, 2
),
bounds AS (
  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
),
grid AS (
  SELECT t.event_type, g.day
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds) g
),
series AS (
  SELECT g.event_type,
         list(COALESCE(daily.c, 0) ORDER BY g.day) AS xs
  FROM grid g LEFT JOIN daily
    ON daily.event_type = g.event_type AND daily.day = g.day
  GROUP BY g.event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.xs AS xa, b.xs AS xb
  FROM series a JOIN series b ON a.event_type < b.event_type
),
folded AS (
  SELECT type_a, type_b, len(xa) AS n_days,
    list_reduce(
      -- seed the outer fold with row 0: D[0][0]=0 is implicit; row0[j] =
      -- cumulative |a_1 - b_j| path along the top edge is NOT the DTW
      -- convention used here; instead row0 = [0, BIG, BIG, ...] models
      -- the virtual row before series A starts, and the first real row
      -- charges |a_1 - b_j| + min(...) like every other row.
      list_prepend(
        list_transform(range(0, len(xb) + 1),
                       j -> CASE WHEN j = 0 THEN CAST(0 AS BIGINT)
                                 ELSE CAST({_BIG} AS BIGINT) END),
        list_transform(xa, a -> [CAST(a AS BIGINT)])),
      (prev, a) -> list_reduce(
        list_prepend([CAST({_BIG} AS BIGINT)],
          list_transform(range(1, len(xb) + 1), j -> [CAST(j AS BIGINT)])),
        (row, jj) -> list_append(row,
          abs(a[1] - xb[jj[1]])
          + least(prev[jj[1] + 1], prev[jj[1]], row[jj[1]]))
      )
    ) AS last_row
  FROM pairs
)
SELECT type_a, type_b,
       CAST(n_days AS BIGINT) AS n_days,
       CAST(last_row[n_days + 1] AS BIGINT) AS dtw_dist
FROM folded
ORDER BY type_a, type_b
""",
    description="Dynamic Time Warping distance between every pair of "
    "event types' daily count series (zero-filled onto the global day "
    "grid): D[i][j] = |a_i - b_j| + min(insert, delete, match) computed "
    "by a NESTED fold — outer over series A with the previous DP row as "
    "accumulator, inner over series B building the next row so the "
    "within-row dependency D[i][j-1] is available. Pure BIGINT "
    "arithmetic (integer counts, abs, min), so the distance is "
    "bit-identical to the oracle's nested list_reduce replay — the "
    "cross-engine fold contract extended to a 2-D dynamic program. The "
    "phase-tolerant similarity that Euclidean/correlation siblings "
    "(events_autocorrelation, events_similar_users) can't express. "
    "Scale: series are calendar-bounded, the corpus-sized work is one "
    "(type, day) aggregate; thousands of pairs would shard row-wise.",
    tags=("events", "timeseries", "iterative"),
)
def events_dtw_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "unix_micros(cast(ts as timestamp)) div 86400000000"
            ).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    series = (
        grid.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
        )
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                lambda s: s["c"].cast("bigint"),
            ).alias("xs")
        )
    )
    a, b = series.alias("a"), series.alias("b")
    pairs = a.join(
        b, F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.xs").alias("xa"),
        F.col("b.xs").alias("xb"),
    )

    big = F.lit(_BIG).cast("bigint")
    nb = F.size("xb")

    def outer_step(prev, aval):
        def inner_step(row, j):
            cost = F.abs(aval - F.element_at("xb", j.cast("int")))
            best = F.least(
                F.element_at(prev, (j + 1).cast("int")),
                F.element_at(prev, j.cast("int")),
                F.element_at(row, j.cast("int")),
            )
            return F.concat(row, F.array(cost + best))

        return F.aggregate(
            F.sequence(F.lit(1), nb), F.array(big), inner_step
        )

    row0 = F.concat(
        F.array(F.lit(0).cast("bigint")),
        F.array_repeat(big, nb),
    )
    folded = pairs.select(
        "type_a",
        "type_b",
        F.size("xa").alias("n_days"),
        F.aggregate("xa", row0, outer_step).alias("last_row"),
    )
    return folded.select(
        "type_a",
        "type_b",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.element_at(
            "last_row", (F.col("n_days") + 1).cast("int")
        ).alias("dtw_dist"),
    )
