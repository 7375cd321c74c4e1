"""Hundred-thirty-ninth wave: censored exponential survival MLE and
partition conductance.

  * events_exponential_survival_mle — parametric survival with RIGHT
    CENSORING, the piece Kaplan-Meier (customer_survival_km) doesn't
    parameterize: time from each user's first event to first purchase,
    users who never purchase censored at their last event.  The
    exponential MLE is closed-form — lambda = events / total exposure
    (censored users contribute exposure, no event) — so the rate,
    median survival ln2/lambda, and horizon survival probabilities are
    deterministic arithmetic over two exact sums.
  * graph_partition_conductance — partition quality on the co-presence
    graph: for the user_id mod 4 partition, each block's conductance
    cut / min(vol, vol_complement) in exact integers — the metric that
    scores community assignments (graph_label_propagation produces
    them; this is the scorer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t


@register(
    "events_exponential_survival_mle",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase,
         MAX(epoch_us(ts)) AS t_last
  FROM events GROUP BY user_id
),
spans AS (
  SELECT user_id,
         CASE WHEN t_purchase IS NOT NULL AND t_purchase > t0
              THEN 1 ELSE 0 END AS observed,
         CASE WHEN t_purchase IS NOT NULL AND t_purchase > t0
              THEN t_purchase - t0 ELSE t_last - t0 END AS exposure_us
  FROM per_user
  WHERE t_last > t0
),
s AS (
  SELECT CAST(SUM(observed) AS BIGINT) AS d,
         CAST(SUM(exposure_us) AS BIGINT) AS tot_us,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM spans
)
SELECT n, d AS n_events,
       CAST(n - d AS BIGINT) AS n_censored,
       CAST(d AS DOUBLE) / (CAST(tot_us AS DOUBLE) / 3600000000.0)
         AS lambda_per_hour,
       ln(2.0) / (CAST(d AS DOUBLE)
                  / (CAST(tot_us AS DOUBLE) / 3600000000.0))
         AS median_hours,
       exp(-(CAST(d AS DOUBLE) / (CAST(tot_us AS DOUBLE) / 3600000000.0))
           * 24.0) AS surv_24h
FROM s
""",
    description="Right-censored exponential survival MLE for time-to-"
    "first-purchase (measured from each user's first event; never-"
    "purchasers are censored at their last event and contribute "
    "EXPOSURE, not events — dropping them is the classic bias this "
    "model exists to avoid). The MLE is closed-form lambda = d / total "
    "exposure, so the hourly rate, median survival ln2/lambda and "
    "24-hour survival probability are one deterministic IEEE chain over "
    "two exact integer sums (microsecond exposure, event count). The "
    "parametric companion to customer_survival_km's nonparametric "
    "curve. One per-user aggregate, a 1-row reduce.",
    tags=("events", "stats", "survival"),
)
def events_exponential_survival_mle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    us = F.expr("unix_micros(cast(ts as timestamp))")
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(us).alias("t0"),
            F.min(
                F.when(F.col("event_type") == "purchase", us)
            ).alias("t_purchase"),
            F.max(us).alias("t_last"),
        )
    )
    observed = F.col("t_purchase").isNotNull() & (
        F.col("t_purchase") > F.col("t0")
    )
    spans = per_user.filter(F.col("t_last") > F.col("t0")).select(
        observed.cast("int").alias("observed"),
        F.when(observed, F.col("t_purchase") - F.col("t0"))
        .otherwise(F.col("t_last") - F.col("t0"))
        .alias("exposure_us"),
    )
    s = spans.agg(
        F.sum("observed").cast("bigint").alias("d"),
        F.sum("exposure_us").cast("bigint").alias("tot_us"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    lam = F.col("d").cast("double") / (
        F.col("tot_us").cast("double") / 3600000000.0
    )
    return s.select(
        "n",
        F.col("d").alias("n_events"),
        (F.col("n") - F.col("d")).cast("bigint").alias("n_censored"),
        lam.alias("lambda_per_hour"),
        (F.log(F.lit(2.0)) / lam).alias("median_hours"),
        F.exp(-lam * 24.0).alias("surv_24h"),
    )


_NPART = 4

_WEDGES = """presence AS (
  SELECT DISTINCT event_type, epoch_us(ts) // 600000000 AS bkt, user_id
  FROM events
), sized AS (
  SELECT event_type, bkt FROM presence
  GROUP BY event_type, bkt HAVING COUNT(*) <= 30
), p AS (
  SELECT presence.* FROM presence JOIN sized USING (event_type, bkt)
), edges AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM p a JOIN p b
    ON a.event_type = b.event_type AND a.bkt = b.bkt AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
  HAVING COUNT(*) >= 2
)"""


@register(
    "graph_partition_conductance",
    oracle=f"""
WITH {_WEDGES},
tagged AS (
  SELECT u % {_NPART} AS pu, v % {_NPART} AS pv FROM edges
),
vol AS (
  SELECT part, SUM(cnt) AS vol FROM (
    SELECT pu AS part, COUNT(*) AS cnt FROM tagged GROUP BY pu
    UNION ALL
    SELECT pv AS part, COUNT(*) AS cnt FROM tagged GROUP BY pv
  ) GROUP BY part
),
cut AS (
  SELECT pu AS part, COUNT(*) AS c FROM tagged WHERE pu <> pv GROUP BY pu
  UNION ALL
  SELECT pv AS part, COUNT(*) AS c FROM tagged WHERE pu <> pv GROUP BY pv
),
cuts AS (
  SELECT part, SUM(c) AS cut_edges FROM cut GROUP BY part
),
tot AS (SELECT SUM(vol) AS vol_all FROM vol)
SELECT v.part,
       CAST(v.vol AS BIGINT) AS volume,
       CAST(COALESCE(c.cut_edges, 0) AS BIGINT) AS cut_edges,
       CAST((1000 * COALESCE(c.cut_edges, 0))
            // LEAST(v.vol, t.vol_all - v.vol) AS BIGINT)
         AS conductance_milli
FROM vol v LEFT JOIN cuts c ON c.part = v.part CROSS JOIN tot t
ORDER BY v.part
""",
    description=f"Partition conductance on the co-presence graph: for the "
    f"user_id mod {_NPART} partition, each block's cut edge-endpoints "
    "over min(volume, complement volume) — the community-quality metric "
    "(low conductance = good separation) that scores what "
    "graph_label_propagation and modularity siblings produce. The mod "
    "partition is a null model, so conductance lands near the random "
    "baseline BY CONSTRUCTION and the oracle certifies the exact "
    "integer counts (volumes, cuts) plus the milli-ratio. One edge "
    "build shared with the triangle/BFS family, then two counting "
    "aggregates over the edge list.",
    tags=("graph", "events"),
)
def graph_partition_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 600000000").alias(
            "bkt"
        ),
        "user_id",
    )
    presence = ev.distinct()
    sized = (
        presence.groupBy("event_type", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= 30)
        .select("event_type", "bkt")
    )
    p = presence.join(sized, ["event_type", "bkt"])
    a, b = p.alias("a"), p.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v"))
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= 2)
        .select(
            (F.col("u") % _NPART).alias("pu"),
            (F.col("v") % _NPART).alias("pv"),
        )
        .localCheckpoint()  # volumes and cuts both read it
    )
    vol = (
        edges.select(F.col("pu").alias("part"))
        .unionByName(edges.select(F.col("pv").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("vol"))
    )
    crossing = edges.filter(F.col("pu") != F.col("pv"))
    cuts = (
        crossing.select(F.col("pu").alias("part"))
        .unionByName(crossing.select(F.col("pv").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )
    tot = vol.agg(F.sum("vol").alias("vol_all"))
    return (
        vol.join(cuts, "part", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "part",
            F.col("vol").cast("bigint").alias("volume"),
            F.coalesce("cut_edges", F.lit(0)).cast("bigint").alias(
                "cut_edges"
            ),
            F.expr(
                "CAST((1000 * COALESCE(cut_edges, 0))"
                " div LEAST(vol, vol_all - vol) AS BIGINT)"
            ).alias("conductance_milli"),
        )
        
    )
