"""Hundred-forty-fourth wave: Ljung-Box whiteness test and a
tamper-evident audit hash chain.

  * agg_ljung_box — the portmanteau "is anything left in the
    residuals" test: autocorrelations of the hourly event-count series
    at lags 1..10 (pairwise-complete Pearson per lag, the engine's
    autocorrelation recipe), pooled into Q = n(n+2) Σ ρ_k²/(n-k).
    Per-lag sums are exact integer decimals; each ρ_k is one IEEE
    chain snapped to 9 dp; Q folds through exact decimals.
  * pipeline_audit_hash_chain — the compliance ledger: monthly batch
    digests (md5 over order-pinned row md5s) chained as
    h_i = md5(h_{i-1} || digest_i), so tampering with ANY historical
    batch breaks every subsequent link.  The chain is a string fold
    under the cross-engine contract; the head hash is the one value an
    auditor needs to pin the whole history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_LAGS = 10


def _ljung_oracle() -> str:
    lag_vals = ", ".join(
        f"({k}, LAG(x, {k}) OVER w)" for k in range(1, _LAGS + 1)
    )
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
  FROM events GROUP BY 1
),
n_tot AS (SELECT COUNT(*) AS n FROM hourly),
lagged AS (
  SELECT x, p.lag, p.y
  FROM (SELECT x, {", ".join(f"LAG(x, {k}) OVER w AS x{k}" for k in range(1, _LAGS + 1))}
        FROM hourly WINDOW w AS (ORDER BY h)) l,
       LATERAL (VALUES {", ".join(f"({k}, x{k})" for k in range(1, _LAGS + 1))})
         AS p(lag, y)
  WHERE p.y IS NOT NULL
),
sums AS (
  SELECT lag,
         CAST(COUNT(*) AS DOUBLE) AS np,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM lagged GROUP BY lag
),
rho AS (
  SELECT lag,
         CAST(round(
           (np * sxy - sx * sy)
           / (sqrt(np * sxx - sx * sx) * sqrt(np * syy - sy * sy)), 9)
           AS DECIMAL(18,9)) AS r9
  FROM sums
),
q AS (
  SELECT SUM(CAST(round(
           CAST(CAST(r9 AS VARCHAR) AS DOUBLE)
           * CAST(CAST(r9 AS VARCHAR) AS DOUBLE)
           / ((SELECT n FROM n_tot) - lag), 12) AS DECIMAL(18,12))) AS ssum,
         CAST(COUNT(*) AS BIGINT) AS n_lags
  FROM rho
)
SELECT n_lags,
       CAST((SELECT n FROM n_tot) AS BIGINT) AS n_obs,
       (SELECT n FROM n_tot) * ((SELECT n FROM n_tot) + 2.0)
         * CAST(CAST(ssum AS VARCHAR) AS DOUBLE) AS ljung_box_q
FROM q
"""


@register(
    "agg_ljung_box",
    oracle=_ljung_oracle(),
    description=f"Ljung-Box portmanteau whiteness test on the hourly "
    f"event-count series: pairwise-complete Pearson autocorrelations at "
    f"lags 1..{_LAGS} (the events_autocorrelation recipe — integer count "
    "sums, one IEEE chain per lag snapped to 9 dp), pooled as "
    "Q = n(n+2)·Σ ρ²/(n-k) with the per-lag terms snapped to 12-dp "
    "decimals before the exact sum. Q ~ chi²(10) under whiteness — the "
    "single number that says whether the anomaly/forecast residual "
    "family left structure on the table. One (lag) aggregate over the "
    "lag-exploded hourly series; 10 rows cross the final shuffle.",
    tags=("agg", "timeseries", "stats"),
)
def agg_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    n_tot = hourly.count()  # plan constant: series length
    w = Window.orderBy("h")
    lag_cols = [
        F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, _LAGS + 1)
    ]
    lagged = hourly.select("x", *lag_cols)
    pairs = lagged.select(
        "x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"), F.col(f"x{k}").alias("y")
                    )
                    for k in range(1, _LAGS + 1)
                ]
            )
        ).alias("p"),
    ).select("x", "p.lag", "p.y").filter(F.col("y").isNotNull())
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("double").alias("np"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    r = (
        F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (
        F.sqrt(F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("np") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    rho = sums.select(
        "lag", F.round(r, 9).cast("decimal(18,9)").alias("r9")
    )
    term = F.round(
        F.col("r9").cast("double")
        * F.col("r9").cast("double")
        / (F.lit(n_tot) - F.col("lag")),
        12,
    ).cast("decimal(18,12)")
    q = rho.agg(
        F.sum(term).alias("ssum"),
        F.count(F.lit(1)).cast("bigint").alias("n_lags"),
    )
    return q.select(
        "n_lags",
        F.lit(n_tot).cast("bigint").alias("n_obs"),
        (
            F.lit(float(n_tot))
            * (F.lit(float(n_tot)) + 2.0)
            * F.col("ssum").cast("double")
        ).alias("ljung_box_q"),
    )


@register(
    "pipeline_audit_hash_chain",
    oracle="""
WITH batches AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         md5(string_agg(
           md5(o_orderkey || '|' || o_custkey || '|' ||
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)),
           '' ORDER BY o_orderkey)) AS digest
  FROM orders GROUP BY 1
),
ordered AS (
  SELECT list(digest ORDER BY m) AS ds,
         list(strftime(m, '%Y-%m') ORDER BY m) AS ms
  FROM batches
),
chained AS (
  SELECT ms, ds,
    list_reduce(
      list_prepend('GENESIS', ds),
      (acc, x) -> md5(acc || x)
    ) AS head
  FROM ordered
)
SELECT CAST(len(ds) AS BIGINT) AS n_batches,
       ds[1] AS first_digest,
       ds[len(ds)] AS last_digest,
       head AS chain_head
FROM chained
""",
    description="Tamper-evident audit ledger: each monthly batch of "
    "orders collapses to an order-pinned digest (md5 over sorted row "
    "md5s — key, custkey, exact-decimal price), and digests chain as "
    "h_i = md5(h_{i-1} || digest_i) from a GENESIS seed, a string fold "
    "under the cross-engine contract. Editing ANY historical row "
    "changes its batch digest and therefore every later link — the "
    "chain head is the single value an auditor pins (tested: a 1-cent "
    "mutation flips the head). The blockchain-without-the-blockchain "
    "pattern compliance actually ships. Batch digests parallelize per "
    "month; only the final ~80-element fold is sequential, as the "
    "semantics demand.",
    tags=("pipeline", "quality", "iterative"),
)
def pipeline_audit_hash_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    row_md5 = F.md5(
        F.concat_ws(
            "|",
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        )
    )
    batches = (
        t(spark, sf_dir, "orders")
        .select(
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.struct("o_orderkey", row_md5.alias("rh")).alias("r"),
        )
        .groupBy("m")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("r")),
                        lambda s: s["rh"],
                    ),
                    "",
                )
            ).alias("digest")
        )
    )
    ordered = batches.select(
        F.struct("m", "digest").alias("e")
    ).agg(
        F.transform(
            F.array_sort(F.collect_list("e")), lambda s: s["digest"]
        ).alias("ds")
    )
    chained = ordered.select(
        "ds",
        F.aggregate(
            "ds", F.lit("GENESIS"), lambda acc, x: F.md5(F.concat(acc, x))
        ).alias("head"),
    )
    return chained.select(
        F.size("ds").cast("bigint").alias("n_batches"),
        F.element_at("ds", 1).alias("first_digest"),
        F.element_at("ds", F.size("ds")).alias("last_digest"),
        F.col("head").alias("chain_head"),
    )
