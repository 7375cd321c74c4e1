"""Hundred-twenty-fourth wave: Holt-Winters seasonal smoothing and
multiline-CSV ingestion.

  * orders_holt_winters_weekly — the seasonal (triple) upgrade of
    events_holt_forecast: additive Holt-Winters over daily order
    counts with a 7-slot seasonal vector riding in the fold state, so
    level, trend AND weekly shape update in one pass.  9-element
    DOUBLE accumulator under the cross-engine fold contract.
  * scan_csv_multiline — the CSV edge every feed eventually hits:
    fields containing NEWLINES.  Documents are rewritten with
    real linebreaks inside the text field, landed as quoted CSV, and
    re-read with Spark's multiLine parser; md5 certificates prove no
    record was split or truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t
from news_ingestion_data_pipeline_spark.scratch import scratch_root

_A, _B, _G = "0.2", "0.1", "0.3"


@register(
    "orders_holt_winters_weekly",
    oracle=f"""
WITH daily AS (
  SELECT epoch(o_orderdate)::BIGINT // 86400 AS day, COUNT(*) AS c
  FROM orders GROUP BY 1
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
grid AS (
  SELECT g.day, COALESCE(daily.c, 0) AS c, g.day % 7 AS dow
  FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds) g
  LEFT JOIN daily ON daily.day = g.day
),
series AS (
  SELECT list([CAST(c AS DOUBLE), CAST(dow AS DOUBLE)] ORDER BY day) AS xs
  FROM grid
),
folded AS (
  SELECT len(xs) AS n_days,
    list_reduce(
      list_prepend([xs[1][1], 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], xs),
      (acc, x) -> list_transform(range(1, 10), i ->
        CASE WHEN i = 1 THEN
          {_A} * (x[1] - acc[CAST(x[2] AS BIGINT) + 3])
            + (1.0 - {_A}) * (acc[1] + acc[2])
        WHEN i = 2 THEN
          {_B} * (({_A} * (x[1] - acc[CAST(x[2] AS BIGINT) + 3])
                   + (1.0 - {_A}) * (acc[1] + acc[2])) - acc[1])
            + (1.0 - {_B}) * acc[2]
        WHEN i = CAST(x[2] AS BIGINT) + 3 THEN
          {_G} * (x[1] - ({_A} * (x[1] - acc[CAST(x[2] AS BIGINT) + 3])
                          + (1.0 - {_A}) * (acc[1] + acc[2])))
            + (1.0 - {_G}) * acc[CAST(x[2] AS BIGINT) + 3]
        ELSE acc[i] END)
    ) AS st
  FROM series
)
SELECT g.dow,
       CAST(n_days AS BIGINT) AS n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[CAST(g.dow AS BIGINT) + 3], 6) AS seasonal,
       round(st[1] + ((g.dow - (SELECT (d1 + 1) % 7 FROM bounds) + 7) % 7 + 1)
                     * st[2]
             + st[CAST(g.dow AS BIGINT) + 3], 6) AS forecast_next
FROM folded, (SELECT unnest(range(0, 7)) AS dow) g
ORDER BY dow
""",
    description="Additive Holt-Winters (level + trend + 7-slot weekly "
    "seasonality, alpha/beta/gamma = 0.2/0.1/0.3) over zero-filled daily "
    "order counts: the coupled update runs as ONE fold whose 9-element "
    "DOUBLE accumulator carries [l, b, s0..s6] and each element carries "
    "[count, dow], so only the active season slot rewrites per step — "
    "the cross-engine fold contract (Holt/EWMA/Croston precedent) "
    "extended to vector state with data-dependent indexing. Output: each "
    "weekday's final seasonal and its next-occurrence forecast "
    "l + h·b + s_dow. Scale: series length is calendar-bounded; the "
    "corpus-sized work is one day-count aggregate.",
    tags=("orders", "timeseries", "forecast"),
)
def orders_holt_winters_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b_, g = float(_A), float(_B), float(_G)
    daily = (
        t(spark, sf_dir, "orders")
        .select(
            F.expr(
                "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
        .join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("c", F.lit(0)).cast("double").alias("c"),
            (F.col("day") % 7).cast("double").alias("dow"),
        )
    )
    series = grid.select(
        F.struct("day", "c", "dow").alias("x")
    ).agg(
        F.transform(
            F.array_sort(F.collect_list("x")),
            lambda s: F.array(s["c"], s["dow"]),
        ).alias("xs")
    )

    def step(acc, x):
        xv = F.element_at(x, 1)
        slot = (F.element_at(x, 2).cast("int") + 3)
        s_prev = F.element_at(acc, slot)
        l_prev = F.element_at(acc, 1)
        b_prev = F.element_at(acc, 2)
        l_new = a * (xv - s_prev) + (1.0 - a) * (l_prev + b_prev)
        return F.transform(
            F.sequence(F.lit(1), F.lit(9)),
            lambda i: F.when(i == 1, l_new)
            .when(
                i == 2,
                b_ * (l_new - l_prev) + (1.0 - b_) * b_prev,
            )
            .when(i == slot, g * (xv - l_new) + (1.0 - g) * s_prev)
            .otherwise(F.element_at(acc, i.cast("int"))),
        )

    init = F.concat(
        F.array(F.element_at(F.element_at("xs", 1), 1)),
        F.array_repeat(F.lit(0.0), 8),
    )
    folded = series.select(
        F.size("xs").alias("n_days"),
        F.aggregate("xs", init, step).alias("st"),
    ).crossJoin(F.broadcast(bounds))
    dows = folded.sparkSession.range(7).select(
        F.col("id").cast("bigint").alias("dow")
    )
    out = folded.crossJoin(F.broadcast(dows))
    h = (F.col("dow") - (F.col("d1") + 1) % 7 + 7) % 7 + 1
    return out.select(
        "dow",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.element_at("st", 1), 6).alias("level"),
        F.round(F.element_at("st", 2), 6).alias("trend"),
        F.round(
            F.element_at("st", (F.col("dow") + 3).cast("int")), 6
        ).alias("seasonal"),
        F.round(
            F.element_at("st", 1)
            + h * F.element_at("st", 2)
            + F.element_at("st", (F.col("dow") + 3).cast("int")),
            6,
        ).alias("forecast_next"),
    )


_ROOT = scratch_root("llm124")


@register(
    "scan_csv_multiline",
    oracle="""
WITH rewritten AS (
  SELECT doc_id,
         lang,
         replace(text, ' ', chr(10)) AS mtext
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(length(mtext) - length(replace(mtext, chr(10), '')))
            AS BIGINT) AS n_newlines,
       md5(string_agg(md5(mtext), '' ORDER BY doc_id)) AS content_md5
FROM rewritten
GROUP BY lang
ORDER BY lang
""",
    description="Multiline-CSV ingestion: every document's text is "
    "rewritten with REAL embedded newlines (space → LF), landed as "
    "quoted CSV, and re-read with Spark's multiLine parser — the quoted-"
    "linebreak edge case that silently shreds records when a reader "
    "splits on raw newlines. Certificates: per-language row counts, "
    "total embedded-newline count, and an order-pinned md5-of-md5s over "
    "the round-tripped text, replayed by the oracle from the original "
    "column — one split record or lost linebreak anywhere hash-fails. "
    "Scale note: multiLine=true forfeits intra-file split parallelism "
    "BY DESIGN (quoted newlines make split points ambiguous) — the "
    "documented trade is many medium files over few huge ones.",
    tags=("scan", "pipeline"),
)
def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{_ROOT}/ml_{sfx}"
    shutil.rmtree(path, ignore_errors=True)

    (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.regexp_replace("text", " ", "\n").alias("mtext"),
        )
        .write.option("header", "true")
        .option("quoteAll", "true")
        .csv(path)
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .schema("doc_id long, lang string, mtext string")
        .csv(path)
    )
    per_doc = back.select(
        "doc_id",
        "lang",
        F.md5("mtext").alias("h"),
        (
            F.length("mtext")
            - F.length(F.regexp_replace("mtext", "\n", ""))
        ).alias("nl"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("nl").alias("n_newlines"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "h"))
                        ),
                        lambda s: s["h"],
                    ),
                    "",
                )
            ).alias("content_md5"),
        )
        
    )
