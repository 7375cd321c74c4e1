"""Fiftieth wave: cross-document duplicated-span extraction, sketch-merge
algebra, offline changepoint detection, linear-interpolation gap fill.

dedup_common_spans is the distributed approximation of suffix-array
substring dedup (Lee et al., "Deduplicating Training Data Makes Language
Models Better"): anchor k-gram matches between document pairs, then
consolidate same-offset runs into MAXIMAL shared spans with a
gaps-and-islands pass — variable-length exact substring duplication
without ever materializing a suffix array.  agg_kmv_union_merge proves the
sketch ALGEBRA (bottom-k sketches are min-merge unionable) that makes
sketches useful at 100 TB: per-partition sketches union without touching
raw data again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# ---------------------------------------------------------------------------
# Cross-document maximal duplicated spans
# ---------------------------------------------------------------------------

_SPAN_K = 8        # words per anchor gram
_SPAN_MIN_TOK = 12 # emit spans of at least this many shared tokens (≥5 grams)
_SPAN_DF_CAP = 10  # drop grams present in more than this many docs (skew cap)


@register(
    "dedup_common_spans",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), grams AS (
  SELECT doc_id, u.pos,
         substr(md5(array_to_string(tk[u.pos : u.pos + {_SPAN_K} - 1], ' ')),
                1, 16) AS gh
  FROM toks,
       LATERAL (SELECT UNNEST(range(1, len(tk) - {_SPAN_K} + 2)) AS pos) u
  WHERE len(tk) >= {_SPAN_K}
), df AS (
  SELECT gh FROM (SELECT gh, COUNT(DISTINCT doc_id) AS d FROM grams GROUP BY gh)
  WHERE d BETWEEN 2 AND {_SPAN_DF_CAP}
), g AS (
  SELECT grams.* FROM grams JOIN df USING (gh)
), hits AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.pos - b.pos AS delta, a.pos AS pa
  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
), runs AS (
  SELECT doc_a, doc_b, delta, pa,
         pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, delta
                                 ORDER BY pa) AS grp
  FROM hits
)
SELECT doc_a, doc_b,
       CAST(MIN(pa) AS BIGINT) AS start_a,
       CAST(MIN(pa) - delta AS BIGINT) AS start_b,
       CAST(COUNT(*) + {_SPAN_K} - 1 AS BIGINT) AS span_tokens
FROM runs
GROUP BY doc_a, doc_b, delta, grp
HAVING COUNT(*) + {_SPAN_K} - 1 >= {_SPAN_MIN_TOK}
ORDER BY doc_a, doc_b, start_a
""",
    description="Cross-document MAXIMAL duplicated-span extraction — the "
    "distributed stand-in for suffix-array substring dedup (Lee et al. "
    f"2022): every {_SPAN_K}-word gram is hashed with its position, grams "
    "shared by 2+ documents equi-join into per-pair position hits, and a "
    "gaps-and-islands pass (pos − row_number constant within a run) "
    "consolidates same-offset hits into maximal shared spans of "
    f"≥{_SPAN_MIN_TOK} tokens with both start offsets — exactly what a "
    "span-level dedup/redaction pass consumes (curation_span_dedup's "
    "fixed blocks are its cheaper cousin). Scale shape: grams with "
    "document frequency 1 are pruned BEFORE the self-join (they cannot "
    f"match — at real corpus scale that is ~all of them) and a df cap of "
    f"{_SPAN_DF_CAP} bounds the join's bucket size against boilerplate "
    "skew, the same max_df control as dedup_ngram_jaccard; shuffle is "
    "O(shared grams), never O(docs²), and the islands window partitions "
    "on (pair, offset) so no single key grows with the corpus.",
    tags=("llm", "dedup", "text"),
)
def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from news_ingestion_data_pipeline_spark.tables import spread

    toks = F.split("text", " ")
    docs = spread(t(spark, sf_dir, "documents")).select("doc_id", toks.alias("tk"))
    # The size(tk) >= K guard lives INSIDE the gram expression (short docs
    # yield an empty array that posexplode drops) rather than as a Filter:
    # as a Filter, predicate pushdown substituted `tk` with split(text)
    # and evaluated it below the round-robin exchange — the whole-corpus
    # tokenization ran serially in the one-task scan stage, three plan
    # copies of it (r11 pushdown audit). Identical rows either way; the
    # filter was barely selective (docs with < 8 words).
    grams = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.when(
                    F.size("tk") >= _SPAN_K,
                    F.transform(
                        F.sequence(F.lit(1), F.size("tk") - _SPAN_K + 1),
                        lambda i: F.substring(
                            F.md5(F.array_join(F.slice("tk", i, _SPAN_K), " ")),
                            1,
                            16,
                        ),
                    ),
                ).otherwise(F.expr("CAST(array() AS array<string>)")),
            ).alias("pos0", "gh"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")
    )
    df_ok = (
        grams.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= _SPAN_DF_CAP))
        .select("gh")
    )
    g = grams.join(df_ok, "gh")
    a, b = g.alias("a"), g.alias("b")
    hits = a.join(
        b, (F.col("a.gh") == F.col("b.gh")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        (F.col("a.pos") - F.col("b.pos")).alias("delta"),
        F.col("a.pos").alias("pa"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "delta").orderBy("pa")
    runs = hits.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        runs.groupBy("doc_a", "doc_b", "delta", "grp")
        .agg(F.min("pa").alias("mpa"), F.count(F.lit(1)).alias("n_grams"))
        .select(
            "doc_a",
            "doc_b",
            F.col("mpa").cast("bigint").alias("start_a"),
            (F.col("mpa") - F.col("delta")).cast("bigint").alias("start_b"),
            (F.col("n_grams") + _SPAN_K - 1).cast("bigint").alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= _SPAN_MIN_TOK)
        
    )


# ---------------------------------------------------------------------------
# KMV sketch-merge: per-source sketches union into a corpus sketch
# ---------------------------------------------------------------------------

_KMVM_K = 32
_HEX_DEN = float(1 << 60)  # 15 hex chars = 60 bits


def _h01(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(_HEX_DEN)
    )


def _sql_h01(expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"
        f" / {_HEX_DEN!r}"
    )


@register(
    "agg_kmv_union_merge",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT event_type,
         CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d') AS k
  FROM events
), hashed AS (
  SELECT event_type, k, {_sql_h01('k')} AS h FROM keys
), per_type AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_seen
  FROM hashed
), sketches AS (
  SELECT event_type, h, rn, n_seen FROM per_type WHERE rn <= {_KMVM_K}
), type_est AS (
  SELECT event_type,
         MAX(n_seen) AS n_seen, MAX(h) AS h_k, COUNT(*) AS in_sketch
  FROM sketches GROUP BY event_type
), merged_ranked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM sketches)
), merged AS (
  SELECT MAX(h) AS h_k, COUNT(*) AS in_sketch
  FROM merged_ranked WHERE rn <= {_KMVM_K}
), exact_all AS (
  SELECT COUNT(*) AS n FROM (SELECT DISTINCT k FROM keys)
), exact_type AS (
  SELECT event_type, COUNT(*) AS n FROM keys GROUP BY event_type
), rows_out AS (
  SELECT t.event_type AS source,
         CAST(e.n AS BIGINT) AS exact_distinct,
         CASE WHEN t.n_seen < {_KMVM_K} THEN CAST(t.n_seen AS DOUBLE)
              ELSE ({_KMVM_K} - 1) / t.h_k END AS est
  FROM type_est t JOIN exact_type e USING (event_type)
  UNION ALL
  SELECT 'ALL(merged)' AS source,
         CAST(ea.n AS BIGINT) AS exact_distinct,
         CASE WHEN m.in_sketch < {_KMVM_K} THEN CAST(m.in_sketch AS DOUBLE)
              ELSE ({_KMVM_K} - 1) / m.h_k END AS est
  FROM merged m CROSS JOIN exact_all ea
)
SELECT source, exact_distinct,
       round(est, 4) AS kmv_estimate,
       round(abs(est - exact_distinct) / exact_distinct, 4) AS rel_error
FROM rows_out ORDER BY source
""",
    description="KMV sketch-merge algebra: bottom-k sketches of distinct "
    "user-days are built PER EVENT TYPE, then the corpus-wide estimate "
    "comes from min-merging the per-type sketches (union the k-sets, "
    "re-rank, keep the k smallest) — the raw data is touched exactly "
    "once, which is the property that makes sketches composable across "
    "partitions, days and clusters at 100 TB (per-day sketches roll up "
    "into monthly cardinalities for free). Union of bottom-k sets is a "
    "superset of the union's bottom-k, so the merged estimator is "
    "EXACTLY what a single pass over the union would produce — the "
    "oracle certifies both every per-type sketch and the merge. Exact "
    "distinct counts ride along as the verification baseline; estimator "
    "is (k−1)/h_(k) per Bar-Yossef et al. (2002), seedless md5 hashing "
    "as in agg_kmv_distinct.",
    tags=("agg", "sketch", "approx"),
)
def agg_kmv_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = (
        t(spark, sf_dir, "events")
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
    hashed = keys.select("event_type", "k", _h01(F.col("k")).alias("h"))
    wt = Window.partitionBy("event_type").orderBy("h")
    per_type = hashed.select(
        "event_type",
        "h",
        F.row_number().over(wt).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_seen"),
    )
    sketches = per_type.filter(F.col("rn") <= _KMVM_K)
    type_est = sketches.groupBy("event_type").agg(
        F.max("n_seen").alias("n_seen"),
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).alias("in_sketch"),
    )
    merged = (
        sketches.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") <= _KMVM_K)
        .agg(F.max("h").alias("h_k"), F.count(F.lit(1)).alias("in_sketch"))
    )
    exact_type = keys.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    exact_all = keys.select("k").distinct().agg(F.count(F.lit(1)).alias("n"))
    est_t = F.when(
        F.col("n_seen") < _KMVM_K, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(_KMVM_K - 1)) / F.col("h_k"))
    rows_t = type_est.join(exact_type, "event_type").select(
        F.col("event_type").alias("source"),
        F.col("n").cast("bigint").alias("exact_distinct"),
        est_t.alias("est"),
    )
    est_m = F.when(
        F.col("in_sketch") < _KMVM_K, F.col("in_sketch").cast("double")
    ).otherwise(F.lit(float(_KMVM_K - 1)) / F.col("h_k"))
    rows_m = merged.crossJoin(exact_all).select(
        F.lit("ALL(merged)").alias("source"),
        F.col("n").cast("bigint").alias("exact_distinct"),
        est_m.alias("est"),
    )
    out = rows_t.unionByName(rows_m)
    return out.select(
        "source",
        "exact_distinct",
        F.round("est", 4).alias("kmv_estimate"),
        F.round(
            F.abs(F.col("est") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# Offline changepoint: one binary-segmentation step
# ---------------------------------------------------------------------------


@register(
    "events_changepoint_binseg",
    oracle="""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(20,10))) AS s,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS ss
  FROM events GROUP BY 1
), pre AS (
  SELECT day, n, s, ss,
         SUM(n) OVER w AS cn,
         SUM(s) OVER w AS cs,
         SUM(ss) OVER w AS css,
         SUM(n) OVER () AS tn,
         SUM(s) OVER () AS ts_,
         SUM(ss) OVER () AS tss,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS ndays
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), scored AS (
  SELECT day, cn, tn - cn AS rn_cnt,
         CAST(CAST(cs AS VARCHAR) AS DOUBLE) AS cs_d,
         CAST(CAST(ts_ - cs AS VARCHAR) AS DOUBLE) AS rs_d,
         CAST(CAST(css AS VARCHAR) AS DOUBLE)
           - CAST(CAST(cs AS VARCHAR) AS DOUBLE)
             * CAST(CAST(cs AS VARCHAR) AS DOUBLE) / cn AS sse_l,
         CAST(CAST(tss - css AS VARCHAR) AS DOUBLE)
           - CAST(CAST(ts_ - cs AS VARCHAR) AS DOUBLE)
             * CAST(CAST(ts_ - cs AS VARCHAR) AS DOUBLE) / (tn - cn) AS sse_r,
         CAST(CAST(tss AS VARCHAR) AS DOUBLE)
           - CAST(CAST(ts_ AS VARCHAR) AS DOUBLE)
             * CAST(CAST(ts_ AS VARCHAR) AS DOUBLE) / tn AS sse_total
  FROM pre WHERE rn < ndays
)
SELECT day AS split_day,
       CAST(cn AS BIGINT) AS n_left, CAST(rn_cnt AS BIGINT) AS n_right,
       round(cs_d / cn, 6) AS mean_left,
       round(rs_d / rn_cnt, 6) AS mean_right,
       round(sse_l + sse_r, 6) AS sse_split,
       round(sse_total, 6) AS sse_total,
       round(sse_total - (sse_l + sse_r), 6) AS gain
FROM scored
ORDER BY sse_l + sse_r, split_day
LIMIT 1
""",
    description="One binary-segmentation step of offline changepoint "
    "detection: the split day minimizing total within-segment SSE over "
    "the daily mean-value series — the classic least-squares changepoint "
    "(the building block CBS/PELT iterate). Every candidate split is "
    "scored from PREFIX SUMS of (n, Σv, Σv²) — one pass builds the "
    "cumulative table, so scoring all n−1 splits costs O(n), not O(n²) "
    "rescans; the same prefix-sum trick is what makes this scale to "
    "billions of rows (the heavy lifting is the daily pre-aggregate, a "
    "single partial-agg shuffle; the candidate scan is #days rows). "
    "Decimal power sums keep SSE exact until two final IEEE divisions; "
    "(sse, day) total order makes the argmin deterministic. CUSUM "
    "(events_cusum_drift) is the ONLINE sibling; this is the offline "
    "retrospective cut.",
    tags=("events", "stats", "timeseries"),
)
def events_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    v6 = F.col("value").cast("decimal(18,6)")
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,10)")).alias("s"),
            F.sum(v6 * v6).alias("ss"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pre = daily.select(
        "day",
        F.sum("n").over(w).alias("cn"),
        F.sum("s").over(w).alias("cs"),
        F.sum("ss").over(w).alias("css"),
        F.sum("n").over(wall).alias("tn"),
        F.sum("s").over(wall).alias("ts_"),
        F.sum("ss").over(wall).alias("tss"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("ndays"),
    ).filter(F.col("rn") < F.col("ndays"))
    cs_d = F.col("cs").cast("double")
    rs_d = (F.col("ts_") - F.col("cs")).cast("double")
    rcnt = F.col("tn") - F.col("cn")
    sse_l = F.col("css").cast("double") - cs_d * cs_d / F.col("cn")
    sse_r = (F.col("tss") - F.col("css")).cast("double") - rs_d * rs_d / rcnt
    sse_total = (
        F.col("tss").cast("double")
        - F.col("ts_").cast("double") * F.col("ts_").cast("double") / F.col("tn")
    )
    scored = pre.select(
        F.col("day").alias("split_day"),
        F.col("cn").cast("bigint").alias("n_left"),
        rcnt.cast("bigint").alias("n_right"),
        F.round(cs_d / F.col("cn"), 6).alias("mean_left"),
        F.round(rs_d / rcnt, 6).alias("mean_right"),
        F.round(sse_l + sse_r, 6).alias("sse_split"),
        F.round(sse_total, 6).alias("sse_total"),
        F.round(sse_total - (sse_l + sse_r), 6).alias("gain"),
        (sse_l + sse_r).alias("_key"),
    )
    return scored.orderBy("_key", "split_day").limit(1).drop("_key")


# ---------------------------------------------------------------------------
# Linear-interpolation gap fill (the LOCF sibling)
# ---------------------------------------------------------------------------


@register(
    "window_gap_fill_interp",
    oracle="""
WITH scoped AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         CAST(value AS DECIMAL(20,10)) AS v
  FROM events WHERE user_id % 200 = 0
), hourly AS (
  SELECT user_id, h, CAST(CAST(SUM(v) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_value
  FROM scoped GROUP BY user_id, h
), spans AS (
  SELECT user_id, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM spans
), joined AS (
  SELECT g.user_id, g.h, hr.avg_value,
         epoch(g.h) AS eh,
         last_value(CASE WHEN hr.avg_value IS NOT NULL
                         THEN {'e': epoch(g.h), 'v': hr.avg_value} END
                    IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
         first_value(CASE WHEN hr.avg_value IS NOT NULL
                          THEN {'e': epoch(g.h), 'v': hr.avg_value} END
                     IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
  FROM grid g LEFT JOIN hourly hr ON hr.user_id = g.user_id AND hr.h = g.h
)
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, avg_value,
       round(CASE WHEN prev.e = nxt.e THEN prev.v
            ELSE prev.v + (nxt.v - prev.v)
                 * (CAST(eh - prev.e AS DOUBLE) / CAST(nxt.e - prev.e AS DOUBLE))
       END, 6) AS value_interp,
       CAST(avg_value IS NULL AS BOOLEAN) AS was_gap
FROM joined
""",
    description="Gap filling by LINEAR INTERPOLATION between the nearest "
    "real observations — the resampling sibling of window_gap_fill_locf "
    "(LOCF holds, interp slopes; sensor/metric pipelines want both). "
    "Same scaffold: densify each user's hourly series over its own span "
    "with a generated grid, left-join observations, then ONE window pass "
    "each way carrying (epoch, value) structs through last/first "
    "IGNORE NULLS — the struct trick fetches the neighbor's position and "
    "value in a single window function, so the whole fill is still one "
    "user_id shuffle + two in-partition scans (no self-join on "
    "inequality, which is the quadratic trap here). Interpolation weight "
    "is an exact integer epoch ratio; observation rows degenerate to "
    "their own value (prev = next guard).",
    tags=("window", "timeseries"),
)
def window_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 200 == 0)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value")
        )
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    obs = F.when(
        F.col("avg_value").isNotNull(),
        F.struct(F.unix_timestamp("h").alias("e"), F.col("avg_value").alias("v")),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    joined = (
        grid.join(hourly, ["user_id", "h"], "left")
        .withColumn("eh", F.unix_timestamp("h"))
        .withColumn("prev", F.last(obs, ignorenulls=True).over(w_prev))
        .withColumn("nxt", F.first(obs, ignorenulls=True).over(w_next))
    )
    frac = (F.col("eh") - F.col("prev.e")).cast("double") / (
        F.col("nxt.e") - F.col("prev.e")
    ).cast("double")
    interp = F.when(F.col("prev.e") == F.col("nxt.e"), F.col("prev.v")).otherwise(
        F.col("prev.v") + (F.col("nxt.v") - F.col("prev.v")) * frac
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "avg_value",
        F.round(interp, 6).alias("value_interp"),
        F.col("avg_value").isNull().alias("was_gap"),
    )
