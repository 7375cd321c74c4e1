"""Ninetieth wave: unicode crawl hygiene, homoglyph-skeleton dedup, and
raw-access-log grok parsing.

Three stages every crawl/ingest pipeline runs that the registry didn't
cover yet:

  * unicode cleaning — crawled HTML is full of zero-width characters
    (ZWSP/ZWNJ/ZWJ/BOM pasted by CMSes), NBSP-for-space substitutions,
    and accented variants; exact dedup and tokenization are both wrong
    until these are folded.  (The reference lower-cases and strips
    whitespace only — `PhocusWire/PhocusWireSource.py:155-160` trims the
    title — so this is the Spark-scale generalization of that cleanup.)
  * homoglyph (confusable) skeletons — spoofed author handles / domains
    substitute Cyrillic or accented lookalikes; mapping every handle to
    its Latin skeleton and grouping is how you catch them.  Unicode
    TR#39's "skeleton" algorithm, expressed as one translate() + one
    hash aggregate.
  * access-log grok — the classic semi-structured ETL: one raw text
    line per request, regexp-extracted into typed columns, then
    aggregated.  At 100 TB this is a pure map stage (regex inside
    WholeStageCodegen) feeding a map-side-combinable hash aggregate;
    no shuffle carries the raw line.

All noise is synthesized deterministically from doc_id/event_id
residues (same technique as wave 89's raw URLs) so the DuckDB oracle
reproduces it character-for-character.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# zero-width characters a crawl drags in: ZWSP, ZWNJ, ZWJ, BOM
_ZW = "​‌‍﻿"
_NBSP = " "
#: lowercase diacritic fold (applied AFTER lower())
_ACC_FROM = "àáâãäèéêëìíîïòóôõöùúûüçñ"
_ACC_TO = "aaaaaeeeeiiiiooooouuuucn"


@register(
    "text_unicode_clean",
    oracle=f"""
WITH noisy AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 4 = 0 THEN 'Tàblé{_ZW[0]} ' || text
           WHEN doc_id % 4 = 1 THEN translate(text, ' ', '{_NBSP}')
           WHEN doc_id % 4 = 2 THEN upper(text) || '{_ZW[2]}'
           ELSE text
         END AS raw
  FROM documents
), cleaned AS (
  SELECT doc_id, raw,
         translate(lower(raw),
                   '{_NBSP}{_ACC_FROM}{_ZW}',
                   ' {_ACC_TO}') AS clean
  FROM noisy
)
SELECT doc_id,
       (raw <> clean) AS changed,
       CAST(length(raw) - length(translate(raw, '{_ZW}', '')) AS BIGINT)
         AS n_zero_width,
       CAST(length(raw) - length(clean) AS BIGINT) AS n_chars_removed,
       md5(clean) AS clean_md5
FROM cleaned
ORDER BY doc_id
""",
    description="Unicode crawl hygiene — fold the noise classes real "
    "crawled text carries before ANY dedup or tokenization: strip "
    "zero-width characters (ZWSP/ZWNJ/ZWJ/BOM), normalize NBSP to "
    "space, lowercase, and fold Latin diacritics — one translate() "
    "after lower(), entirely inside WholeStageCodegen. Noise is "
    "injected deterministically by doc_id residue (accented+ZWSP "
    "prefix / NBSP-for-space / uppercase+ZWJ) so the oracle rebuilds "
    "it exactly; outputs per-doc changed flag, zero-width count, "
    "removed-char count, and md5 of the cleaned text. At 100 TB this "
    "is a pure map stage — no shuffle, no UDF, and downstream exact "
    "dedup keys on clean_md5 instead of the raw bytes.",
    tags=("text", "curation", "llm"),
)
def text_unicode_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    raw = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(f"Tàblé{_ZW[0]} "), F.col("text")),
        )
        .when(F.col("doc_id") % 4 == 1, F.translate("text", " ", _NBSP))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.upper("text"), F.lit(_ZW[2])),
        )
        .otherwise(F.col("text"))
    )
    n = d.select("doc_id", raw.alias("raw"))
    clean = F.translate(
        F.lower("raw"), _NBSP + _ACC_FROM + _ZW, " " + _ACC_TO
    )
    return (
        n.select(
            "doc_id",
            (F.col("raw") != clean).alias("changed"),
            (
                F.length("raw") - F.length(F.translate("raw", _ZW, ""))
            )
            .cast("bigint")
            .alias("n_zero_width"),
            (F.length("raw") - F.length(clean))
            .cast("bigint")
            .alias("n_chars_removed"),
            F.md5(clean).alias("clean_md5"),
        )
        
    )


#: Cyrillic lookalikes for a-c-e-o-p (U+0430,0441,0435,043E,0440)
_CYR = "асеор"
_LAT = "aceop"
#: diacritic spoof used by residue class 2
_DIA_FROM = "àçèô"
_DIA_TO = "aceo"


@register(
    "dedup_homoglyph_skeleton",
    oracle=f"""
WITH handles AS (
  SELECT doc_id,
         CASE
           WHEN doc_id % 5 = 1
             THEN translate(source || '_u' || CAST(doc_id % 17 AS VARCHAR),
                            '{_LAT}', '{_CYR}')
           WHEN doc_id % 5 = 2
             THEN translate(source || '_u' || CAST(doc_id % 17 AS VARCHAR),
                            '{_DIA_TO}', '{_DIA_FROM}')
           ELSE source || '_u' || CAST(doc_id % 17 AS VARCHAR)
         END AS handle
  FROM documents
), skel AS (
  SELECT doc_id, handle,
         translate(lower(handle),
                   '{_CYR}{_DIA_FROM}',
                   '{_LAT}{_DIA_TO}') AS skeleton
  FROM handles
)
SELECT skeleton,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT handle) AS BIGINT) AS n_variants,
       (COUNT(DISTINCT handle) > 1) AS spoof_suspect,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
FROM skel
GROUP BY skeleton
ORDER BY skeleton
""",
    description="Homoglyph (Unicode-confusable) skeleton dedup — the "
    "spoof-detection stage of account/author/domain hygiene: map every "
    "handle to its Latin skeleton (Unicode TR#39's confusable fold, "
    "here Cyrillic а/с/е/о/р and accented à/ç/è/ô lookalikes) with one "
    "translate(), then group by skeleton; a skeleton with >1 distinct "
    "raw variant is a spoof suspect. Handles are synthesized from "
    "(source, doc_id%17) with lookalike substitutions injected by "
    "doc_id residue, so the oracle reproduces every variant. Shape: "
    "map + one hash aggregate on the skeleton key — identical to exact "
    "dedup at 100 TB, map-side combinable, no skew beyond genuinely "
    "popular handles.",
    tags=("dedup", "text", "curation"),
)
def dedup_homoglyph_skeleton(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    base = F.concat(
        F.col("source"), F.lit("_u"), (F.col("doc_id") % 17).cast("string")
    )
    handle = (
        F.when(F.col("doc_id") % 5 == 1, F.translate(base, _LAT, _CYR))
        .when(F.col("doc_id") % 5 == 2, F.translate(base, _DIA_TO, _DIA_FROM))
        .otherwise(base)
    )
    skel = F.translate(
        F.lower("handle"), _CYR + _DIA_FROM, _LAT + _DIA_TO
    )
    return (
        d.select("doc_id", handle.alias("handle"))
        .select("doc_id", "handle", skel.alias("skeleton"))
        .groupBy("skeleton")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("handle").cast("bigint").alias("n_variants"),
            (F.countDistinct("handle") > 1).alias("spoof_suspect"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        
    )


_LOG_RE = r'^(\d+\.\d+\.\d+\.\d+) - (\S+) \[([^\]]+)\] "(\w+) ([^ ]+) HTTP/1\.1" (\d{3}) (\d+)$'


@register(
    "scan_weblog_grok",
    oracle=r"""
WITH lines AS (
  SELECT
    '10.' || CAST(user_id % 200 AS VARCHAR)
    || '.' || CAST(event_id % 250 AS VARCHAR)
    || '.' || CAST((event_id * 7) % 250 AS VARCHAR)
    || ' - u' || CAST(user_id AS VARCHAR)
    || ' [' || strftime(ts, '%d/%m/%Y:%H:%M:%S') || ']'
    || ' "GET /' || event_type || '/p' || CAST(event_id % 100 AS VARCHAR)
    || ' HTTP/1.1" '
    || CAST(CASE WHEN event_type = 'error'
                 THEN CASE WHEN event_id % 2 = 0 THEN 500 ELSE 404 END
                 WHEN event_id % 17 = 0 THEN 301
                 ELSE 200 END AS VARCHAR)
    || ' ' || CAST(CAST(floor(value * 10) AS BIGINT) AS VARCHAR) AS line
  FROM events
), parsed AS (
  SELECT
    regexp_extract(line, '^(\d+\.\d+\.\d+\.\d+) - (\S+) \[([^\]]+)\] "(\w+) ([^ ]+) HTTP/1\.1" (\d{3}) (\d+)$', 1) AS ip,
    regexp_extract(line, '^(\d+\.\d+\.\d+\.\d+) - (\S+) \[([^\]]+)\] "(\w+) ([^ ]+) HTTP/1\.1" (\d{3}) (\d+)$', 2) AS request_user,
    regexp_extract(line, '^(\d+\.\d+\.\d+\.\d+) - (\S+) \[([^\]]+)\] "(\w+) ([^ ]+) HTTP/1\.1" (\d{3}) (\d+)$', 5) AS path,
    regexp_extract(line, '^(\d+\.\d+\.\d+\.\d+) - (\S+) \[([^\]]+)\] "(\w+) ([^ ]+) HTTP/1\.1" (\d{3}) (\d+)$', 6) AS status,
    CAST(regexp_extract(line, '^(\d+\.\d+\.\d+\.\d+) - (\S+) \[([^\]]+)\] "(\w+) ([^ ]+) HTTP/1\.1" (\d{3}) (\d+)$', 7) AS BIGINT) AS n_bytes
  FROM lines
)
SELECT substr(status, 1, 1) || 'xx' AS status_class,
       regexp_extract(path, '^/([^/]+)', 1) AS top_path,
       CAST(COUNT(*) AS BIGINT) AS n_requests,
       CAST(COUNT(DISTINCT ip) AS BIGINT) AS n_ips,
       CAST(COUNT(DISTINCT request_user) AS BIGINT) AS n_users,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM parsed
GROUP BY 1, 2
ORDER BY status_class, top_path
""",
    description="Grok-style access-log parse — the classic "
    "semi-structured ETL stage: synthesize one Apache-combined-format "
    "text line per event (ip from id residues, numeric timestamp, "
    "method/path from event_type, status from error class and "
    "residues, bytes from value), then regexp-extract it back into "
    "typed columns and aggregate requests/distinct-ips/users/bytes by "
    "(status_class, top-level path). The parse is the point: every "
    "field comes out of ONE anchored regex evaluated inside "
    "WholeStageCodegen — at 100 TB the raw line never crosses a "
    "shuffle; only the small (status_class, path) aggregate does, and "
    "it is map-side combinable. The same plan reads "
    "spark.read.text(access.log) in production — the line synthesis "
    "here just makes the fixture oracle-reproducible.",
    tags=("scan", "text", "pipeline"),
)
def scan_weblog_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    status = F.when(
        F.col("event_type") == "error",
        F.when(F.col("event_id") % 2 == 0, 500).otherwise(404),
    ).otherwise(F.when(F.col("event_id") % 17 == 0, 301).otherwise(200))
    line = F.concat(
        F.lit("10."),
        (F.col("user_id") % 200).cast("string"),
        F.lit("."),
        (F.col("event_id") % 250).cast("string"),
        F.lit("."),
        ((F.col("event_id") * 7) % 250).cast("string"),
        F.lit(" - u"),
        F.col("user_id").cast("string"),
        F.lit(" ["),
        F.date_format("ts", "dd/MM/yyyy:HH:mm:ss"),
        F.lit("] \"GET /"),
        F.col("event_type"),
        F.lit("/p"),
        (F.col("event_id") % 100).cast("string"),
        F.lit(" HTTP/1.1\" "),
        status.cast("string"),
        F.lit(" "),
        F.floor(F.col("value") * 10).cast("bigint").cast("string"),
    )
    lines = e.select(line.alias("line"))
    parsed = lines.select(
        F.regexp_extract("line", _LOG_RE, 1).alias("ip"),
        F.regexp_extract("line", _LOG_RE, 2).alias("request_user"),
        F.regexp_extract("line", _LOG_RE, 5).alias("path"),
        F.regexp_extract("line", _LOG_RE, 6).alias("status"),
        F.regexp_extract("line", _LOG_RE, 7).cast("bigint").alias("n_bytes"),
    )
    return (
        parsed.groupBy(
            F.concat(F.substring("status", 1, 1), F.lit("xx")).alias(
                "status_class"
            ),
            F.regexp_extract("path", r"^/([^/]+)", 1).alias("top_path"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_requests"),
            F.countDistinct("ip").cast("bigint").alias("n_ips"),
            F.countDistinct("request_user").cast("bigint").alias("n_users"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
        
    )
