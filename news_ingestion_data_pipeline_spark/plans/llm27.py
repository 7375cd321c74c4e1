"""Twenty-seventh wave: training-set mechanics — deterministic
train/val/test splitting, hard-negative mining for contrastive
training, and tokenizer OOV-rate auditing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# md5-derived bucket in [0, 100) — the shared seedless sampling idiom.
_SQL_BUCKET = (
    "CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 100"
)


@register(
    "curation_train_val_test_split",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, n_chars, {_SQL_BUCKET} AS bucket FROM documents
), tagged AS (
  SELECT lang, n_chars,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM b
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM tagged
GROUP BY split, lang
ORDER BY split, lang
""",
    description="Deterministic 80/10/10 train/val/test split: the split "
    "tag is a pure function of the document id (md5 bucket in [0,100) — "
    "seedless, restartable, stable across reruns and cluster sizes, the "
    "same idiom as curation_sample_stratified), so a document NEVER "
    "migrates between splits when the corpus grows — the property that "
    "prevents silent train/test contamination across dataset versions. "
    "Output audits the split: per (split, lang) doc counts and char "
    "volumes. One narrow projection + one hash aggregate; at 100 TB the "
    "split column is computed at write time and becomes a partition "
    "column so every downstream reader prunes to its split for free.",
    tags=("curation", "llm", "sampling"),
)
def curation_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        t(spark, sf_dir, "documents")
        .select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        
    )


def _sqdist_sql(a: str, b: str, dim: int) -> str:
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, dim + 1)
    )


@register(
    "sim_hard_negatives",
    oracle=f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
anchors AS (SELECT * FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         c.vec_id AS negative_id, c.label AS negative_label,
         {_sqdist_sql('a.v', 'c.v', 64)} AS d
  FROM anchors a JOIN e c ON c.label <> a.label
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                               ORDER BY d, negative_id) AS rk
  FROM scored
)
SELECT anchor_id, CAST(anchor_label AS INT) AS anchor_label,
       negative_id, CAST(negative_label AS INT) AS negative_label,
       round(sqrt(d), 6) AS l2_dist
FROM ranked WHERE rk <= 3
ORDER BY anchor_id, rk
""",
    description="Hard-negative mining for contrastive training: for each "
    "anchor (deterministic 1-in-50 id subset), the 3 NEAREST vectors "
    "carrying a DIFFERENT label — the negatives that actually teach the "
    "model, vs easy random negatives. Distances use the IEEE-ordered "
    "fold (engine-identical), ranking is total-ordered by (distance, "
    "id). This registered form is the exact verification baseline "
    "(anchors x corpus with a label-mismatch predicate, a blocked "
    "nested-loop the optimizer broadcasts the anchor side of); the 100 "
    "TB path swaps the exact scan for the LSH/IVF candidate generators "
    "already proven in sim_lsh_topk / sim_ivf_topk and re-ranks the "
    "candidates exactly — mining cost drops to candidates-per-anchor, "
    "and the per-anchor top-3 is the same TakeOrdered shape either way.",
    tags=("llm", "similarity"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    anchors = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("av"),
    )
    d = F.aggregate(
        F.zip_with("av", "v", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        e.join(F.broadcast(anchors), F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            "anchor_label",
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            d.alias("d"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy("d", "negative_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "anchor_id",
            F.col("anchor_label").cast("int").alias("anchor_label"),
            "negative_id",
            F.col("negative_label").cast("int").alias("negative_label"),
            F.round(F.sqrt("d"), 6).alias("l2_dist"),
        )
        .orderBy("anchor_id", "rk")
    )


_VOCAB_K = 50


@register(
    "text_oov_rate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok FROM toks GROUP BY tok
  ORDER BY COUNT(*) DESC, tok LIMIT {_VOCAB_K}
), flagged AS (
  SELECT t.doc_id,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       round(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
""",
    description=f"Tokenizer-vocabulary coverage audit: build the top-"
    f"{_VOCAB_K} corpus vocabulary (count-ranked, token tiebreak — "
    "deterministic), then score every document's out-of-vocabulary rate "
    "against it. The per-doc OOV rate is the standard screen for "
    "documents a fixed tokenizer would shred into bytes (foreign "
    "scripts, binary junk, OCR noise) before they poison training. "
    "Physical shape: the vocabulary is top-K of a hash aggregate "
    "(TakeOrdered, K rows) and is BROADCAST back against the token "
    "stream — the expensive side streams map-side-only, no shuffle of "
    "the corpus tokens; the per-doc rollup re-aggregates on doc_id, "
    "which parquet row-group locality keeps mostly map-side too.",
    tags=("text", "llm", "curation"),
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6).alias(
                "oov_rate"
            ),
        )
        
    )
