"""Eighty-fourth wave: TextRank keyword extraction.

text_textrank_keywords runs PageRank over the word co-occurrence graph
(Mihalcea & Tarau 2004) — the unsupervised keyword extractor that beats
raw frequency because a word matters when it co-occurs with other words
that matter; the composition of the engine's text machinery (co-occurrence
graphs) with its iterative-graph machinery (pagerank recipe, generated
unrolled oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_TR_VOCAB = 100   # graph restricted to the top-N corpus words
_TR_ITERS = 10
_TR_DAMP = 0.85
_TR_TOP = 20

_TR_BASE = f"""WITH tok AS (
  SELECT doc_id, u.i AS p, tk[u.i] AS w
  FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS tk
        FROM documents WHERE length(trim(text)) > 0),
       LATERAL (SELECT UNNEST(range(1, len(tk) + 1)) AS i) u
), vocab AS MATERIALIZED (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rn
    FROM tok GROUP BY w
  ) WHERE rn <= {_TR_VOCAB}
), cooc AS (
  SELECT a.w AS src, b.w AS dst, COUNT(*) AS cw
  FROM tok a JOIN tok b
    ON b.doc_id = a.doc_id AND b.p = a.p + 1 AND b.w <> a.w
  WHERE a.w IN (SELECT w FROM vocab) AND b.w IN (SELECT w FROM vocab)
  GROUP BY a.w, b.w
), und AS (
  SELECT src, dst, SUM(cw) AS cw FROM (
    SELECT src, dst, cw FROM cooc
    UNION ALL SELECT dst AS src, src AS dst, cw FROM cooc
  ) GROUP BY src, dst
), outw AS (
  SELECT src, SUM(cw) AS ow FROM und GROUP BY src
), edges AS MATERIALIZED (
  SELECT und.src, und.dst,
         CAST(und.cw AS DOUBLE) / outw.ow AS prob
  FROM und JOIN outw USING (src)
), nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""


def _tr_oracle() -> str:
    steps = []
    for k in range(1, _TR_ITERS + 1):
        p = k - 1
        steps.append(f""", r{k} AS MATERIALIZED (
  SELECT nd.node,
         {1 - _TR_DAMP} / (SELECT n FROM nn)
         + {_TR_DAMP} * COALESCE(c.contrib, 0.0) AS rank
  FROM nodes nd
  LEFT JOIN (
    SELECT e.dst AS node, SUM(r.rank * e.prob) AS contrib
    FROM r{p} r JOIN edges e ON r.node = e.src
    GROUP BY e.dst
  ) c ON nd.node = c.node
)""")
    return f"""{_TR_BASE}{''.join(steps)}
SELECT node AS keyword, round(rank, 8) AS textrank, rnk FROM (
  SELECT node, rank,
         ROW_NUMBER() OVER (ORDER BY round(rank, 8) DESC, node) AS rnk
  FROM r{_TR_ITERS}
) WHERE rnk <= {_TR_TOP}
ORDER BY rnk
"""


@register(
    "text_textrank_keywords",
    oracle=_tr_oracle(),
    description=f"TextRank keyword extraction (Mihalcea & Tarau 2004): "
    f"PageRank ({_TR_ITERS} iterations, damping {_TR_DAMP}) over the "
    f"adjacent-word co-occurrence graph of the top-{_TR_VOCAB} corpus "
    f"words, top-{_TR_TOP} by rank — the unsupervised keyword extractor "
    "that beats raw frequency (text_bigrams_top) and tf-idf "
    "(text_tfidf_top_terms) because a word scores by the importance of "
    "its NEIGHBORS, the same recursion that makes PageRank work on the "
    "web. The undirected graph is symmetric row-normalized (no "
    "dangling nodes by construction, so the teleport term is the plain "
    f"(1−d)/N). Same engineering recipe as graph_pagerank_transitions: "
    "driver-controlled rounds over O(vocab) state, localCheckpoint "
    "lineage truncation, and the generated unrolled MATERIALIZED-CTE "
    "oracle with round-8 absorbing summation-order drift. The corpus-"
    "sized work is ONE adjacency pass; every iteration runs on the "
    "bounded vocabulary graph.",
    tags=("text", "llm", "graph", "iterative"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.trim(F.lower("text")), " ")
    tok = (
        t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.posexplode(toks).alias("p0", "w"))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("c").desc(), F.col("w")))
        )
        .filter(F.col("rn") <= _TR_VOCAB)
        .select("w")
    )
    a = tok.join(F.broadcast(vocab), "w").alias("a")
    b = tok.join(F.broadcast(vocab), "w").alias("b")
    cooc = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.p") == F.col("a.p") + 1)
            & (F.col("b.w") != F.col("a.w")),
        )
        .groupBy(F.col("a.w").alias("src"), F.col("b.w").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    und = (
        cooc.select("src", "dst", "cw")
        .unionAll(
            cooc.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "cw"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("cw").alias("cw"))
    )
    outw = und.groupBy("src").agg(F.sum("cw").alias("ow"))
    edges = (
        und.join(outw, "src")
        .select(
            "src", "dst", (F.col("cw").cast("double") / F.col("ow")).alias("prob")
        )
        .persist()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank")).localCheckpoint()
    for _ in range(_TR_ITERS):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .groupBy(F.col("dst").alias("cnode"))
            .agg(F.sum(F.col("rank") * F.col("prob")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == F.col("cnode"), "left")
            .select(
                "node",
                (
                    F.lit((1 - _TR_DAMP) / n)
                    + _TR_DAMP * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    # global top-K compiles to TakeOrderedAndProject; the rank window
    # then runs over the K-row result only (bounded by construction),
    # never over the SF-proportional vocabulary.
    top = ranks.select(
        "node", F.round("rank", 8).alias("textrank")
    ).orderBy(F.col("textrank").desc(), F.col("node")).limit(_TR_TOP)
    w_rank = Window.orderBy(F.col("textrank").desc(), F.col("node"))
    out = top.select(
        F.col("node").alias("keyword"),
        "textrank",
        F.row_number().over(w_rank).alias("rnk"),
    )
    edges.unpersist()
    nodes.unpersist()
    return out
