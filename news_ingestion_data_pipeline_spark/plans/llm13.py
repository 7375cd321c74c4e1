"""Thirteenth wave: graph link prediction (common-neighbor Jaccard),
a data-quality expectations suite (the Great-Expectations-style gate a
production pipeline runs before publishing), and nearest-key as-of
join — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

# co-presence edge construction shared with graph_triangle_count
EDGES_SQL = """presence AS (
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
    "graph_link_prediction",
    oracle=f"""
WITH {EDGES_SQL},
und AS (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges
), deg AS (
  SELECT u, COUNT(*) AS d FROM und GROUP BY u
), common AS (
  SELECT a.u AS x, b.u AS y, COUNT(*) AS cn
  FROM und a JOIN und b ON a.v = b.v AND a.u < b.u
  GROUP BY a.u, b.u
), nonedge AS (
  SELECT c.x, c.y, c.cn, dx.d AS dx, dy.d AS dy
  FROM common c
  JOIN deg dx ON dx.u = c.x
  JOIN deg dy ON dy.u = c.y
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = c.x AND e.v = c.y)
)
SELECT x AS user_a, y AS user_b, cn AS common_neighbors,
       round(cn * 1.0 / (dx + dy - cn), 6) AS jaccard
FROM nonedge
ORDER BY jaccard DESC, user_a, user_b
LIMIT 20
""",
    description="Link prediction via common-neighbor Jaccard — the "
    "friend-of-friend / you-may-also-know primitive: over the same "
    "skew-capped co-presence graph as graph_triangle_count, score every "
    "NON-edge pair sharing at least one neighbor by |N(u) inter N(v)| / "
    "|N(u) union N(v)| and return the top-20 predicted links. The "
    "common-neighbor count is ONE self-join of the undirected edge list "
    "on the shared endpoint (the wedge join — same O(sum deg^2) shape "
    "as triangle counting's first hop), degrees come from one "
    "aggregate, and the union size needs no set materialization: "
    "|union| = dx + dy - cn. Anti-join removes existing edges.",
    tags=("graph", "events"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 600000000").alias("bkt"),
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
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("u", "v")
        .localCheckpoint()  # und/deg/wedge/anti all derive from it
    )
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wa, wb = und.alias("wa"), und.alias("wb")
    common = (
        wa.join(
            wb,
            (F.col("wa.v") == F.col("wb.v")) & (F.col("wa.u") < F.col("wb.u")),
        )
        .groupBy(F.col("wa.u").alias("x"), F.col("wb.u").alias("y"))
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    nonedge = common.join(
        edges,
        (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")),
        "left_anti",
    )
    dx = deg.select(F.col("u").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("u").alias("y"), F.col("d").alias("dy"))
    scored = (
        nonedge.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("user_a"),
            F.col("y").alias("user_b"),
            F.col("cn").alias("common_neighbors"),
            F.round(
                F.col("cn") * 1.0 / (F.col("dx") + F.col("dy") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(F.desc("jaccard"), "user_a", "user_b").limit(20)


@register(
    "pipeline_dq_expectations",
    oracle="""
SELECT 'orders_custkey_fk' AS check_name,
       (SELECT COUNT(*) FROM orders o
        WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer))
         AS n_violations
UNION ALL
SELECT 'orders_orderkey_unique',
       (SELECT COUNT(*) FROM
         (SELECT o_orderkey FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1))
UNION ALL
SELECT 'lineitem_orderkey_fk',
       (SELECT COUNT(*) FROM lineitem l
        WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
UNION ALL
SELECT 'lineitem_qty_positive',
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
UNION ALL
SELECT 'lineitem_discount_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 0.5)
UNION ALL
SELECT 'lineitem_ship_after_order',
       (SELECT COUNT(*) FROM lineitem l JOIN orders o
        ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate < o.o_orderdate)
UNION ALL
SELECT 'documents_text_nonnull',
       (SELECT COUNT(*) FROM documents WHERE text IS NULL)
UNION ALL
SELECT 'documents_nchars_consistent',
       (SELECT COUNT(*) FROM documents WHERE n_chars != length(text))
ORDER BY check_name
""",
    description="Data-quality expectation suite — the publish gate "
    "(Great Expectations / dbt-test shape) a production pipeline runs "
    "before promoting a batch: referential integrity (orders->customer, "
    "lineitem->orders as anti-join counts), key uniqueness, domain "
    "ranges (quantity > 0, discount in [0, 0.5]), temporal sanity "
    "(shipped on/after order date, a cross-table join check), null contracts, and derived-column "
    "consistency (n_chars == length(text)) — one row per check with its "
    "violation count, zero meaning pass. Every check is an aggregate or "
    "anti-join the optimizer fuses over shared scans; at 100 TB the FK "
    "checks broadcast the key side exactly like the engine's other "
    "anti-joins. The oracle runs the same checks — a hash match means "
    "both engines agree on every violation count (here: all zero, the "
    "fixture is clean — the CHECKS are what's being certified).",
    tags=("pipeline", "quality"),
)
def pipeline_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    lineitem = t(spark, sf_dir, "lineitem")
    documents = t(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        ).select("check_name", "n_violations")

    checks = [
        check(
            "orders_custkey_fk",
            orders.join(
                customer.select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
        ),
        check(
            "orders_orderkey_unique",
            orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1),
        ),
        check(
            "lineitem_orderkey_fk",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        check("lineitem_qty_positive", lineitem.filter(F.col("l_quantity") <= 0)),
        check(
            "lineitem_discount_range",
            lineitem.filter(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)
            ),
        ),
        check(
            "lineitem_ship_after_order",
            lineitem.join(
                orders.select("o_orderkey", "o_orderdate"),
                lineitem.l_orderkey == F.col("o_orderkey"),
            ).filter(F.col("l_shipdate") < F.col("o_orderdate")),
        ),
        check("documents_text_nonnull", documents.filter(F.col("text").isNull())),
        check(
            "documents_nchars_consistent",
            documents.filter(F.col("n_chars") != F.length("text")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "join_asof_nearest",
    oracle="""
WITH purchases AS (
  SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
  WHERE event_type = 'purchase'
), views AS (
  SELECT user_id, event_id AS v_id, ts AS v_ts FROM events
  WHERE event_type = 'view'
), cand AS (
  SELECT p.user_id, p.p_id, p.p_ts, v.v_id,
         abs(epoch_us(p.p_ts) - epoch_us(v.v_ts)) AS gap_us,
         epoch_us(v.v_ts) AS v_us
  FROM purchases p JOIN views v ON p.user_id = v.user_id
  WHERE abs(epoch_us(p.p_ts) - epoch_us(v.v_ts)) <= 3600000000
), best AS (
  SELECT user_id, p_id, p_ts, v_id, gap_us,
         ROW_NUMBER() OVER (PARTITION BY p_id
                            ORDER BY gap_us, v_us, v_id) AS rn
  FROM cand
)
SELECT user_id, p_id AS purchase_id,
       strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       v_id AS nearest_view_id,
       gap_us // 1000000 AS gap_sec
FROM best WHERE rn = 1
ORDER BY purchase_id
""",
    description="NEAREST-key as-of join (tolerance 1 h): each purchase "
    "pairs with its closest view in EITHER direction — the attribution "
    "semantic when influence can precede or follow (backward-only as-of "
    "is join_asof). Candidates come from a per-user equi-join bounded "
    "by the tolerance predicate — at scale the time-bucket banding of "
    "join_range_banded bounds this join's fan-out; here the per-user "
    "key already does — then one window picks the minimum gap with a "
    "total (gap, ts, id) tie order. Purchases with no view within "
    "tolerance drop out (inner semantics), mirroring the oracle.",
    tags=("join", "asof", "events"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        us("ts").alias("p_us"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("v_id"),
        us("ts").alias("v_us"),
    )
    cand = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.abs(F.col("p_us") - F.col("v_us")) <= 3_600_000_000),
    ).select(
        "user_id",
        "p_id",
        "p_ts",
        "v_id",
        F.abs(F.col("p_us") - F.col("v_us")).alias("gap_us"),
        "v_us",
    )
    w = Window.partitionBy("p_id").orderBy("gap_us", "v_us", "v_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("p_id").alias("purchase_id"),
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.col("v_id").alias("nearest_view_id"),
            F.expr("gap_us div 1000000").alias("gap_sec"),
        )
        
    )
