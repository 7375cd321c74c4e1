"""Hundred-twenty-fifth wave: exact Shapley-value attribution.

The game-theoretic endpoint of the attribution family
(events_first_touch → events_attribution_ushape →
events_markov_removal_effect): each user's touched-channel SET is a
coalition, v(S) = observed conversion rate of users with exactly that
coalition, and each channel's credit is its exact Shapley value

    φ_i = Σ_{S ∌ i} |S|!·(n-|S|-1)!/n! · (v(S ∪ i) − v(S)).

With n = 4 non-purchase channels there are 16 coalitions, the
factorial weights have common denominator 4! = 24, and v is snapped to
a 9-dp DECIMAL — so the whole computation is exact decimal arithmetic
and the efficiency axiom (Σφ_i = v(grand) − v(∅)) holds to the last
digit.  Unobserved coalitions contribute v = 0 (documented convention
of the data-driven simplification).

Scale shape: the corpus-sized work is ONE per-user aggregate to a
4-bit coalition mask + conversion flag; everything after is a 16-row
table crossed with a 4-row channel dimension.
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.plans.registry import register, t

_CHANNELS = ["click", "error", "signup", "view"]  # bit 0..3
_N = len(_CHANNELS)


def _weights_sql() -> str:
    # weight for coalition size k (size of S, i excluded): k!(n-k-1)!
    ws = [factorial(k) * factorial(_N - k - 1) for k in range(_N)]
    return "[" + ", ".join(str(w) for w in ws) + "]"


_CH_CASE = " + ".join(
    f"CASE WHEN event_type = '{c}' THEN {1 << i} ELSE 0 END"
    for i, c in enumerate(_CHANNELS)
)


@register(
    "events_shapley_attribution",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         bit_or(CASE event_type
                  WHEN 'click' THEN 1 WHEN 'error' THEN 2
                  WHEN 'signup' THEN 4 WHEN 'view' THEN 8
                  ELSE 0 END) AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
coal AS (
  SELECT mask, COUNT(*) AS n_users, SUM(conv) AS n_conv,
         CAST(round(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 9)
              AS DECIMAL(18,9)) AS v
  FROM per_user GROUP BY mask
),
grid AS (
  SELECT s.mask AS smask, c.i AS ch
  FROM (SELECT unnest(range(0, 16)) AS mask) s
  CROSS JOIN (SELECT unnest(range(0, {_N})) AS i) c
  WHERE (s.mask >> c.i) % 2 = 0
),
terms AS (
  SELECT g.ch,
         bit_count(CAST(g.smask AS BIGINT)) AS k,
         COALESCE(cv.v, CAST(0 AS DECIMAL(18,9))) AS v_s,
         COALESCE(cu.v, CAST(0 AS DECIMAL(18,9))) AS v_su
  FROM grid g
  LEFT JOIN coal cv ON cv.mask = g.smask
  LEFT JOIN coal cu ON cu.mask = g.smask + (1 << g.ch)
),
phi AS (
  SELECT ch,
         SUM({_weights_sql()}[k + 1] * (v_su - v_s)) AS num
  FROM terms GROUP BY ch
)
SELECT CASE ch WHEN 0 THEN 'click' WHEN 1 THEN 'error'
               WHEN 2 THEN 'signup' ELSE 'view' END AS channel,
       CAST(CAST(num AS VARCHAR) AS DOUBLE) / {factorial(_N)} AS shapley
FROM phi
ORDER BY channel
""",
    description="Exact data-driven Shapley attribution: users collapse to "
    "a 4-bit coalition mask of touched channels + conversion flag; "
    "v(coalition) = that coalition's observed conversion rate snapped to "
    "9-dp DECIMAL (unobserved coalitions contribute 0 — the standard "
    "data-driven simplification); each channel's credit is the exact "
    "Shapley sum over the 8 coalitions excluding it, with integer "
    "factorial weights and one final division by 4!. All-decimal "
    "arithmetic, so the efficiency axiom Σφ = v(grand)-v(∅) holds to "
    "the last digit (asserted in tests) and the hash is engine-exact. "
    "The corpus-sized work is ONE per-user aggregate; the game solves "
    "on 16 rows — this is why exact Shapley is tractable for small "
    "channel counts and sampled for large ones.",
    tags=("events", "attribution", "stats"),
)
def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch_bit = F.when(F.col("event_type") == "click", 1)
    for i, c in enumerate(_CHANNELS[1:], start=1):
        ch_bit = ch_bit.when(F.col("event_type") == c, 1 << i)
    ch_bit = ch_bit.otherwise(0)
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.bit_or(ch_bit).alias("mask"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    coal = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_conv"),
    ).select(
        "mask",
        F.round(
            F.col("n_conv").cast("double") / F.col("n_users"), 9
        )
        .cast("decimal(18,9)")
        .alias("v"),
    )
    spark_ = coal.sparkSession
    masks = spark_.range(16).select(F.col("id").cast("int").alias("smask"))
    chans = spark_.range(_N).select(F.col("id").cast("int").alias("ch"))
    grid = masks.crossJoin(chans).filter(F.expr("(smask >> ch) % 2 = 0"))
    cv = coal.select(F.col("mask").alias("smask"), F.col("v").alias("v_s"))
    cu = coal.select(F.col("mask").alias("umask"), F.col("v").alias("v_su"))
    zero = F.lit(0).cast("decimal(18,9)")
    terms = (
        grid.join(F.broadcast(cv), "smask", "left")
        .withColumn("umask", F.expr("smask + (1 << ch)"))
        .join(F.broadcast(cu), "umask", "left")
        .select(
            "ch",
            F.bit_count(F.col("smask").cast("bigint")).alias("k"),
            F.coalesce("v_s", zero).alias("v_s"),
            F.coalesce("v_su", zero).alias("v_su"),
        )
    )
    ws = [factorial(k) * factorial(_N - k - 1) for k in range(_N)]
    warr = F.array(*[F.lit(w) for w in ws])
    phi = terms.groupBy("ch").agg(
        F.sum(
            F.element_at(warr, (F.col("k") + 1).cast("int"))
            * (F.col("v_su") - F.col("v_s"))
        ).alias("num")
    )
    name = (
        F.when(F.col("ch") == 0, "click")
        .when(F.col("ch") == 1, "error")
        .when(F.col("ch") == 2, "signup")
        .otherwise("view")
    )
    return phi.select(
        name.alias("channel"),
        (F.col("num").cast("double") / F.lit(float(factorial(_N)))).alias(
            "shapley"
        ),
    )
