"""Skew-mitigation operators: salted joins and salted two-phase aggregation.

AQE's skew-join splitting handles most hot keys at runtime (it splits
oversized sort-merge partitions), but two shapes still need explicit
salting at 100 TB:

  * **hash aggregation on a monster key** — AQE can't split a single group;
    a salt column turns one reducer-killing group into ``n_salt`` partial
    groups merged in a second, tiny aggregate.
  * **broadcast-ineligible joins where one key dominates** — replicating
    the small side ``n_salt``× and spreading the big side's hot key across
    salts bounds any one task at ~1/n_salt of the key's rows, independent
    of AQE's ability to see the skew (e.g. when the big side arrives
    pre-shuffled from a previous stage and no exchange exists to split).

Correctness requirement: the salt on the big side must be deterministic
(reproducible plans — no rand()) but row-varying *within* a key, so it's
derived by hashing non-key columns. The small side is exploded over all
``n_salt`` values, so every (key, salt) pair still matches — the join
result is row-for-row identical to the unsalted join (oracle-checked by
``join_salted_skew`` / ``agg_salted_skew`` in plans/relational_ext3.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_from: list[str], n_salt: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic row-varying salt in [0, n_salt): hash of the given
    (non-key) columns. Same row → same salt, every run, every engine."""
    return df.withColumn(
        col_name, F.pmod(F.abs(F.hash(*[F.col(c) for c in salt_from])), F.lit(n_salt))
    )


def explode_salt(df: DataFrame, n_salt: int, col_name: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (the small/dim side)."""
    return df.withColumn(
        col_name, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt_from: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key rows of ``big`` spread across ``n_salt``
    salts and ``small`` replicated to match. Output = unsalted join exactly
    (salt column dropped). Shuffle key is (key, salt): a key holding p% of
    the rows caps any task at p/n_salt %.

    Cost: small side is written n_salt× into the shuffle (or broadcast) —
    only pay it when a key is hot enough to dominate a stage.
    """
    b = with_salt(big, salt_from, n_salt)
    s = explode_salt(small, n_salt)
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        how,
    )
    return joined.drop("_salt")


def salted_sum_count(
    df: DataFrame,
    group_keys: list[str],
    sum_cols: dict[str, Column],
    salt_from: list[str],
    n_salt: int = 8,
) -> DataFrame:
    """Two-phase salted aggregation: partial SUM/COUNT per (keys, salt),
    then final merge per keys. Decomposable aggregates only (sum, count —
    min/max work the same way); the merge input is #groups × n_salt rows,
    so the monster group costs n_salt small rows instead of one giant one.

    ``sum_cols``: output name → column expression to sum (pass exact
    decimal casts for money, same as any other aggregate here).
    """
    salted = with_salt(df, salt_from, n_salt)
    partial = salted.groupBy(*group_keys, "_salt").agg(
        *[F.sum(c).alias(f"_s_{name}") for name, c in sum_cols.items()],
        F.count(F.lit(1)).alias("_s_cnt"),
    )
    return partial.groupBy(*group_keys).agg(
        *[F.sum(f"_s_{name}").alias(name) for name in sum_cols],
        F.sum("_s_cnt").alias("n_rows"),
    )
