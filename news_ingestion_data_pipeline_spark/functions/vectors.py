"""Vector column functions over ``array<float>`` embedding columns.

Built-in higher-order functions (``F.zip_with`` / ``F.aggregate``) — JVM-side
and codegen-friendly, no Python boundary. Doubles throughout; deterministic
left-to-right accumulation so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine given precomputed norms — same arithmetic (and therefore the
    same IEEE result) as ``cosine``, but the per-row norms are plain column
    references instead of per-pair aggregate re-evaluation. Use in pairwise
    joins: project ``norm(vec)`` on each side first, then only the dot
    product runs per pair (~5x fewer interpreted HOF steps)."""
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def hyperplane_signature(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign-of-dot-product LSH signature → bit string like '1011…'.

    ``hyperplanes`` are fixed (seeded) constant vectors baked into the plan
    as literals, so the signature is deterministic across engines and runs —
    the bucketing key for the LSH near-neighbor path.
    """
    bits = []
    for hp in hyperplanes:
        hp_col = F.array(*[F.lit(float(x)) for x in hp])
        bits.append(F.when(dot(vec, hp_col) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
