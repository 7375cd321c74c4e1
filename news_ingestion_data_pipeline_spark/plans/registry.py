"""Query registry + determinism helpers shared by all plan modules.

Cross-engine determinism rules (Spark result must value-hash-equal the
DuckDB oracle):

  * Sums of money-like doubles go through exact DECIMAL arithmetic
    (cast operands to a fixed scale, sum exactly, cast the final scalar to
    DOUBLE) — decimal sums are associative, so partition order doesn't
    matter, and the decimal→double rounding is IEEE-identical in both
    engines. Plain double sums are order-dependent and WILL drift.
  * Averages = exact decimal sum cast to double, divided by the bigint
    count — one deterministic IEEE division.
  * Timestamps are projected as formatted strings ('yyyy-MM-dd HH:mm:ss')
    to sidestep session-timezone and micros-precision mismatches.
  * Every LIMIT/top-K has a total ORDER BY (value + id tiebreaks).
  * No RNG, no current_timestamp, no approx sketches in oracle-checked
    projections.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from news_ingestion_data_pipeline_spark.tables import load_table


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, description: str = "", tags: tuple[str, ...] = ()
):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn=fn, oracle=oracle, description=description, tags=tags)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---- determinism helpers -------------------------------------------------

def dec(col: Column | str, typ: str = "decimal(18,2)") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: Column | str, typ: str = "decimal(18,2)") -> Column:
    """Exact decimal sum cast back to double (deterministic)."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col: Column | str, typ: str = "decimal(18,2)") -> Column:
    """Deterministic average: exact decimal sum → double ÷ count."""
    return F.sum(dec(col, typ)).cast("double") / F.count(F.lit(1))


def ts_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


#: SQL-side equivalents (DuckDB dialect) of the helpers above.
SQL_DSUM = "CAST(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"
SQL_DAVG = "CAST(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*)"
SQL_TS = "strftime({col}, '%Y-%m-%d %H:%M:%S')"
