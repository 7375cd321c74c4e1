"""Table profiling: per-column quality stats in ONE scan.

The data-quality pass every ingestion pipeline runs before training: row
count, null count, exact distinct count, min/max per column. All columns'
aggregates are computed in a single wide aggregate (one scan, partial
map-side), then unpivoted to long format — never one scan per column.

Min/max are emitted as strings with per-type deterministic formatting
(C-style %.2f for doubles, fixed timestamp pattern) so a long-format frame
holds mixed column types and still hash-compares across engines.

Scale note: N exact countDistinct aggregates in one pass make Catalyst
plan an Expand (each input row fans out N+1 ways before the partial
aggregate). Exactness is the point here; for very wide profiles at 100 TB
swap countDistinct → approx_count_distinct and the Expand disappears
(sketches merge instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: kind → (spark formatter, duckdb formatter template)
_FORMATTERS = {
    "int": (
        lambda c: c.cast("string"),
        "CAST({agg}({col}) AS VARCHAR)",
    ),
    "double": (
        lambda c: F.format_string("%.2f", c),
        "printf('%.2f', {agg}({col}))",
    ),
    "str": (
        lambda c: c,
        "{agg}({col})",
    ),
    "ts": (
        lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss"),
        "strftime({agg}({col}), '%Y-%m-%d %H:%M:%S')",
    ),
}


def profile_columns(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """One row per profiled column: (column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value). ``specs`` = [(col, kind)] with kind
    in {'int','double','str','ts'}."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for col, kind in specs:
        fmt = _FORMATTERS[kind][0]
        c = F.col(col)
        aggs += [
            F.count(c).alias(f"_nn_{col}"),
            F.countDistinct(c).alias(f"_nd_{col}"),
            fmt(F.min(c)).alias(f"_min_{col}"),
            fmt(F.max(c)).alias(f"_max_{col}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("column_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{col}")).alias("n_nulls"),
                F.col(f"_nd_{col}").alias("n_distinct"),
                F.col(f"_min_{col}").alias("min_value"),
                F.col(f"_max_{col}").alias("max_value"),
            )
            for col, _ in specs
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")


def profile_oracle_sql(table: str, specs: list[tuple[str, str]]) -> str:
    """The DuckDB twin: one SELECT per column, UNION ALL (the oracle may
    scan repeatedly — only the Spark side must be single-pass)."""
    parts = []
    for col, kind in specs:
        tpl = _FORMATTERS[kind][1]
        parts.append(
            f"SELECT '{col}' AS column_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({col}) AS n_nulls, "
            f"COUNT(DISTINCT {col}) AS n_distinct, "
            f"{tpl.format(agg='MIN', col=col)} AS min_value, "
            f"{tpl.format(agg='MAX', col=col)} AS max_value "
            f"FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)
