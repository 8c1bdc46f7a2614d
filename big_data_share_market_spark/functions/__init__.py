"""Shared expression helpers.

Cross-engine float determinism: Spark and DuckDB sum doubles in
different orders (parallel partial aggregation), and FP addition is not
associative, so a plain `SUM(double)` can hash-mismatch the oracle.
`dsum`/`davg` sum through DECIMAL(25,6) — exact, associative integer
arithmetic — then cast back to DOUBLE, making both engines bit-identical
while the *inputs* to the sum stay ordinary IEEE doubles computed by the
same expression tree. Use these in every oracle-checked aggregate; the
oracle SQL mirrors them as
`CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)`.

At scale this costs one widening cast per row inside codegen — no extra
shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column) -> Column:
    """Deterministic double sum (decimal-exact internally)."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Deterministic double average: exact decimal sum / count."""
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def dsum_sql(expr: str) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB mirror of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) / COUNT({expr})"


def dsum_over_sql(expr: str, frame: str) -> str:
    """DuckDB windowed deterministic sum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) OVER {frame} AS DOUBLE)"
