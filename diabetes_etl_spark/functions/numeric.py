"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent, and a distributed engine
gives no ordering guarantee — the same query can hash-differ from a
single-threaded oracle (or from its own previous run) in the last ulp.
Casting each element to a fixed-scale DECIMAL before summing makes the
aggregate exact and associative, so the result is bit-identical across
partitionings, engines, and cluster sizes; the final cast back to
DOUBLE keeps the output schema simple (and avoids engine-specific
decimal precision widening rules leaking into result schemas).

Each Spark helper has an `sql_*` twin that renders the equivalent ANSI
SQL for the DuckDB oracle, so query and oracle stay in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_cast(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Deterministically round a double expression via a decimal cast."""
    return col.cast(f"decimal({precision},{scale})").cast("double")


def dec_sum(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Exact (order-independent) sum of a double expression."""
    return F.sum(col.cast(f"decimal({precision},{scale})")).cast("double")


def dec_avg(col: Column, scale: int = 2, precision: int = 18) -> Column:
    """Deterministic mean: exact decimal sum, then one double division."""
    return dec_sum(col, scale, precision) / F.count(col)


def sql_dec_cast(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(CAST({expr} AS DECIMAL({precision},{scale})) AS DOUBLE)"


def sql_dec_sum(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"{sql_dec_sum(expr, scale, precision)} / COUNT({expr})"
