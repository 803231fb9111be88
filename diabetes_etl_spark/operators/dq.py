"""Single-pass data-quality metric suite + constraint verification.

The Deequ idea (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018): declare many column-level metrics —
completeness, uniqueness, bounds, compliance fractions — and compute
them all in ONE aggregation over the table, then verify declarative
constraints against the collected metric values.  At 100 TB the
"one pass" property is the whole game: a naive checker that scans
once per metric re-reads the corpus dozens of times; this suite is a
single `df.agg(*exprs)` whose metrics all ride the same scan
(count-distinct metrics share the scan too — Spark plans them through
one Expand, still one file pass).

Everything is a native expression; verification happens on the 1-row
metrics frame with no driver round-trip.

Reference parity: generalizes the reference's hard-coded DQ notebook
cells (`src/diabetes_etl_pipeline.py` expectations + dq_metrics gold
table) into a declarative, reusable suite.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Metric:
    """One named metric: a full aggregate expression over the table."""

    name: str
    expr: Column


def completeness(col: str) -> Metric:
    return Metric(
        f"completeness({col})",
        F.round(
            F.count(col).cast("double") / F.count(F.lit(1)), 9
        ),
    )


def uniqueness(col: str) -> Metric:
    """distinct / total — 1.0 means the column is a key."""
    return Metric(
        f"uniqueness({col})",
        F.round(
            F.count_distinct(F.col(col)).cast("double")
            / F.count(F.lit(1)),
            9,
        ),
    )


def minimum(col: str) -> Metric:
    return Metric(f"minimum({col})", F.min(col).cast("double"))


def maximum(col: str) -> Metric:
    return Metric(f"maximum({col})", F.max(col).cast("double"))


def mean(col: str, scale: int = 9) -> Metric:
    """Decimal-folded mean so the metric is partition-invariant."""
    return Metric(
        f"mean({col})",
        F.round(
            F.sum(F.col(col).cast("decimal(30,9)")).cast("double")
            / F.count(col),
            scale,
        ),
    )


def compliance(name: str, predicate: Column) -> Metric:
    """Fraction of rows satisfying the predicate (nulls fail it)."""
    return Metric(
        f"compliance({name})",
        F.round(
            F.sum(
                F.when(predicate, F.lit(1)).otherwise(F.lit(0))
            ).cast("double")
            / F.count(F.lit(1)),
            9,
        ),
    )


def size() -> Metric:
    return Metric("size", F.count(F.lit(1)).cast("double"))


def compute_metrics(df: DataFrame, metrics: list[Metric]) -> DataFrame:
    """ONE aggregation pass -> long-format (metric, value) rows."""
    wide = df.agg(
        *[m.expr.alias(f"m{i}") for i, m in enumerate(metrics)]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(m.name).alias("metric"),
                F.col(f"m{i}").alias("value"),
            )
            for i, m in enumerate(metrics)
        ]
    )
    return wide.select(F.explode(pairs).alias("kv")).select(
        "kv.metric", "kv.value"
    )


@dataclass(frozen=True)
class Check:
    """A constraint over one computed metric value."""

    metric: str
    op: str  # '>=', '<=', '==', 'between'
    lo: float
    hi: float | None = None

    def expr(self) -> Column:
        v = F.col("value")
        if self.op == ">=":
            return v >= F.lit(self.lo)
        if self.op == "<=":
            return v <= F.lit(self.lo)
        if self.op == "==":
            return v == F.lit(self.lo)
        if self.op == "between":
            return (v >= F.lit(self.lo)) & (v <= F.lit(self.hi))
        raise ValueError(f"unknown op {self.op!r}")


def verify(metrics_df: DataFrame, checks: list[Check]) -> DataFrame:
    """Join constraints against the metric rows -> report with one
    row per constraint: (constraint, metric, value, passed).  A check
    naming a metric the suite never computed FAILS (passed=false,
    value NULL) rather than vanishing.  An EMPTY checks list returns
    an empty report with the same schema (not a plan-construction
    error from folding zero conditions)."""
    if not checks:
        return metrics_df.limit(0).select(
            F.lit(None).cast("string").alias("constraint"),
            "metric",
            "value",
            F.lit(None).cast("boolean").alias("passed"),
        )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("ord"),
                F.lit(c.metric).alias("metric"),
                F.lit(
                    f"{c.metric} {c.op} {c.lo}"
                    + (f"..{c.hi}" if c.hi is not None else "")
                ).alias("constraint"),
            )
            for i, c in enumerate(checks)
        ]
    )
    spec_df = (
        metrics_df.sparkSession.range(1)
        .select(F.explode(rows).alias("c"))
        .select("c.ord", "c.metric", "c.constraint")
    )
    joined = spec_df.join(F.broadcast(metrics_df), "metric", "left")
    passed = None
    for i, c in enumerate(checks):
        cond = F.when(
            F.col("ord") == i, F.col("value").isNotNull() & c.expr()
        )
        passed = cond if passed is None else passed.when(
            F.col("ord") == i, F.col("value").isNotNull() & c.expr()
        )
    return joined.select(
        "constraint",
        "metric",
        "value",
        F.coalesce(passed, F.lit(False)).alias("passed"),
    )
