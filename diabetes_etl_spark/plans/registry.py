"""Named-query registry backing ``__spark_entry__``.

Every operator family from SURVEY.md §2 is exercised by at least one
named query.  A query is a PySpark plan builder ``fn(spark, sf_dir) ->
DataFrame`` plus (where the semantics are ANSI-SQL-expressible) a
DuckDB oracle SQL string computing the same result on the same parquet
tables.  The driver — and tests/test_oracle.py locally — compares the
two on row count, schema, and an order-insensitive value hash.

Determinism contract for oracle-paired queries:
- every aggregate/computed column is aliased identically on both sides;
- float aggregates go through the decimal-exact helpers in
  ``functions.numeric`` (or are rounded) so values are bit-stable;
- timestamps in outputs are formatted to strings or cast to dates
  (timezone-proof);
- any top-k / limit has a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules lazily to avoid import cycles.
    from diabetes_etl_spark.plans import (  # noqa: F401
        dedupplans,
        diabetesplans,
        events,
        medallion_demo,
        relational,
        simplans,
        textplans,
    )

    return dict(_REGISTRY)
