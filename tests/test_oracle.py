"""Differential testing of every registered query against its DuckDB
oracle — a local replica of the driver's correctness gate (SURVEY.md §5.1):
row count, column names/order-insensitive schema, and exact value match
on sorted rows.  Strictness note: the driver hashes values, so this test
compares exactly (no float tolerance) — determinism is part of the
contract (functions/numeric.py).
"""

from __future__ import annotations

import datetime
import math

import pytest

from diabetes_etl_spark.plans import all_queries

QUERIES = all_queries()
ORACLE_CASES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_CASES = sorted(n for n, s in QUERIES.items() if not s.oracle)


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full-precision repr so silent drift cannot hide
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    if s_norm != d_norm:
        diffs = [
            (a, b) for a, b in zip(s_norm, d_norm) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0
