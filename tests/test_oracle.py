"""Differential testing of every registered query against its DuckDB
oracle — a local replica of the driver's correctness gate (SURVEY.md §5.1).

The comparison goes through the SAME pandas path the driver uses
(Spark ``toPandas`` vs DuckDB ``fetchdf`` — see tests/pandas_compare.py):
round 1 proved that a pure-Python normalization can pass locally while
the driver's pandas-dtype-sensitive hash fails (events_sessionize_sql,
int64 vs HUGEINT→float64), so local green must mean gate green.
"""

from __future__ import annotations

import pandas as pd
import pytest

from diabetes_etl_spark.plans import all_queries
from tests.pandas_compare import compare_frames

QUERIES = all_queries(include_extended=True)
ORACLE_CASES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_CASES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = QUERIES[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    problems = compare_frames(name, spark_pdf, oracle_pdf)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


# -- harness self-tests: the comparator must catch what the driver catches


def test_harness_flags_int_vs_float_dtype():
    """The exact round-1 failure mode: values equal, dtypes int vs float."""
    a = pd.DataFrame({"k": [1, 2], "v": [0, 1]})  # int64
    b = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.0]})  # float64
    assert any("dtype kind mismatch" in p for p in compare_frames("t", a, b))


def test_harness_flags_value_diff():
    a = pd.DataFrame({"v": [1, 2]})
    b = pd.DataFrame({"v": [1, 3]})
    assert any("value mismatch" in p for p in compare_frames("t", a, b))


def test_harness_accepts_date_vs_datetime64():
    """The driver accepted Spark DATE (object of datetime.date) against
    DuckDB datetime64 in round 1 — the comparator must too."""
    import datetime

    a = pd.DataFrame({"d": [datetime.date(2024, 1, 1)]})  # object dtype
    b = pd.DataFrame({"d": pd.to_datetime(["2024-01-01"])})  # datetime64
    assert compare_frames("t", a, b) == []


def test_harness_accepts_column_order_difference():
    a = pd.DataFrame({"b": [1], "a": [2]})
    b = pd.DataFrame({"a": [2], "b": [1]})
    assert compare_frames("t", a, b) == []
