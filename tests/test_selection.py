"""Iterative exact k-th selection (operators/selection.py) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.selection import exact_kth


def test_matches_sorted_answer_every_k(spark):
    vals = [float((i * 2654435761) % 9973) for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)
    for k in (1, 2, 1000, 1999, 2000):
        v, rounds = exact_kth(df, "x", k, buckets=64, threshold=50)
        assert v == s[k - 1], k
        # rounds == 0 is now legitimate: the round-14 fused
        # bracket+count pass descends into the k-th value's magnitude
        # bin directly, and a bin at or under the threshold resolves
        # by sliver sort with no equal-width histogram pass at all
        assert rounds >= 0


def test_duplicate_heavy_column_converges(spark):
    """A column that is one constant except a few outliers: the
    bracket collapses to a single ulp instead of looping forever."""
    vals = [42.0] * 5000 + [1.0, 99.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    v, rounds = exact_kth(df, "x", 2500, buckets=16, threshold=10)
    assert v == 42.0
    assert rounds < 64


def test_nulls_and_nans_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (3.0,), (2.0,)], "x double"
    )
    assert exact_kth(df, "x", 2)[0] == 2.0


def test_k_out_of_range_raises(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="exceeds"):
        exact_kth(df, "x", 5)
    with pytest.raises(ValueError, match="1-based"):
        exact_kth(df, "x", 0)


def test_logarithmic_rounds(spark):
    """2000 spread-out values with a tiny threshold still resolve in
    a handful of histogram passes (the log_B property)."""
    df = spark.range(2000).select(
        (F.col("id") * 1.618033988749).alias("x")
    )
    _, rounds = exact_kth(df, "x", 1234, buckets=1024, threshold=4)
    assert rounds <= 4
