"""Deequ-style DQ suite (operators/dq.py) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.dq import (
    Check,
    completeness,
    compliance,
    compute_metrics,
    maximum,
    mean,
    minimum,
    size,
    uniqueness,
    verify,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (3, "c", None)],
        "k long, s string, v double",
    )


def _metrics(spark, df, ms):
    return {r.metric: r.value for r in compute_metrics(df, ms).collect()}


def test_metric_values_hand_checked(spark, df):
    got = _metrics(
        spark,
        df,
        [
            size(),
            completeness("s"),
            completeness("v"),
            uniqueness("k"),
            minimum("v"),
            maximum("v"),
            mean("v"),
            compliance("v_small", F.col("v") < 25),
        ],
    )
    assert got["size"] == 4.0
    assert got["completeness(s)"] == 0.75
    assert got["completeness(v)"] == 0.75
    assert got["uniqueness(k)"] == 0.75  # 3 distinct / 4 rows
    assert got["minimum(v)"] == 10.0 and got["maximum(v)"] == 30.0
    assert got["mean(v)"] == 20.0
    assert got["compliance(v_small)"] == 0.5


def test_single_pass_one_scan(spark, df, tmp_path):
    d = str(tmp_path / "t.parquet")
    df.write.mode("overwrite").parquet(d)
    stored = spark.read.parquet(d)
    m = compute_metrics(
        stored,
        [size(), completeness("s"), minimum("v"), uniqueness("k")],
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        m._jdf.queryExecution(), "extended"
    )
    assert plan.count("t.parquet") == 1  # every metric rides one scan
    for bad in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_verify_pass_fail_and_missing_metric(spark, df):
    metrics = compute_metrics(df, [size(), minimum("v")])
    report = {
        r.constraint: r
        for r in verify(
            metrics,
            [
                Check("size", ">=", 1.0),
                Check("minimum(v)", "between", 0.0, 5.0),
                Check("maximum(v)", "<=", 99.0),  # never computed
            ],
        ).collect()
    }
    assert report["size >= 1.0"].passed
    assert not report["minimum(v) between 0.0..5.0"].passed  # 10 > 5
    ghost = report["maximum(v) <= 99.0"]
    assert not ghost.passed and ghost.value is None


def test_check_unknown_op_raises():
    with pytest.raises(ValueError, match="unknown op"):
        Check("size", "!=", 1.0).expr()
