"""Histogram split finding (operators/gbdt.py): hand-computable
splits, exactness of the histogram fold, and the plan-shape contract
(histograms are the only fact-scale stage; the level-2 leaf join is a
broadcast of the 1-row winner)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.gbdt import (
    best_splits,
    split_histogram,
    stack_features,
)
from diabetes_etl_spark.plans import all_queries

QUERIES = all_queries(include_extended=True)


def _toy(spark):
    # y separates perfectly on f1 <= 1 (values 10 vs 30), f2 is noise
    rows = [
        (1, 7, 10.0),
        (1, 8, 10.0),
        (2, 7, 30.0),
        (2, 8, 30.0),
    ]
    return spark.createDataFrame(rows, "f1 int, f2 int, y double")


def test_best_split_picks_separating_feature(spark):
    df = _toy(spark)
    feats = stack_features(
        df, {"f1": F.col("f1"), "f2": F.col("f2")}, F.col("y")
    )
    w = best_splits(split_histogram(feats)).collect()
    assert len(w) == 1
    r = w[0]
    assert r["feature"] == "f1" and r["split_bin"] == 1
    # gain = 20^2/2 + 60^2/2 - 80^2/4 = 200 + 1800 - 1600 = 400
    assert r["gain"] == 400.0
    assert r["n_left"] == 2 and r["n_right"] == 2
    assert r["mean_left"] == 10.0 and r["mean_right"] == 30.0


def test_noise_feature_has_zero_gain_and_loses(spark):
    df = _toy(spark)
    feats = stack_features(df, {"f2": F.col("f2")}, F.col("y"))
    w = best_splits(split_histogram(feats)).collect()[0]
    # f2 splits 7|8 -> both sides mean 20 -> gain 0
    assert w["feature"] == "f2" and w["gain"] == 0.0


def test_partitioned_best_split_per_leaf(spark):
    rows = [
        ("L", 1, 1.0), ("L", 1, 1.0), ("L", 2, 9.0), ("L", 2, 9.0),
        ("R", 3, 5.0), ("R", 4, 5.0),
    ]
    df = spark.createDataFrame(rows, "leaf string, f int, y double")
    feats = stack_features(
        df, {"f": F.col("f")}, F.col("y"), keep=["leaf"]
    )
    w = {
        r["leaf"]: r
        for r in best_splits(
            split_histogram(feats, ["leaf"]), ["leaf"]
        ).collect()
    }
    assert w["L"]["split_bin"] == 1 and w["L"]["gain"] == 64.0
    assert w["R"]["gain"] == 0.0  # constant y: no split helps


def test_tie_breaks_on_feature_then_bin(spark):
    # two identical features -> identical gains; rank must pick the
    # lexicographically first (deterministic-hash contract)
    rows = [(1, 1, 0.0), (2, 2, 4.0)]
    df = spark.createDataFrame(rows, "a int, b int, y double")
    feats = stack_features(
        df, {"b": F.col("b"), "a": F.col("a")}, F.col("y")
    )
    w = best_splits(split_histogram(feats)).collect()[0]
    assert w["feature"] == "a"


def test_gbdt_tree_plan_shape(spark, sf_dir):
    df = QUERIES["ml_gbdt_histogram_tree"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )
    # one EXECUTED fact scan per level, no more — and level 1's scan
    # ran in the upfront winner collect(), so the OUTPUT plan holds
    # only level 2's scan: the collected winner row re-materializes as
    # a LocalRelation (round-13 optimization) instead of re-deriving
    # from its lineitem lineage ("extended" mode repeats the plan 4x)
    assert plan.count("lineitem.parquet") <= 4
    physical = plan.split("== Physical Plan ==")[-1]
    assert physical.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan
    # all relational: no Python row stage anywhere
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan
    # scan prunes to the 5 used columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read and "l_orderkey" not in read


def test_gbdt_level2_gain_nonnegative_and_consistent(spark, sf_dir):
    rows = QUERIES["ml_gbdt_histogram_tree"].fn(spark, sf_dir).collect()
    assert [r["level"] for r in rows] == [1, 2, 2]
    assert {r["leaf"] for r in rows} == {"root", "L", "R"}
    root = rows[0]
    assert root["n_left"] + root["n_right"] == sum(
        r["n_left"] + r["n_right"] for r in rows if r["level"] == 2
    )
    for r in rows:
        assert r["gain"] >= 0.0
