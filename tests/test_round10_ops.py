"""Unit tests for the round-10 operators — behavior the oracle pairing
does not pin (edge semantics, hand-computed constants, independent
numpy cross-checks)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# -- linear_interpolate edges -------------------------------------------------


def test_linear_interpolate_fraction_edges_and_zero_gap(spark):
    from diabetes_etl_spark.operators.timeseries import linear_interpolate

    rows = [
        # key 1: obs at t=0 (v=10) and t=10 (v=20); gaps at 2.5 and 7.5
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (1, "2024-01-01 00:00:02.500000", 2, None),
        (1, "2024-01-01 00:00:07.500000", 3, None),
        (1, "2024-01-01 00:00:10", 4, 20.0),
        # key 2: leading + trailing gaps never extrapolate
        (2, "2024-01-01 00:00:00", 5, None),
        (2, "2024-01-01 00:00:01", 6, 7.0),
        (2, "2024-01-01 00:00:02", 7, None),
        # key 3: zero-width gap (same ts as its two observations)
        (3, "2024-01-01 00:00:00", 8, 1.0),
        (3, "2024-01-01 00:00:00", 9, None),
        (3, "2024-01-01 00:00:00", 10, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "k int, ts string, eid int, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r["eid"]: r["interp"]
        for r in linear_interpolate(
            df, ["k"], "ts", ["ts", "eid"], "v"
        ).collect()
    }
    assert out[1] == 10.0 and out[4] == 20.0  # observations kept exactly
    assert out[2] == pytest.approx(12.5)
    assert out[3] == pytest.approx(17.5)
    assert out[5] is None  # before first obs: no extrapolation
    assert out[7] is None  # after last obs
    # zero-width gap: guarded fraction yields the previous value
    assert out[9] == pytest.approx(1.0)


# -- ndcg_at_k hand-computed constant ------------------------------------------


def test_ndcg_hand_computed_example(spark):
    from diabetes_etl_spark.operators.ranking import ndcg_at_k

    # one query, 3 docs: rels (3, 1, 2) but scores rank them (doc order
    # a=rel3, b=rel1, c=rel2) as a > b > c
    scored = spark.createDataFrame(
        [("q", "a", 0.9, 3), ("q", "b", 0.8, 1), ("q", "c", 0.7, 2)],
        "query string, doc_id string, score double, rel int",
    )
    row = ndcg_at_k(scored, k=3).collect()[0]
    d = [round(math.log2(p + 1), 12) for p in (1, 2, 3)]
    dcg = round(7 / d[0], 12) + round(1 / d[1], 12) + round(3 / d[2], 12)
    idcg = round(7 / d[0], 12) + round(3 / d[1], 12) + round(1 / d[2], 12)
    assert row["dcg"] == pytest.approx(dcg, abs=1e-9)
    assert row["idcg"] == pytest.approx(idcg, abs=1e-9)
    assert row["ndcg"] == pytest.approx(round(dcg / idcg, 9), abs=1e-9)
    assert row["ndcg"] < 1.0  # the rank swap costs something


def test_ndcg_perfect_ranking_is_one_and_no_rel_is_null(spark):
    from diabetes_etl_spark.operators.ranking import ndcg_at_k

    perfect = spark.createDataFrame(
        [("q", "a", 0.9, 2), ("q", "b", 0.8, 1)],
        "query string, doc_id string, score double, rel int",
    )
    assert ndcg_at_k(perfect, k=5).collect()[0]["ndcg"] == 1.0
    barren = spark.createDataFrame(
        [("q", "a", 0.9, 0), ("q", "b", 0.8, 0)],
        "query string, doc_id string, score double, rel int",
    )
    assert ndcg_at_k(barren, k=5).collect()[0]["ndcg"] is None


# -- Wasserstein: independent numpy cross-check ---------------------------------


def test_wasserstein_matches_numpy_cdf_integration(spark, sf_dir):
    import numpy as np

    from diabetes_etl_spark.plans import all_queries

    reg = all_queries(include_extended=True)
    row = reg["events_wasserstein_drift"].fn(spark, sf_dir).collect()[0]
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "value")
        .toPandas()
        .dropna(subset=["value"])
    )
    a = np.sort(ev[ev.event_id % 2 == 0].value.values)
    b = np.sort(ev[ev.event_id % 2 == 1].value.values)
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, xs, side="right") / len(a)
    fb = np.searchsorted(b, xs, side="right") / len(b)
    w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(xs)))
    assert row["wasserstein_1"] == pytest.approx(w1, rel=1e-6)


# -- silhouette range ------------------------------------------------------------


def test_silhouette_bounded_and_separable_case(spark):
    from diabetes_etl_spark.operators.clustering import kmeans_silhouette

    # two tight, far-apart blobs -> near-perfect silhouette
    rows = []
    for i in range(8):
        rows.append((i, [float(i % 2) * 0.01, 0.0]))
    for i in range(8, 16):
        rows.append((i, [100.0 + float(i % 2) * 0.01, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_silhouette(emb, k=2, iterations=2).collect()
    assert len(out) == 2
    for r in out:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["mean_silhouette"] > 0.99


# -- Gini endpoints ---------------------------------------------------------------


def test_gini_of_equal_revenues_is_zero(spark, sf_dir):
    """Identity check via the registered query's formula on a
    synthetic equal-revenue table: G -> 0 (perfect equality)."""
    from pyspark.sql import Window

    rev = spark.createDataFrame(
        [(i, 100.0) for i in range(1, 21)], "k int, rev double"
    ).select(F.col("k"), F.col("rev").cast("decimal(15,2)").alias("rev"))
    w = Window.orderBy("rev", "k")
    ranked = rev.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    g = ranked.agg(
        (
            (
                2 * F.sum(F.col("i").cast("decimal(18,0)") * F.col("rev"))
                - (F.max("n").cast("decimal(18,0)") + 1) * F.sum("rev")
            ).cast("double")
            / (F.max("n").cast("decimal(18,0)") * F.sum("rev")).cast(
                "double"
            )
        ).alias("g")
    ).collect()[0]["g"]
    assert g == pytest.approx(0.0, abs=1e-12)
