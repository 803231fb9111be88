"""Grouped top-k (operators/topk.py): the map-side-pruned two-phase
form must be row-identical to the window form, including ties under a
total order, NULL group keys, and partitions split across Arrow
batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.topk import (
    topk_per_group,
    topk_per_group_pruned,
)


def _rows(df):
    return sorted((tuple(str(c) for c in r) for r in df.collect()))


def _data(spark, n=5000, groups=37):
    return spark.range(n).select(
        (F.col("id") % groups).alias("g"),
        ((F.col("id") * 2654435761) % 1000).alias("score"),
        F.col("id").alias("tiebreak"),
    )


def test_pruned_topk_equals_window_topk(spark):
    df = _data(spark).repartition(16)
    order = [F.col("score").desc(), F.col("tiebreak")]
    a = _rows(topk_per_group(df, ["g"], order, 5))
    b = _rows(topk_per_group_pruned(df, ["g"], order, 5))
    assert a == b
    assert len(a) == 37 * 5


def test_pruned_topk_handles_null_group_keys(spark):
    df = spark.createDataFrame(
        [(None, 10, 1), (None, 20, 2), (None, 5, 3), ("a", 1, 4)],
        "g string, score int, tiebreak int",
    ).repartition(4)
    order = [F.col("score").desc(), F.col("tiebreak")]
    a = _rows(topk_per_group(df, ["g"], order, 2))
    b = _rows(topk_per_group_pruned(df, ["g"], order, 2))
    assert a == b
    assert sum(1 for r in b if r[0] == 'None') == 2


def test_pruned_topk_survives_batch_splits(spark):
    """One partition split across many small Arrow batches: the carry
    logic must keep the per-(partition, group) bound exact."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        df = _data(spark, n=2000, groups=3).coalesce(1)
        order = [F.col("score").desc(), F.col("tiebreak")]
        a = _rows(topk_per_group(df, ["g"], order, 4))
        b = _rows(topk_per_group_pruned(df, ["g"], order, 4))
        assert a == b
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )


def test_pruned_topk_single_exchange(spark):
    """Phase 1 is exchange-free (narrow sortWithinPartitions +
    mapInPandas); the only shuffle is the final window over the
    bounded survivor set."""
    df = _data(spark).repartition(8)  # materialized shape; repartition
    order = [F.col("score").desc(), F.col("tiebreak")]
    plan = (
        topk_per_group_pruned(df, ["g"], order, 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exchanges: the explicit repartition of the INPUT + the window's —
    # nothing else (no exchange between the sort and the local head)
    assert plan.count("Exchange") <= 2


# -- 2-D skyline --------------------------------------------------------------


def _sky_brute(rows):
    out = []
    for i, (k, mn, mx) in enumerate(rows):
        dom = any(
            (qmn <= mn and qmx >= mx and (qmn < mn or qmx > mx))
            for j, (qk, qmn, qmx) in enumerate(rows) if j != i
        )
        if not dom:
            out.append(k)
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    import random

    from diabetes_etl_spark.operators.topk import skyline2d

    rnd = random.Random(3)
    rows = [(i, rnd.randrange(20), float(rnd.randrange(50))) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, mn long, mx double")
    got = sorted(r.id for r in skyline2d(df, "mn", "mx", "id").collect())
    assert got == _sky_brute(rows)


def test_skyline_duplicates_and_strictness(spark):
    from diabetes_etl_spark.operators.topk import skyline2d

    rows = [
        (1, 5, 10.0), (2, 5, 10.0),   # identical: both survive
        (3, 5, 9.0),                  # dominated at equal recency
        (4, 4, 10.0),                 # dominates 1,2 strictly? mn < and mx == -> yes
        (5, 6, 11.0),                 # frontier: worse mn, better mx
    ]
    df = spark.createDataFrame(rows, "id long, mn long, mx double")
    got = sorted(r.id for r in skyline2d(df, "mn", "mx", "id").collect())
    assert got == [4, 5]
