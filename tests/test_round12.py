"""Round-12 additions: the cutpoint-bucketed Qini production twin
(no per-user window), the cancellation-proof Welch moment fold, and
the RDD bandwidth-sensitivity columns."""

from __future__ import annotations

import pytest

from diabetes_etl_spark.plans import all_queries


@pytest.fixture(scope="module")
def reg():
    return all_queries(include_extended=True)


def test_qini_cutpoints_plan_has_no_per_user_window(spark, sf_dir, reg):
    """The production twin must plan WITHOUT row_number or ntile —
    its only windows ride the bounded score support / 10-row decile
    grid, never the user table (round-11 VERDICT 'What's wrong #1')."""
    df = reg["events_uplift_qini_cutpoints"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "row_number" not in plan
    assert "ntile" not in plan


def test_qini_cutpoints_agrees_with_rank_form(spark, sf_dir, reg):
    """Tie groups move WHOLE between the two decile semantics, so:
    the grand totals (treated/control users, conversions) are
    identical, the final cumulative Qini row (the full prefix) is
    tie-split-invariant and must match bit-for-bit, and per-decile
    user masses differ by at most the largest score-tie group."""
    rank = {
        r["decile"]: r
        for r in reg["events_uplift_qini"].fn(spark, sf_dir).collect()
    }
    cut = {
        r["decile"]: r
        for r in reg["events_uplift_qini_cutpoints"]
        .fn(spark, sf_dir)
        .collect()
    }
    # score-coherent deciles keep tie groups whole, so a big tie
    # group can swallow a decile entirely — the cutpoint grid is a
    # SUBSET of 1..10, never a superset
    assert set(cut) <= set(rank)
    assert set(rank) == set(range(1, 11))

    def tot(rows, col):
        return sum(r[col] for r in rows.values())

    for col in ("n_treated", "n_ctrl", "conv_treated", "conv_ctrl"):
        assert tot(rank, col) == tot(cut, col), col

    # the final cumulative row is the full prefix — tie-split-invariant
    assert rank[max(rank)]["qini"] == cut[max(cut)]["qini"]

    # largest score-tie group bounds the per-decile mass shift
    from pyspark.sql import functions as F

    from diabetes_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    biggest_tie = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("score"))
        .groupBy("score")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    for d in rank:
        cut_mass = (
            cut[d]["n_treated"] + cut[d]["n_ctrl"] if d in cut else 0
        )
        got = cut_mass - (rank[d]["n_treated"] + rank[d]["n_ctrl"])
        assert abs(got) <= biggest_tie, (d, got, biggest_tie)


def test_rdd_bandwidth_sensitivity_stable_on_null_fixture(
    spark, sf_dir, reg
):
    """The fixture has NO true discontinuity at the click cutoff
    (smooth synthetic activity), so every bandwidth's effect must be
    small relative to the boundary outcome level — a bandwidth that
    manufactures a large jump on null data is a broken fit.  All
    three sensitivity columns populate (>= 3 points a side at bw=4
    on the fixture)."""
    r = reg["events_rdd_estimate"].fn(spark, sf_dir).collect()[0]
    level = max(abs(r["intercept_left"]), abs(r["intercept_right"]))
    for col in ("rdd_effect", "rdd_effect_bw4", "rdd_effect_bw8"):
        assert r[col] is not None, col
        assert abs(r[col]) < 0.25 * level, (col, r[col], level)
