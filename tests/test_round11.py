"""Round-11 additions: the A/B healthcheck composite (one events scan
folding SRM/balance + Welch + delta-method ratio) and its consistency
contract against the three standalone oracle twins."""

from __future__ import annotations

import pytest

from diabetes_etl_spark.plans import all_queries


@pytest.fixture(scope="module")
def reg():
    return all_queries(include_extended=True)


def test_healthcheck_matches_singles_field_for_field(spark, sf_dir, reg):
    """Every statistic the composite reports must equal the value the
    corresponding standalone query computes — bit-for-bit, since both
    run the identical decimal folds and pinned double epilogues."""
    hc = reg["events_ab_healthcheck"].fn(spark, sf_dir).collect()[0]
    srm = reg["events_ab_srm_health"].fn(spark, sf_dir).collect()[0]
    welch = reg["events_ab_welch_ttest"].fn(spark, sf_dir).collect()[0]
    ratio = reg["events_ab_ratio_delta"].fn(spark, sf_dir).collect()[0]

    assert hc["n_users_a"] == srm["n_a"]
    assert hc["n_users_b"] == srm["n_b"]
    assert hc["srm_chi2"] == srm["srm_chi2"]
    assert hc["srm_flag"] == srm["srm_flag"]
    assert hc["smd_events"] == srm["smd_events"]
    assert hc["imbalance_flag"] == srm["imbalance_flag"]

    assert hc["n_purch_a"] == welch["n_a"]
    assert hc["n_purch_b"] == welch["n_b"]
    assert hc["mean_value_a"] == welch["mean_a"]
    assert hc["mean_value_b"] == welch["mean_b"]
    assert hc["t_welch"] == welch["t_welch"]
    assert hc["df_welch"] == welch["df_welch"]

    assert hc["ratio_a"] == ratio["ratio_a"]
    assert hc["ratio_b"] == ratio["ratio_b"]
    assert hc["z_ratio"] == ratio["z_ratio"]


def test_healthcheck_plan_single_events_scan(spark, sf_dir, reg):
    """The whole point of the composite: ONE scan of events feeds all
    three readouts (the constituent singles cost three), and the plan
    stays join-free native aggregation."""
    df = reg["events_ab_healthcheck"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")
    assert "CartesianProduct" not in plan
    for bad in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, bad
