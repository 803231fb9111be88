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


def test_fdr_bh_polynomial_tail_and_stepup_rule(spark, sf_dir, reg):
    """The A&S 7.1.26 polynomial tail must track libm erfc within its
    documented 1.5e-7 bound, and the rejected set must equal the BH
    step-up rule replayed in plain Python on the reported p-values."""
    import math

    rows = sorted(
        reg["events_ab_fdr_bh"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    m = len(rows)
    assert m >= 2
    for r in rows:
        if r["z_rate"] is None:
            assert r["p_two"] is None
            continue
        p_ref = math.erfc(abs(r["z_rate"]) / math.sqrt(2))
        assert abs(r["p_two"] - p_ref) < 2e-7, (r["p_two"], p_ref)
    ps = [r["p_two"] for r in rows if r["p_two"] is not None]
    k_star = max(
        (k for k in range(1, len(ps) + 1) if ps[k - 1] <= 0.05 * k / m),
        default=0,
    )
    for r in rows:
        assert r["rejected"] == (r["rank"] <= k_star), (r, k_star)


def test_msprt_lnlambda_formula_and_monotone_decision(spark, sf_dir, reg):
    """ln(Lambda_t) must reproduce the closed normal-mixture form from
    the reported z_t and cumulative counts, and the decided flag must
    be the monotone closure of the daily crossings."""
    import math

    rows = sorted(
        reg["events_ab_sequential_msprt"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert len(rows) >= 5
    tau2 = 0.0001
    decided = False
    for r in rows:
        pool = (r["cum_purch_a"] + r["cum_purch_b"]) / (
            r["cum_n_a"] + r["cum_n_b"]
        )
        var_d = pool * (1 - pool) * (
            1.0 / r["cum_n_a"] + 1.0 / r["cum_n_b"]
        )
        v = 1.0 / var_d
        rho = v * tau2 / (1.0 + v * tau2)
        ref = 0.5 * math.log(1.0 / (1.0 + v * tau2)) + (
            r["z_t"] ** 2
        ) / 2 * rho
        assert abs(r["ln_lambda"] - ref) < 1e-6, (r["ln_lambda"], ref)
        assert r["crossed"] == (
            r["ln_lambda"] > math.log(1.0 / 0.05)
        )
        decided = decided or r["crossed"]
        assert r["decided_by_day"] == decided


def test_ipw_ate_matches_numpy_reference(spark, duck, sf_dir, reg):
    """Stratified and IPW estimators cross-checked against a
    from-scratch numpy implementation on the same per-user table."""
    import numpy as np

    pu = duck.execute(
        """
        SELECT COUNT(*) AS y,
          SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ck,
          SUM(CASE WHEN event_type = 'purchase' THEN value
              ELSE 0 END) AS out
        FROM events GROUP BY user_id
        """
    ).fetchdf()
    t = (pu["ck"] >= 14).to_numpy().astype(int)
    y = pu["out"].to_numpy(float)
    s = np.select(
        [pu["y"] <= 60, pu["y"] <= 66, pu["y"] <= 72],
        [0, 1, 2],
        default=3,
    )
    naive = y[t == 1].mean() - y[t == 0].mean()
    num_s = num_i = n_ok = 0.0
    for st in np.unique(s):
        ms = s == st
        nt, nc = int((t[ms] == 1).sum()), int((t[ms] == 0).sum())
        if nt == 0 or nc == 0:
            continue
        ns = nt + nc
        n_ok += ns
        dt = y[ms & (t == 1)].sum() / nt - y[ms & (t == 0)].sum() / nc
        num_s += ns * dt
        e = nt / ns
        num_i += y[ms & (t == 1)].sum() / e - y[ms & (t == 0)].sum() / (
            1 - e
        )
    row = reg["events_ipw_stratified_ate"].fn(spark, sf_dir).collect()[0]
    assert row["n_treat"] == int(t.sum())
    assert row["n_ctrl"] == int((1 - t).sum())
    assert row["ate_naive"] == pytest.approx(naive, abs=1e-6)
    assert row["ate_stratified"] == pytest.approx(num_s / n_ok, abs=1e-6)
    assert row["ate_ipw"] == pytest.approx(num_i / n_ok, abs=1e-6)


def test_quantile_effects_match_numpy(spark, duck, sf_dir, reg):
    """Each reported quantile must equal the exact ceil(q*n)-th
    smallest value of that variant's purchase sample (numpy sort
    reference on the same rows)."""
    import numpy as np

    pdf = duck.execute(
        """
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
            ::BIGINT % 2 AS INT) AS variant, value AS v
        FROM events WHERE event_type = 'purchase'
        """
    ).fetchdf()
    a = np.sort(pdf.loc[pdf["variant"] == 0, "v"].to_numpy())
    b = np.sort(pdf.loc[pdf["variant"] == 1, "v"].to_numpy())
    rows = reg["events_ab_quantile_effects"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    import math

    for r in rows:
        qa_ref = a[math.ceil(r["q"] * len(a)) - 1]
        qb_ref = b[math.ceil(r["q"] * len(b)) - 1]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["q_a"] == qa_ref and r["q_b"] == qb_ref, r
        assert r["qte"] == pytest.approx(qb_ref - qa_ref, abs=1e-9)


def test_rdd_matches_numpy_polyfit(spark, duck, sf_dir, reg):
    """Each side's local linear fit must equal numpy polyfit on the
    same (clicks - cutoff, revenue) window, and the RD effect the
    intercept difference."""
    import numpy as np

    pu = duck.execute(
        """
        SELECT SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) x,
          SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) y
        FROM events GROUP BY user_id
        """
    ).fetchdf()
    cut, bw = 14, 6
    m = (pu["x"] >= cut - bw) & (pu["x"] <= cut + bw - 1)
    xc = (pu.loc[m, "x"] - cut).to_numpy(float)
    y = pu.loc[m, "y"].to_numpy(float)
    left, right = xc < 0, xc >= 0
    bl, al = np.polyfit(xc[left], y[left], 1)
    br, ar = np.polyfit(xc[right], y[right], 1)
    row = reg["events_rdd_estimate"].fn(spark, sf_dir).collect()[0]
    assert row["n_left"] == int(left.sum())
    assert row["n_right"] == int(right.sum())
    assert row["intercept_left"] == pytest.approx(al, abs=1e-5)
    assert row["intercept_right"] == pytest.approx(ar, abs=1e-5)
    assert row["slope_left"] == pytest.approx(bl, abs=1e-5)
    assert row["slope_right"] == pytest.approx(br, abs=1e-5)
    assert row["rdd_effect"] == pytest.approx(ar - al, abs=1e-5)


def test_iv_wald_matches_reference(spark, duck, sf_dir, reg):
    """LATE must equal ITT_outcome / ITT_takeup computed from scratch
    on the same per-user table with the same hash split."""
    pu = duck.execute(
        """
        SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
            ::BIGINT % 2 AS INT) AS z,
          SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ck,
          SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS y
        FROM events GROUP BY user_id
        """
    ).fetchdf()
    g0, g1 = pu[pu["z"] == 0], pu[pu["z"] == 1]
    itt_y = g1["y"].mean() - g0["y"].mean()
    itt_t = (g1["ck"] >= 14).mean() - (g0["ck"] >= 14).mean()
    row = reg["events_iv_wald"].fn(spark, sf_dir).collect()[0]
    assert row["n_z0"] == len(g0) and row["n_z1"] == len(g1)
    assert row["itt_outcome"] == pytest.approx(itt_y, abs=1e-6)
    assert row["itt_takeup"] == pytest.approx(itt_t, abs=1e-9)
    assert row["late_wald"] == pytest.approx(itt_y / itt_t, abs=1e-6)


def test_stream_msprt_equals_batch_path(spark, sf_dir, reg):
    """On bounded input the streaming monitor's decision path must
    equal the batch mSPRT query row for row (shared epilogue, grid
    from a real readStream aggregate instead of a table scan)."""
    batch = sorted(
        map(
            tuple,
            reg["events_ab_sequential_msprt"].fn(spark, sf_dir).collect(),
        )
    )
    stream = sorted(
        map(tuple, reg["stream_msprt_monitor"].fn(spark, sf_dir).collect())
    )
    assert batch == stream and len(batch) >= 5


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


def test_exact_var_survives_money_grain_cancellation(spark):
    """Round-11 VERDICT "What's wrong #2": the one-pass double fold
    (s2 - s1^2/n)/(n-1) silently loses precision when means dwarf
    variances — BOTH engines identically, so hashes still match.  On
    a synthetic money-grain case (1000 values of 1e7 +/- 0.25, true
    sample variance 62.5/999) the exact-numerator helper must hit the
    true value to double precision while the naive double fold is
    visibly wrong; and the DuckDB mirror must equal the Spark column
    bit-for-bit."""
    import duckdb
    from pyspark.sql import functions as F

    from diabetes_etl_spark.functions.stats import (
        exact_var,
        sql_exact_var,
    )

    n = 1000
    s1 = "10000000000.000000"          # 1000 * 1e7
    s2 = "100000000000000062.500000"   # 1000 * 1e14 + 1000 * 0.0625
    truth = 62.5 / 999

    df = spark.range(1).select(
        F.lit(s1).cast("decimal(38,6)").alias("s1"),
        F.lit(s2).cast("decimal(38,6)").alias("s2"),
        F.lit(n).alias("n"),
    )
    got = df.select(
        exact_var(
            F.col("s1"), F.col("s2"), F.col("n"), frac_digits=6
        ).alias("v"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("v_naive"),
    ).collect()[0]
    assert abs(got["v"] - truth) < 1e-15 * truth, got["v"]
    # the naive fold rounds s2 to the ~16-ulp grid at 1e17 and loses
    # the 62.5 almost entirely
    assert abs(got["v_naive"] - truth) > 1e-3 * truth, got["v_naive"]

    expr = sql_exact_var("s1", "s2", "n", 6)
    duck = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT CAST('{s1}' AS DECIMAL(38,6)) AS s1,"
        f" CAST('{s2}' AS DECIMAL(38,6)) AS s2, {n} AS n)"
    ).fetchone()[0]
    assert duck == got["v"]
