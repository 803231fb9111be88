"""In-plan logistic-regression trainer (operators/classifier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.classifier import (
    _dec12,
    logistic_score,
    logistic_train_rounds,
    sigmoid_q,
)


def test_dec12_matches_spark_decimal_cast(spark):
    vals = [0.1234567890125, -3.0000000000005, 1.9999999999999, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r.p
        for r in df.select(
            F.col("v").cast("decimal(28,12)").cast("double").alias("p")
        ).collect()
    ]
    assert got == [_dec12(v) for v in vals]


def test_training_separates_labels(spark):
    """A linearly separable fixture must move the weights the right
    way: positive weight on the separating feature, and the final
    model must score the positive class above the negative."""
    rows = [(float(i % 10) / 10 + (1.0 if i % 2 else 0.0), i % 2)
            for i in range(200)]
    feats = spark.createDataFrame(rows, "f1 double, y int").select(
        F.round("f1", 4).alias("f1"), "y"
    )
    out = logistic_train_rounds(feats, ["f1"], "y", iterations=5, lr=1.0)
    rows_out = {r["round"]: r for r in out.collect()}
    assert rows_out[0].w1 == 0.0
    assert rows_out[5].w1 > rows_out[1].w1 > 0  # monotone toward separation
    w = [rows_out[5].w0, rows_out[5].w1]
    scored = feats.select(
        "y", logistic_score(["f1"], w).alias("s")
    ).groupBy("y").agg(F.avg("s").alias("m")).collect()
    means = {r.y: r.m for r in scored}
    assert means[1] > means[0]


def test_round_zero_is_zero_and_rounds_counted(spark):
    feats = spark.createDataFrame([(0.5, 1), (0.1, 0)], "f1 double, y int")
    out = logistic_train_rounds(feats, ["f1"], "y", iterations=2).collect()
    assert [r["round"] for r in sorted(out, key=lambda r: r["round"])] == [0, 1, 2]


def test_sigmoid_quantized_to_7_decimals(spark):
    df = spark.createDataFrame([(0.3,)], "z double")
    v = df.select(sigmoid_q(F.col("z")).alias("s")).first().s
    assert v == round(v, 7)
    assert abs(v - 0.5744425) < 1e-6


def test_training_resumes_from_state_store(spark, tmp_path):
    """A crashed long training resumes from the last committed round:
    2 rounds with a store, then a fresh call asking for 4 continues at
    round 3 and matches an uninterrupted 4-round run exactly."""
    from diabetes_etl_spark.sources.versioned import VersionedTable

    rows = [(round((i % 10) / 10 + (1.0 if i % 2 else 0.0), 4), i % 2)
            for i in range(60)]
    feats = spark.createDataFrame(rows, "f1 double, y int")
    store = VersionedTable(spark, str(tmp_path / "gd"))

    logistic_train_rounds(feats, ["f1"], "y", iterations=2, lr=1.0,
                          state_store=store)
    assert store.last_app_version("gd_round") == 2

    resumed = sorted(
        tuple(r) for r in logistic_train_rounds(
            feats, ["f1"], "y", iterations=4, lr=1.0, state_store=store
        ).collect()
    )
    fresh = sorted(
        tuple(r) for r in logistic_train_rounds(
            feats, ["f1"], "y", iterations=4, lr=1.0
        ).collect()
    )
    assert resumed == fresh
    assert store.last_app_version("gd_round") == 4


# -- leave-one-out target encoding --------------------------------------------


def test_loo_encoding_excludes_own_target(spark):
    """Two rows in a category with targets 0 and 100 (alpha=0 edge via
    tiny alpha): each row's encoding must reflect the OTHER row."""
    from diabetes_etl_spark.operators.classifier import loo_target_encode

    df = spark.createDataFrame(
        [(1, "a", 0.0), (2, "a", 100.0), (3, "b", 50.0)],
        "id long, cat string, y double",
    )
    out = {r.id: r.loo_enc_raw for r in
           loo_target_encode(df, "cat", "y", alpha=1e-9).collect()}
    assert abs(out[1] - 100.0) < 1e-5   # sees only the other row
    assert abs(out[2] - 0.0) < 1e-5
    # singleton category: denominator ~alpha -> collapses to prior
    assert abs(out[3] - 50.0) < 1e-3    # prior = (0+100+50)/3 = 50


def test_loo_encoding_smoothing_pulls_to_prior(spark):
    from diabetes_etl_spark.operators.classifier import loo_target_encode

    df = spark.createDataFrame(
        [(i, "a", 100.0) for i in range(5)] + [(9, "b", 0.0)],
        "id long, cat string, y double",
    )
    prior = 500.0 / 6
    out = {r.id: r.loo_enc_raw for r in
           loo_target_encode(df, "cat", "y", alpha=10.0).collect()}
    # category a row: (400 + 10*prior) / (4 + 10)
    want = (400.0 + 10.0 * round(prior, 12)) / 14.0
    assert abs(out[0] - want) < 1e-6
    # heavy smoothing keeps the encoding strictly between prior and raw
    assert prior < out[0] < 100.0


def test_loo_encoding_partition_invariant(spark):
    from diabetes_etl_spark.operators.classifier import loo_target_encode

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], float((i * 7) % 23)) for i in range(60)],
        "id long, cat string, y double",
    )
    a = sorted((r.id, r.loo_enc_raw) for r in
               loo_target_encode(df, "cat", "y").collect())
    b = sorted((r.id, r.loo_enc_raw) for r in
               loo_target_encode(df.repartition(13), "cat", "y").collect())
    assert a == b


def test_calibration_bins_cover_and_count(spark, sf_dir):
    from diabetes_etl_spark.plans.classifierplans import (
        classifier_calibration_bins,
    )

    rows = classifier_calibration_bins(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    pos = sum(r.n_pos for r in rows)
    assert all(0 <= r.bin <= 9 for r in rows)
    for r in rows:
        assert 0 <= r.n_pos <= r.n_docs
        # mean score must lie inside the bin's nominal range (clamp top)
        mean = r.sum_score / r.n_docs
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0 if r.bin < 9 else 1.01
        assert lo - 1e-9 <= mean <= hi + 1e-9
    assert total > 0 and 0 < pos < total


# -- rank metrics (round 9) ---------------------------------------------------


def test_auc_perfect_separation(spark):
    from diabetes_etl_spark.operators.classifier import rank_metrics

    rows = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    r = rank_metrics(
        spark.createDataFrame(rows, "score double, y int")
    ).collect()[0]
    assert r["auc"] == 1.0 and r["gini"] == 1.0 and r["ks"] == 1.0
    assert r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_all_tied_is_half(spark):
    from diabetes_etl_spark.operators.classifier import rank_metrics

    rows = [(0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)]
    r = rank_metrics(
        spark.createDataFrame(rows, "score double, y int")
    ).collect()[0]
    assert r["auc"] == 0.5 and r["gini"] == 0.0 and r["ks"] == 0.0


def test_auc_midrank_hand_case(spark):
    from diabetes_etl_spark.operators.classifier import rank_metrics

    # scores asc: 0.1(y0) 0.4(y1) 0.4(y0) 0.7(y1)
    # midranks: 1, 2.5, 2.5, 4 -> pos rank sum = 6.5
    # AUC = (6.5 - 2*3/2) / (2*2) = 3.5/4 = 0.875
    rows = [(0.1, 0), (0.4, 1), (0.4, 0), (0.7, 1)]
    r = rank_metrics(
        spark.createDataFrame(rows, "score double, y int")
    ).collect()[0]
    assert r["auc"] == 0.875


def test_auc_matches_pairwise_definition(spark):
    from diabetes_etl_spark.operators.classifier import rank_metrics

    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (round(rng.choice([0.1, 0.3, 0.5, 0.7]) , 1), rng.randint(0, 1))
        for _ in range(40)
    ]
    if not any(y for _, y in rows):
        rows[0] = (rows[0][0], 1)
    if all(y for _, y in rows):
        rows[0] = (rows[0][0], 0)
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0
        for p, n in itertools.product(pos, neg)
    )
    expected = wins / (len(pos) * len(neg))
    r = rank_metrics(
        spark.createDataFrame(rows, "score double, y int")
    ).collect()[0]
    assert abs(r["auc"] - expected) < 1e-12


def test_lift_deciles_invariants(spark, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    rows = (
        all_queries(include_extended=True)["classifier_lift_deciles"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(rows[-1]["cum_capture"] - 1.0) < 1e-12
    caps = [r["cum_capture"] for r in rows]
    assert caps == sorted(caps)


def _iso(spark, rows):
    from diabetes_etl_spark.operators.classifier import isotonic_fit

    bins = spark.createDataFrame(rows, "b long, n long, p long")
    return {
        r["k"]: r["iso_rate"]
        for r in isotonic_fit(bins, "b", "n", "p").collect()
    }


def test_isotonic_already_monotone_is_identity(spark):
    iso = _iso(spark, [(0, 10, 1), (1, 10, 5), (2, 10, 9)])
    assert iso == {0: 0.1, 1: 0.5, 2: 0.9}


def test_isotonic_pools_violators(spark):
    # rates 0.8, 0.2 violate -> pool to (8+2)/20 = 0.5
    iso = _iso(spark, [(0, 10, 8), (1, 10, 2)])
    assert iso == {0: 0.5, 1: 0.5}


def test_isotonic_weighted_pool(spark):
    # rates 0.9 (n=10), 0.0 (n=30) -> pooled 9/40 = 0.225; then bin 2
    # rate 0.5 stays above
    iso = _iso(spark, [(0, 10, 9), (1, 30, 0), (2, 10, 5)])
    assert iso == {0: 0.225, 1: 0.225, 2: 0.5}


def test_isotonic_matches_sklearn_style_pav(spark):
    # classic PAV hand case: 0.6, 0.4, 0.8, 0.2 ->
    # pool(0.6,0.4)=0.5; pool(0.8,0.2)=0.5 -> all 0.5
    iso = _iso(
        spark, [(0, 10, 6), (1, 10, 4), (2, 10, 8), (3, 10, 2)]
    )
    assert iso == {0: 0.5, 1: 0.5, 2: 0.5, 3: 0.5}


def test_isotonic_output_is_monotone_on_fixture(spark, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    rows = (
        all_queries(include_extended=True)[
            "classifier_isotonic_calibration"
        ]
        .fn(spark, sf_dir)
        .collect()
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)
    # pooled regions preserve total positive mass per pool
    assert abs(
        sum(r["n_docs"] * r["iso_rate"] for r in rows)
        - sum(r["n_pos"] for r in rows)
    ) < 1e-6 * sum(r["n_docs"] for r in rows)


def test_ridge_closed_form_matches_numpy(spark, sf_dir):
    import numpy as np

    from diabetes_etl_spark.plans import all_queries
    from diabetes_etl_spark.sources.tables import load_table

    r = all_queries(include_extended=True)["ml_ridge_closed_form"].fn(
        spark, sf_dir
    ).collect()[0]
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    X = np.array([[x["l_quantity"], x["l_discount"]] for x in rows])
    y = np.array([x["l_extendedprice"] for x in rows])
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    lam = 10.0
    A = Xc.T @ Xc + lam * np.eye(2)
    w = np.linalg.solve(A, Xc.T @ yc)
    b0 = y.mean() - w @ X.mean(axis=0)
    assert abs(r["w_quantity"] - w[0]) < 1e-5
    assert abs(r["w_discount"] - w[1]) < 1e-3
    assert abs(r["intercept"] - b0) < 1e-2
    assert 0.0 < r["r2"] <= 1.0


def test_woe_iv_identities(spark, sf_dir):
    import math

    from diabetes_etl_spark.plans import all_queries

    rows = all_queries(include_extended=True)[
        "ml_woe_information_value"
    ].fn(spark, sf_dir).collect()
    pt = sum(r["n_pos"] for r in rows)
    qt = sum(r["n_docs"] - r["n_pos"] for r in rows)
    iv = rows[0]["information_value"]
    assert all(abs(r["information_value"] - iv) < 1e-12 for r in rows)
    acc = 0.0
    for r in rows:
        p, q = r["n_pos"], r["n_docs"] - r["n_pos"]
        if p > 0 and q > 0:
            woe = round(math.log((p * qt) / (q * pt)), 9)
            assert abs(r["woe"] - woe) < 1e-12
            acc += round((p / pt - q / qt) * woe, 12)
        else:
            assert r["woe"] is None
    assert abs(iv - acc) < 1e-9
    assert iv >= 0.0  # IV is a KL-symmetrized divergence: nonnegative


def test_conformal_coverage_near_target(spark, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    r = all_queries(include_extended=True)["ml_conformal_interval"].fn(
        spark, sf_dir
    ).collect()[0]
    assert r["n_train"] > 0 and r["n_cal"] > 0 and r["n_test"] > 0
    assert r["q_hat"] > 0
    # conformal guarantee: coverage >= 1 - alpha in expectation; allow
    # finite-sample slack of 4 binomial sigmas below target
    import math

    slack = 4 * math.sqrt(0.1 * 0.9 / r["n_test"])
    assert r["coverage"] >= 0.9 - slack, r
    assert r["coverage"] <= 1.0


def test_conformal_no_unpartitioned_window(spark, sf_dir, monkeypatch):
    """The conformal order statistic must come from the bounded-
    histogram selection operator (operators/selection.py exact_kth),
    NEVER an unpartitioned Window.orderBy — which Spark executes as a
    single-task global sort of the calibration split (the round-10
    verdict's one in-gate scale-killer).  Runtime pin: poison the
    static (partition-less) Window.orderBy constructor for the whole
    query run; any regression back to row_number() trips it.
    Window.partitionBy(...).orderBy (the legitimate partitioned form)
    is a WindowSpec method and stays usable."""
    import pyspark.sql.window as wmod

    def _boom(*_a, **_k):  # pragma: no cover - only on regression
        raise AssertionError(
            "unpartitioned Window.orderBy inside ml_conformal_interval"
        )

    monkeypatch.setattr(wmod.Window, "orderBy", staticmethod(_boom))
    from diabetes_etl_spark.plans import all_queries

    r = all_queries(include_extended=True)["ml_conformal_interval"].fn(
        spark, sf_dir
    ).collect()
    assert len(r) == 1 and r[0]["q_hat"] > 0


def test_lift_cutpoints_plan_no_ntile_and_agrees_with_exact(spark, sf_dir):
    """The cutpoint twin must plan WITHOUT ntile (no unpartitioned
    total-order pass over scored rows — its window rides the grouped
    score support), and its decile masses must track the exact-NTILE
    baseline: totals identical, per-decile counts within the largest
    score-tie group (ties move WHOLE between the two semantics)."""
    from diabetes_etl_spark.plans import all_queries

    reg = all_queries(include_extended=True)
    cut_df = reg["classifier_lift_cutpoints"].fn(spark, sf_dir)
    plan = cut_df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan.lower()
    assert "CartesianProduct" not in plan
    cut = cut_df.collect()
    exact = reg["classifier_lift_deciles"].fn(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in cut) == sum(r["n_docs"] for r in exact)
    assert sum(r["n_pos"] for r in cut) == sum(r["n_pos"] for r in exact)
    n_tot = sum(r["n_docs"] for r in cut)
    # every decile's mass stays within half the ideal width of N/10
    # (tie groups in this fixture are far smaller than a decile)
    for r in cut:
        assert abs(r["n_docs"] - n_tot / 10) < n_tot / 20, r
    # cumulative capture is monotone and ends at 1
    caps = [r["cum_capture"] for r in sorted(cut, key=lambda r: r["decile"])]
    assert caps == sorted(caps) and abs(caps[-1] - 1.0) < 1e-12


def test_knn_prod_profile_agreement_floor(spark, sf_dir):
    """The 10-table production profile must predict for EVERY point
    (LSH at these seeds always yields >= 1 candidate via self-bucket
    neighbours) and agree with the 24-table exact-covering form on
    >= 90% of points — the pinned recall floor that makes the
    unpaired perf twin safe to ship."""
    from diabetes_etl_spark.plans.classifierplans import (
        knn_lsh_predictions,
    )

    base = knn_lsh_predictions(spark, sf_dir, n_tables=24)
    prod = knn_lsh_predictions(spark, sf_dir, n_tables=10)
    j = base.withColumnsRenamed(
        {"pred_label": "base_label"}
    ).join(
        prod.withColumnsRenamed(
            {"ia": "ia2", "pred_label": "prod_label"}
        ),
        F.col("ia") == F.col("ia2"),
        "full_outer",
    )
    r = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("base_label") == F.col("prod_label")).cast("int")
        ).alias("agree"),
        F.sum(F.col("ia").isNull().cast("int")).alias("only_prod"),
        F.sum(F.col("ia2").isNull().cast("int")).alias("only_base"),
    ).collect()[0]
    assert r["only_prod"] == 0 and r["only_base"] == 0, r
    assert r["agree"] / r["n"] >= 0.90, (r["agree"], r["n"])


def test_grouped_ols_matches_numpy_per_segment(spark, sf_dir):
    import numpy as np

    from diabetes_etl_spark.plans import all_queries
    from diabetes_etl_spark.sources.tables import load_table

    rows = all_queries(include_extended=True)["ml_grouped_ols_slopes"].fn(
        spark, sf_dir
    ).collect()
    data = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_seg = {}
    for d in data:
        by_seg.setdefault(d["l_returnflag"], []).append(
            (d["l_quantity"], d["l_extendedprice"])
        )
    for r in rows:
        pts = np.array(by_seg[r["seg"]])
        slope, intercept = np.polyfit(pts[:, 0], pts[:, 1], 1)
        assert abs(r["slope"] - slope) < 1e-5 * max(1, abs(slope))
        assert abs(r["intercept"] - intercept) < 1e-2
        cc = np.corrcoef(pts[:, 0], pts[:, 1])[0, 1]
        assert abs(r["r2"] - cc * cc) < 1e-6


def test_brier_murphy_residual_is_within_bin_variance(spark, sf_dir):
    """brier - (reliability - resolution + uncertainty) must equal the
    mean within-bin score variance (the exact Murphy residual) — a
    strong algebraic identity check on all four components."""
    from collections import defaultdict

    from diabetes_etl_spark.plans import all_queries
    from diabetes_etl_spark.operators.classifier import (
        logistic_score,
        logistic_train_rounds,
    )

    r = all_queries(include_extended=True)[
        "classifier_brier_decomposition"
    ].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["brier"] <= 1.0
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert 0.0 <= r["uncertainty"] <= 0.25
    feats = _features_for_test(spark, sf_dir)
    rows = feats.collect()
    by_bin = defaultdict(list)
    for row in rows:
        by_bin[min(int(row["score"] * 10), 9)].append(
            (row["score"], row["y"])
        )
    n = len(rows)
    # exact Murphy residual: within-bin variance of f MINUS twice the
    # within-bin covariance of (f, o)
    resid = 0.0
    for pairs in by_bin.values():
        fbar = sum(f for f, _ in pairs) / len(pairs)
        resid += sum((f - fbar) ** 2 for f, _ in pairs)
        resid -= 2 * (
            sum(f * y for f, y in pairs)
            - fbar * sum(y for _, y in pairs)
        )
    resid /= n
    lhs = r["brier"] - (
        r["reliability"] - r["resolution"] + r["uncertainty"]
    )
    assert abs(lhs - resid) < 1e-6


def _features_for_test(spark, sf_dir):
    from diabetes_etl_spark.operators.classifier import (
        logistic_score,
        logistic_train_rounds,
    )
    from diabetes_etl_spark.plans.classifierplans import (
        _LR,
        _ROUNDS,
        _features,
    )

    feats = _features(spark, sf_dir)
    rounds = logistic_train_rounds(
        feats, ["f1", "f2"], "y", iterations=_ROUNDS, lr=_LR
    ).collect()
    final = next(x for x in rounds if x["round"] == _ROUNDS)
    return feats.select(
        "y",
        logistic_score(
            ["f1", "f2"], [final["w0"], final["w1"], final["w2"]]
        ).alias("score"),
    )


def test_pr_curve_monotonicity_and_identities(spark, sf_dir):
    from diabetes_etl_spark.plans import all_queries

    rows = all_queries(include_extended=True)["classifier_pr_curve"].fn(
        spark, sf_dir
    ).collect()
    assert [r["threshold_x10"] for r in rows] == list(range(1, 10))
    # recall is non-increasing in the threshold; tp+fn is the constant
    # positive count
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    pos = {r["tp"] + r["fn"] for r in rows}
    assert len(pos) == 1
    for r in rows:
        if r["tp"] + r["fp"] > 0 and r["tp"] + r["fn"] > 0 and r["tp"]:
            p, rr = r["precision"], r["recall"]
            f1 = 2 * p * rr / (p + rr)
            assert abs(r["f1"] - f1) < 1e-6
