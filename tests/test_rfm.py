"""RFM segmentation (plans/relational.py:orders_rfm_segments)."""

from __future__ import annotations


def test_rfm_quintiles_and_value_mass(spark, sf_dir):
    from diabetes_etl_spark.plans.relational import orders_rfm_segments
    from diabetes_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = orders_rfm_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
    orders = load_table(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    total = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
    ).collect()[0][0]
    assert abs(sum(r.segment_value for r in rows) - total) < 1e-6
    # quintile balance: each R quintile holds ~1/5 of customers
    from collections import defaultdict

    per_r = defaultdict(int)
    for r in rows:
        per_r[r.r_q] += r.n_customers
    for q, n in per_r.items():
        assert abs(n - n_cust / 5) <= n_cust / 5 * 0.25 + 1, (q, n)


def test_rfm_deterministic(spark, sf_dir):
    from diabetes_etl_spark.plans.relational import orders_rfm_segments

    a = sorted(map(tuple, orders_rfm_segments(spark, sf_dir).collect()))
    b = sorted(map(tuple, orders_rfm_segments(spark, sf_dir).collect()))
    assert a == b


def test_benford_terms_and_probabilities(spark, sf_dir):
    import math

    from diabetes_etl_spark.plans.relational import orders_benford_audit

    rows = {r.digit: r for r in orders_benford_audit(spark, sf_dir).collect()}
    assert set(rows) <= set(range(1, 10))
    for d, r in rows.items():
        assert abs(r.p_benford - round(math.log10(1 + 1 / d), 9)) < 1e-9
        assert r.chi_term >= 0
    assert abs(sum(r.p_observed for r in rows.values()) - 1.0) < 1e-6


def test_gini_known_distributions(spark, sf_dir):
    """Fixture Gini values live in [0, 1); equal-spend synthetic case
    gives 0, fully concentrated approaches 1 - 1/n."""
    from diabetes_etl_spark.plans.relational import customers_gini_by_nation

    rows = customers_gini_by_nation(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.total_spend > 0


def test_gini_formula_on_hand_case(spark):
    """Direct formula check: spends [1, 1, 1, 1] -> G = 0; [0.01, 0.01,
    0.01, 96.97] -> G near 0.72 by the rank formula."""
    from diabetes_etl_spark.operators.topk import skyline2d  # noqa: F401

    def gini(xs):
        xs = sorted(xs)
        n = len(xs)
        ws = sum((i + 1) * x for i, x in enumerate(xs))
        return 2 * ws / (n * sum(xs)) - (n + 1) / n

    assert gini([1, 1, 1, 1]) == 0
    assert 0.70 < gini([0.01, 0.01, 0.01, 96.97]) < 0.75


def test_spearman_known_cases(spark, sf_dir):
    """Fixture rho lies in (0, 1] (frequency and spend co-move); a
    pure-Python tie-corrected replay on the same per-customer metrics
    matches to rounding."""
    from diabetes_etl_spark.plans.relational import (
        customers_spearman_freq_spend,
    )
    from diabetes_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F
    from decimal import Decimal

    r = customers_spearman_freq_spend(spark, sf_dir).collect()[0]
    assert 0.0 < r.spearman_rho <= 1.0
    orders = load_table(spark, sf_dir, "orders")
    pc = [
        (x.f, x.m)
        for x in orders.groupBy("o_custkey")
        .agg(
            F.count("*").alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"),
        )
        .collect()
    ]

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
        ranks = [0.0] * len(vals)
        pos = 0
        while pos < len(order):
            j = pos
            while (j < len(order)
                   and vals[order[j]] == vals[order[pos]]):
                j += 1
            r_avg = (pos + 1 + j) / 2
            for t in range(pos, j):
                ranks[order[t]] = r_avg
            pos = j
        return ranks

    fs = [f for f, _ in pc]
    ms = [float(m) for _, m in pc]
    rf, rm = avg_ranks(fs), avg_ranks(ms)
    n = len(pc)
    sf, sm = sum(rf), sum(rm)
    sfm = sum(a * b for a, b in zip(rf, rm))
    sff = sum(a * a for a in rf)
    smm = sum(b * b for b in rm)
    import math

    rho = (n * sfm - sf * sm) / (
        math.sqrt(n * sff - sf * sf) * math.sqrt(n * smm - sm * sm)
    )
    assert abs(r.spearman_rho - rho) < 1e-6
