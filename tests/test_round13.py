"""Round-13 additions: the full-grain sxy scale in the exact
covariance fold, the loud headroom-breach contract, and regression
pins for the round-12 ADVICE items."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.functions.stats import (
    exact_cov,
    exact_cov_num,
    sql_exact_cov,
    sql_exact_cov_num,
)


def test_exact_cov_honors_full_product_grain(spark):
    """Round-12 ADVICE (medium): with fx=fy=6 and an sxy quantized at
    the docstring-blessed 12 fractional digits, the old 10^max
    pre-cast scale rounded sxy*1e6 to an integer BEFORE restoring the
    missing 1e6 — identically in both engines, so the oracle gate
    could never catch it.  Constructed case: sums sx=3e-6, sy=4e-6,
    sxy=7e-12, n=2 -> exact numerator (n*sxy - sx*sy)*1e12 = 2 and
    cov = 1e-12; the broken fold returned numerator -12 / cov -6e-12
    (sign flip!).  Both halves must now return the true value,
    bit-identically."""
    row = spark.sql(
        "SELECT CAST('0.000003' AS DECIMAL(38,6)) sx,"
        " CAST('0.000004' AS DECIMAL(38,6)) sy,"
        " CAST('0.000000000007' AS DECIMAL(38,12)) sxy,"
        " CAST(2 AS BIGINT) n"
    )
    got = row.select(
        exact_cov_num(
            F.col("sx"), F.col("sy"), F.col("sxy"), F.col("n"), 6, 6
        ).alias("numv"),
        exact_cov(
            F.col("sx"), F.col("sy"), F.col("sxy"), F.col("n"), 6, 6
        ).alias("cov"),
    ).collect()[0]
    assert int(got["numv"]) == 2
    assert got["cov"] == pytest.approx(1e-12, rel=1e-15)

    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {sql_exact_cov_num('sx', 'sy', 'sxy', 'n', 6, 6)} AS numv,"
        f" {sql_exact_cov('sx', 'sy', 'sxy', 'n', 6, 6)} AS cov"
        " FROM (SELECT CAST('0.000003' AS DECIMAL(38,6)) sx,"
        " CAST('0.000004' AS DECIMAL(38,6)) sy,"
        " CAST('0.000000000007' AS DECIMAL(38,12)) sxy, 2 AS n)"
    ).fetchone()
    assert int(duck[0]) == 2
    assert duck[1] == got["cov"]


def test_stats_headroom_breach_is_loud(spark):
    """Round-12 ADVICE (low) asked that a headroom breach fail loudly
    rather than silently diverge.  Under this engine pair it does, on
    BOTH sides: Spark 4 runs ANSI mode by default, so DECIMAL(38,0)
    overflow raises NUMERIC_VALUE_OUT_OF_RANGE (the ADVICE's
    silent-NULL reading applies only to ansi.enabled=false sessions,
    which this repo never constructs), and DuckDB HUGEINT/DECIMAL
    arithmetic raises out-of-range.  Pin both so a config drift that
    reintroduces the silent-NULL asymmetry fails this test.  Breach
    case: n=1e10, sxy=1e22 at (6,6) grain -> n*sxy*1e12 = 1e44 >>
    1e38."""
    from pyspark.errors.exceptions.base import ArithmeticException

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    row = spark.sql(
        "SELECT CAST('1000000.000000' AS DECIMAL(38,6)) sx,"
        " CAST('1000000.000000' AS DECIMAL(38,6)) sy,"
        " CAST('10000000000000000000000' AS DECIMAL(38,6)) sxy,"
        " CAST(10000000000 AS BIGINT) n"
    )
    with pytest.raises(ArithmeticException):
        row.select(
            exact_cov_num(
                F.col("sx"), F.col("sy"), F.col("sxy"), F.col("n"), 6, 6
            ).alias("numv")
        ).collect()

    con = duckdb.connect()
    with pytest.raises(duckdb.Error):
        con.execute(
            f"SELECT {sql_exact_cov_num('sx', 'sy', 'sxy', 'n', 6, 6)}"
            " FROM (SELECT CAST('1000000.000000' AS DECIMAL(38,6)) sx,"
            " CAST('1000000.000000' AS DECIMAL(38,6)) sy,"
            " CAST('10000000000000000000000' AS DECIMAL(38,6)) sxy,"
            " CAST(10000000000 AS BIGINT) n)"
        ).fetchone()


def test_quarantine_prod_covering_assumption_pinned(spark, sf_dir):
    """Round-12 ADVICE (low): decontam_semantic_quarantine_prod's
    oracle pairing rests on an EMPIRICAL covering property — at
    fixture scale its 16x5/side_cap-64 candidate sets cover the exact
    answer, so the covering form's cross-join SQL applies verbatim.
    Pin the assumption itself: prod output must equal the covering
    form's output row-for-row on the fixture.  If a fixture regen or
    a new gating scale breaks covering, THIS test fails and names the
    assumption, instead of the oracle gate presenting it as an
    engine-parity failure."""
    from diabetes_etl_spark.plans import all_queries

    reg = all_queries(include_extended=True)
    cover = sorted(
        tuple(r)
        for r in reg["decontam_semantic_quarantine"]
        .fn(spark, sf_dir)
        .collect()
    )
    prod = sorted(
        tuple(r)
        for r in reg["decontam_semantic_quarantine_prod"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert cover, "covering quarantine unexpectedly empty"
    assert prod == cover, (
        "decontam_semantic_quarantine_prod's fixture-covering "
        "assumption broke: its oracle pairing is no longer valid"
    )


@pytest.fixture(scope="module")
def reg():
    from diabetes_etl_spark.plans import all_queries

    return all_queries(include_extended=True)


def test_msprt_users_grid_is_user_grain(spark, sf_dir, reg):
    """The production monitor counts TRIALS at the randomization
    unit: the final cumulative n_a + n_b must equal the number of
    distinct users, cumulative counts must be non-decreasing, and
    converters can never exceed entrants within an arm on any day."""
    rows = (
        reg["events_ab_msprt_users"].fn(spark, sf_dir)
        .orderBy("day")
        .collect()
    )
    assert len(rows) >= 3
    from diabetes_etl_spark.sources.tables import load_table

    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id").distinct().count()
    )
    last = rows[-1]
    assert last["cum_n_a"] + last["cum_n_b"] == n_users
    prev = None
    for r in rows:
        assert r["cum_purch_a"] <= r["cum_n_a"]
        assert r["cum_purch_b"] <= r["cum_n_b"]
        if prev is not None:
            for c in ("cum_n_a", "cum_n_b", "cum_purch_a", "cum_purch_b"):
                assert r[c] >= prev[c]
        prev = r


def test_stream_msprt_users_equals_batch(spark, sf_dir, reg):
    """On bounded input the streaming user-grain monitor must equal
    the batch user-grain path row for row (the
    stream_tumbling_hourly equality pattern — both share the oracle,
    so a drift in either is a gate failure; this pins them against
    EACH OTHER without DuckDB in the loop)."""
    batch = sorted(
        tuple(r)
        for r in reg["events_ab_msprt_users"].fn(spark, sf_dir).collect()
    )
    stream = sorted(
        tuple(r)
        for r in reg["stream_msprt_monitor_users"].fn(spark, sf_dir).collect()
    )
    assert stream == batch and len(batch) >= 3


def test_confseq_users_inverts_msprt_users(spark, sf_dir, reg):
    """The user-grain CS is the inversion of the user-grain mSPRT —
    same agreement contract as the event-grain pair, at the grain
    where the always-valid guarantee actually holds."""
    from diabetes_etl_spark.plans.causalplans import _MSPRT_LN_BOUND

    cs = {
        r["day"]: r
        for r in reg["events_ab_confidence_sequence_users"]
        .fn(spark, sf_dir)
        .collect()
    }
    ms = {
        r["day"]: r
        for r in reg["events_ab_msprt_users"].fn(spark, sf_dir).collect()
    }
    assert set(cs) == set(ms) and len(cs) >= 3
    for d in cs:
        lnlam = ms[d]["ln_lambda"]
        if lnlam is None:
            assert cs[d]["cs_margin"] is None
            continue
        if abs(lnlam - _MSPRT_LN_BOUND) < 1e-8:
            continue  # knife-edge rounding radius (round-12 ADVICE)
        assert cs[d]["excludes_zero"] == ms[d]["crossed"], d
        assert cs[d]["cs_lo"] <= cs[d]["rate_diff"] <= cs[d]["cs_hi"]


def test_rmst_greenwood_se_matches_direct_computation(spark, sf_dir, reg):
    """rmst_se must equal the standard Greenwood-based RMST variance
    (survRM2's estimator) recomputed INDEPENDENTLY in plain Python
    from the raw per-user spans — KM fitted from scratch, remaining
    areas by direct summation, no shared code with the plan — up to
    the plan's documented quantization (9-decimal outputs, 7-decimal
    S and contribution grains)."""
    import math
    from collections import Counter

    from diabetes_etl_spark.plans.causalplans import (
        _RMST_TAU,
        _variant_col,
    )
    from diabetes_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.min(day).alias("f"),
            F.max(day).alias("l"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    day,
                )
            ).alias("c"),
        )
        .select(
            _variant_col(F.col("user_id")).alias("v"),
            F.when(
                F.col("c").isNotNull(), F.datediff("c", "f")
            ).otherwise(F.datediff("l", "f")).alias("t"),
            F.col("c").isNotNull().cast("int").alias("dead"),
        )
        .collect()
    )
    expected = {}
    for arm in (0, 1):
        rows = [(r["t"], r["dead"]) for r in pu if r["v"] == arm]
        grid = sorted(
            Counter(t for t, _ in rows).keys()
        )
        n_at = {
            t: sum(1 for u, _ in rows if u >= t) for t in grid
        }
        d_at = {
            t: sum(1 for u, dd in rows if u == t and dd) for t in grid
        }
        s, surv = 1.0, {}
        for t in grid:
            if d_at[t] >= n_at[t]:
                s = 0.0
            else:
                s *= 1.0 - d_at[t] / n_at[t]
            surv[t] = s
        areas = {}
        for i, t in enumerate(grid):
            a = 0.0
            for j in range(i, len(grid)):
                tj = grid[j]
                nxt = grid[j + 1] if j + 1 < len(grid) else _RMST_TAU
                w = max(
                    0, min(nxt, _RMST_TAU) - min(tj, _RMST_TAU)
                )
                a += surv[tj] * w
            areas[t] = a
        var = sum(
            areas[t] ** 2 * d_at[t] / (n_at[t] * (n_at[t] - d_at[t]))
            for t in grid
            if 0 < d_at[t] < n_at[t]
        )
        expected[arm] = math.sqrt(var)

    got = reg["events_ab_rmst"].fn(spark, sf_dir).collect()[0]
    assert got["rmst_se_a"] == pytest.approx(expected[0], rel=1e-4)
    assert got["rmst_se_b"] == pytest.approx(expected[1], rel=1e-4)
    assert got["rmst_se_a"] > 0 and got["rmst_se_b"] > 0
    assert got["rmst_diff_se"] == pytest.approx(
        math.sqrt(got["rmst_se_a"] ** 2 + got["rmst_se_b"] ** 2),
        rel=1e-6,
    )
    assert (
        got["rmst_diff_lo"]
        <= got["rmst_diff"]
        <= got["rmst_diff_hi"]
    )
    width = got["rmst_diff_hi"] - got["rmst_diff_lo"]
    assert width == pytest.approx(
        2 * 1.96 * got["rmst_diff_se"], rel=1e-6
    )


def test_aipw_se_matches_direct_influence_computation(spark, sf_dir, reg):
    """ate_aipw_se must equal the standard influence-function AIPW
    variance sqrt(sum(psi_i - psibar)^2) / n recomputed directly at
    USER level in plain Python — per-user psi built from the query's
    own reported coefficients (slope/intercept are deterministic
    outputs) and raw per-user (treated, x, y) rows, no shared fold
    code."""
    import math

    from diabetes_etl_spark.plans.causalplans import (
        _STRATA_SQL,
        _TREAT_CLICKS,
        _per_user_activity,
    )
    from pyspark.sql import functions as F

    got = reg["events_aipw_doubly_robust"].fn(spark, sf_dir).collect()[0]
    pu = (
        _per_user_activity(spark, sf_dir)
        .select(
            (F.col("n_clicks") >= _TREAT_CLICKS).cast("int").alias("t"),
            F.col("y_events").cast("double").alias("x"),
            F.col("revenue").cast("double").alias("y"),
            F.expr(_STRATA_SQL.replace("y", "y_events")).alias("s"),
        )
        .collect()
    )
    b1, b0 = got["slope_treat"], got["slope_ctrl"]
    # intercepts from the same closed form the query uses
    xt = [r for r in pu if r["t"] == 1]
    xc = [r for r in pu if r["t"] == 0]
    a1 = round(
        sum(r["y"] for r in xt) / len(xt)
        - b1 * (sum(r["x"] for r in xt) / len(xt)),
        9,
    )
    a0 = round(
        sum(r["y"] for r in xc) / len(xc)
        - b0 * (sum(r["x"] for r in xc) / len(xc)),
        9,
    )
    # empirical propensity per stratum; strata with an empty arm are
    # excluded (the query's ok guard)
    strata = {}
    for r in pu:
        strata.setdefault(r["s"], [0, 0])[r["t"]] += 1
    ok = {s for s, (nc, nt) in strata.items() if nc > 0 and nt > 0}
    psis = []
    for r in pu:
        if r["s"] not in ok:
            continue
        nc, nt = strata[r["s"]]
        e = nt / (nt + nc)
        g = (a1 - a0) + (b1 - b0) * r["x"]
        if r["t"] == 1:
            psi = g + (r["y"] - a1 - b1 * r["x"]) / e
        else:
            psi = g - (r["y"] - a0 - b0 * r["x"]) / (1 - e)
        psis.append(psi)
    n = len(psis)
    mean = sum(psis) / n
    se = math.sqrt(sum((p - mean) ** 2 for p in psis)) / n
    assert got["n_ok"] == n
    assert got["ate_aipw"] == pytest.approx(mean, abs=1e-6)
    assert got["ate_aipw_se"] == pytest.approx(se, rel=1e-6)
    assert got["ate_aipw_se"] > 0
    assert (
        got["ate_aipw_lo"] <= got["ate_aipw"] <= got["ate_aipw_hi"]
    )
    assert got["ate_aipw_hi"] - got["ate_aipw_lo"] == pytest.approx(
        2 * 1.96 * got["ate_aipw_se"], abs=1e-6
    )


def test_knn_prod_covering_assumption_pinned(spark, sf_dir, reg):
    """classifier_knn_lsh_prod's oracle pairing (round 13) rests on
    the 16-table profile being COVERING at fixture scale.  Pin the
    assumption: prod confusion must equal the 24-table margined
    form's row-for-row, so a fixture regen that breaks covering
    fails here by name instead of as an engine-parity mismatch
    (the decontam_semantic_quarantine_prod pattern)."""
    base = sorted(
        tuple(r)
        for r in reg["classifier_knn_lsh"].fn(spark, sf_dir).collect()
    )
    prod = sorted(
        tuple(r)
        for r in reg["classifier_knn_lsh_prod"].fn(spark, sf_dir).collect()
    )
    assert base, "knn confusion unexpectedly empty"
    assert prod == base, (
        "classifier_knn_lsh_prod's fixture-covering assumption "
        "broke: its oracle pairing is no longer valid"
    )


def test_policy_dr_matches_direct_computation(spark, sf_dir, reg):
    """events_policy_dr must equal the textbook DR estimator
    recomputed directly in plain Python at user level: per-logged-arm
    mean-reward model, V_DR = mean(q(pi(x)) + m*w*(r - q(a))), and
    the influence SE sqrt(sum(psi - psibar)^2)/n — no shared fold
    code.  Also pins the DM/DR decomposition and the CI shape."""
    import math
    from collections import defaultdict

    from diabetes_etl_spark.plans.causalplans import (
        _POLICY_ARMS,
        _STRATA_SQL,
        _per_user_activity,
        _policy_col,
    )
    from pyspark.sql import functions as F

    got = reg["events_policy_dr"].fn(spark, sf_dir).collect()[0]
    rows = (
        _per_user_activity(spark, sf_dir)
        .select(
            _policy_col(F.col("user_id")).alias("a"),
            F.expr(_STRATA_SQL.replace("y", "y_events")).alias("t"),
            F.col("revenue").cast("double").alias("r"),
        )
        .collect()
    )
    by_arm = defaultdict(list)
    for r in rows:
        by_arm[r["a"]].append(r["r"])
    q = {a: round(sum(v) / len(v), 9) for a, v in by_arm.items()}
    w = float(_POLICY_ARMS)
    psis = []
    for r in rows:
        m = 1.0 if r["a"] == r["t"] else 0.0
        psis.append(q[r["t"]] + m * w * (r["r"] - q[r["a"]]))
    n = len(psis)
    v_dr = sum(psis) / n
    v_dm = sum(q[r["t"]] for r in rows) / n
    se = math.sqrt(
        sum((p - v_dr) ** 2 for p in psis)
    ) / n
    assert got["n_users"] == n
    assert got["value_dm"] == pytest.approx(v_dm, rel=1e-9)
    assert got["value_dr"] == pytest.approx(v_dr, rel=1e-9)
    assert got["value_dr_se"] == pytest.approx(se, rel=1e-6)
    assert got["value_dr_se"] > 0
    assert (
        got["value_dr_lo"] <= got["value_dr"] <= got["value_dr_hi"]
    )
    # DR = DM + the IPS correction on matched logs
    corr = (
        sum(
            w * (r["r"] - q[r["a"]])
            for r in rows
            if r["a"] == r["t"]
        )
        / n
    )
    assert got["value_dr"] == pytest.approx(v_dm + corr, rel=1e-9)


def test_new_variance_columns_partition_invariant(spark, sf_dir, reg):
    """The round-13 variance folds (RMST Greenwood, AIPW influence,
    DR influence) must be bit-identical under a different shuffle
    partitioning — the decimal-fold order-independence contract that
    makes them safe on a 1000-executor cluster."""
    before = {}
    for name in ("events_ab_rmst", "events_aipw_doubly_robust",
                 "events_policy_dr"):
        before[name] = sorted(
            tuple(r) for r in reg[name].fn(spark, sf_dir).collect()
        )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        for name, want in before.items():
            got = sorted(
                tuple(r) for r in reg[name].fn(spark, sf_dir).collect()
            )
            assert got == want, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_exact_cov_frac_xy_restores_documented_headroom():
    """Post-review round-13 fix: with the fx+fy default alone, a
    scale-6 DECIMAL(38) sxy at (6,6) grains overflowed the pre-cast
    intermediate at ~1e20 — inside the module's documented 1e26
    numerator bound.  Declaring the true product grain (frac_xy=6,
    what every money fold actually quantizes at) must restore the
    old headroom: sxy = 9e20 at grain 6 evaluates exactly in DuckDB,
    while the undeclared default still fails loudly (never
    silently)."""
    import duckdb

    from diabetes_etl_spark.functions.stats import sql_exact_cov_num

    con = duckdb.connect()
    frame = (
        "(SELECT CAST('1000000.000000' AS DECIMAL(38,6)) sx,"
        " CAST('1000000.000000' AS DECIMAL(38,6)) sy,"
        " CAST('900000000000000000000.000000' AS DECIMAL(38,6)) sxy,"
        " CAST(1 AS BIGINT) n)"
    )
    got = con.execute(
        f"SELECT {sql_exact_cov_num('sx', 'sy', 'sxy', 'n', 6, None, 6)}"
        f" FROM {frame}"
    ).fetchone()[0]
    # (1*9e20 - 1e6*1e6) * 1e12 exactly
    assert int(got) == (9 * 10**20 - 10**12) * 10**12
    with pytest.raises(duckdb.Error):
        con.execute(
            f"SELECT {sql_exact_cov_num('sx', 'sy', 'sxy', 'n', 6)}"
            f" FROM {frame}"
        ).fetchone()


def test_events_value_two_decimal_grain_pinned(duck):
    """The (19,2) squared-moment casts (AIPW syy, DR srr) and every
    money fold's grain declaration rest on events.value being
    2-decimal money.  Pin the assumption on the fixture so a regen
    that emits finer values fails HERE by name instead of silently
    rounding squares identically in both engines (review finding,
    round 13)."""
    bad = duck.execute(
        "SELECT COUNT(*) FROM events"
        " WHERE value IS NOT NULL AND ROUND(value, 2) <> value"
    ).fetchone()[0]
    assert bad == 0
