"""LOCF fill (operators/timeseries.py) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.timeseries import locf_fill


def _ts(spark, rows):
    return spark.createDataFrame(rows, "k long, t long, v double")


def test_locf_carries_last_observation_across_gaps(spark):
    df = _ts(
        spark,
        [(1, 1, 10.0), (1, 2, None), (1, 3, None), (1, 4, 7.0), (1, 5, None)],
    )
    out = {
        r.t: r.v_filled
        for r in locf_fill(df, ["k"], ["t"], ["v"]).collect()
    }
    assert out == {1: 10.0, 2: 10.0, 3: 10.0, 4: 7.0, 5: 7.0}


def test_locf_prefix_before_first_observation_stays_null(spark):
    df = _ts(spark, [(1, 1, None), (1, 2, None), (1, 3, 5.0)])
    out = {
        r.t: r.v_filled
        for r in locf_fill(df, ["k"], ["t"], ["v"]).collect()
    }
    assert out[1] is None and out[2] is None and out[3] == 5.0


def test_locf_keys_do_not_leak(spark):
    df = _ts(spark, [(1, 1, 10.0), (2, 2, None), (2, 3, 3.0)])
    out = {
        (r.k, r.t): r.v_filled
        for r in locf_fill(df, ["k"], ["t"], ["v"]).collect()
    }
    assert out[(2, 2)] is None  # key 1's value must not cross keys
    assert out[(1, 1)] == 10.0 and out[(2, 3)] == 3.0


def test_locf_expression_fill_col_with_out_names(spark):
    df = spark.createDataFrame(
        [(1, 1, "m", 5.0), (1, 2, "x", 9.0), (1, 3, "m", 2.0)],
        "k long, t long, kind string, v double",
    )
    sparse = F.when(F.col("kind") == "m", F.col("v"))
    out = {
        r.t: r.meas_filled
        for r in locf_fill(
            df, ["k"], ["t"], [sparse], out_names=["meas"]
        ).collect()
    }
    # the non-measurement row at t=2 carries t=1's measurement, not 9.0
    assert out == {1: 5.0, 2: 5.0, 3: 2.0}


def test_locf_out_names_length_mismatch_raises(spark):
    df = _ts(spark, [(1, 1, 1.0)])
    with pytest.raises(ValueError, match="out_names"):
        locf_fill(df, ["k"], ["t"], ["v"], out_names=["a", "b"])


# -- drift_profile (operators/drift.py) -------------------------------------


def test_drift_zero_for_identical_distributions(spark):
    from diabetes_etl_spark.operators.drift import drift_profile

    df = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "v double"
    )
    out = drift_profile(df, df, "v", 0.0, 1.0, 10).collect()
    assert all(r.tv_distance == 0.0 for r in out)
    assert all(r.abs_diff == 0.0 for r in out)


def test_drift_one_for_disjoint_distributions(spark):
    from diabetes_etl_spark.operators.drift import drift_profile

    ref = spark.createDataFrame([(1.0,)] * 10, "v double")
    cur = spark.createDataFrame([(8.0,)] * 10, "v double")
    out = drift_profile(ref, cur, "v", 0.0, 1.0, 10).collect()
    assert out[0].tv_distance == 1.0


def test_drift_outliers_clamp_into_edge_bins(spark):
    from diabetes_etl_spark.operators.drift import drift_profile

    ref = spark.createDataFrame([(5.0,)] * 4, "v double")
    cur = spark.createDataFrame([(-99.0,), (999.0,)], "v double")
    rows = {r.bin: r for r in drift_profile(
        ref, cur, "v", 0.0, 1.0, 10
    ).collect()}
    assert rows[0].cur_n == 1 and rows[9].cur_n == 1  # clamped, counted


def test_drift_half_mass_moved(spark):
    from diabetes_etl_spark.operators.drift import drift_profile

    ref = spark.createDataFrame([(1.0,)] * 8 + [(3.0,)] * 0, "v double")
    cur = spark.createDataFrame([(1.0,)] * 4 + [(3.0,)] * 4, "v double")
    out = drift_profile(ref, cur, "v", 0.0, 1.0, 5).collect()
    assert abs(out[0].tv_distance - 0.5) < 1e-12


# -- rolling_zscore ---------------------------------------------------------


def test_rolling_zscore_flags_planted_outlier(spark):
    from diabetes_etl_spark.operators.timeseries import rolling_zscore

    # stable baseline 10.0 +- 0.5, then a spike
    rows = [(1, t, 10.0 + (0.5 if t % 2 else -0.5)) for t in range(10)]
    rows.append((1, 10, 50.0))   # the anomaly
    rows.append((1, 11, 10.5))   # normal again (spike in its baseline)
    df = _ts(spark, rows)
    out = {
        r.t: r
        for r in rolling_zscore(df, ["k"], ["t"], "v", 10, 3.0).collect()
    }
    assert out[10].is_anomaly is True
    assert out[11].is_anomaly is False
    assert abs(out[10].base_mean - 10.0) < 1e-9


def test_rolling_zscore_partial_window_scores_null(spark):
    from diabetes_etl_spark.operators.timeseries import rolling_zscore

    rows = [(1, t, float(t)) for t in range(5)]
    out = rolling_zscore(_ts(spark, rows), ["k"], ["t"], "v", 10).collect()
    assert all(r.is_anomaly is None and r.base_mean is None for r in out)


def test_rolling_zscore_constant_baseline_flags_any_deviation(spark):
    from diabetes_etl_spark.operators.timeseries import rolling_zscore

    rows = [(1, t, 7.0) for t in range(10)] + [(1, 10, 7.0), (1, 11, 99.0)]
    out = {
        r.t: r.is_anomaly
        for r in rolling_zscore(_ts(spark, rows), ["k"], ["t"], "v", 10).collect()
    }
    # zero-variance baseline: equal value passes, ANY deviation flags
    assert out[10] is False and out[11] is True


def test_drift_empty_side_yields_null_not_crash(spark):
    """An empty side means the monitoring comparison is undefined —
    fractions and tv_distance must come back NULL (callers alert on
    NULL like on high TV), not raise through the ANSI NaN->decimal
    cast."""
    from diabetes_etl_spark.operators.drift import drift_profile

    ref = spark.createDataFrame([(1.0,)] * 4, "v double")
    cur = spark.createDataFrame([], "v double")
    out = drift_profile(ref, cur, "v", 0.0, 1.0, 5).collect()
    assert len(out) == 5
    assert all(r.cur_frac is None and r.tv_distance is None for r in out)
    assert all(r.cur_n == 0 for r in out)


# -- ema (round-7) ----------------------------------------------------------


def test_ema_matches_hand_recursion(spark):
    from diabetes_etl_spark.operators.timeseries import ema

    rows = [("u", i, float(v)) for i, v in enumerate([10, 20, 30, 40])]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = ema(df, ["k"], ["t"], "v", alpha=0.5).collect()[0].ema
    want = 10.0
    for v in [20.0, 30.0, 40.0]:
        want = 0.5 * v + 0.5 * want
    assert got == want


def test_ema_skips_nulls_and_seeds_at_first_value(spark):
    from diabetes_etl_spark.operators.timeseries import ema

    df = spark.createDataFrame(
        [("u", 0, None), ("u", 1, 8.0), ("u", 2, None), ("u", 3, 4.0)],
        "k string, t int, v double",
    )
    got = ema(df, ["k"], ["t"], "v", alpha=0.25).collect()[0].ema
    assert got == 0.25 * 4.0 + 0.75 * 8.0  # NULLs carried, seed = 8


def test_ema_partition_invariant(spark):
    from diabetes_etl_spark.operators.timeseries import ema

    rows = [("u%d" % (i % 7), i, float((i * 37) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    a = sorted(map(tuple, ema(df, ["k"], ["t"], "v", 0.3).collect()))
    b = sorted(map(tuple, ema(df.repartition(13), ["k"], ["t"], "v", 0.3).collect()))
    assert a == b


def test_linear_trend_recovers_known_slope(spark, sf_dir):
    """events_linear_trend on synthetic exactly-linear input recovers
    slope/intercept to quantization precision."""
    import datetime

    from diabetes_etl_spark.plans.events import events_linear_trend  # noqa: F401
    from diabetes_etl_spark.plans import all_queries

    # direct check of the math on constructed data via the same plan
    # body: y = 2.5x + 7 for group a, y = -1 x + 100 for group b
    base = 1_700_000_000
    rows = []
    for i in range(50):
        ts = datetime.datetime.fromtimestamp(
            base + i * 60, tz=datetime.timezone.utc
        ).replace(tzinfo=None)
        rows.append((ts, "a", 2.5 * (base + i * 60) + 7.0))
        rows.append((ts, "b", -1.0 * (base + i * 60) + 100.0))
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        # single MICROS parquet file, like the driver-generated fixtures
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [ts for ts, _, _ in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([g for _, g, _ in rows]),
                "value": pa.array([v for _, _, v in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        )
        pq.write_table(tbl, f"{d}/events.parquet")
        out = {
            r.event_type: r
            for r in all_queries(include_extended=True)[
                "events_linear_trend"
            ].fn(spark, d).collect()
        }
    assert abs(out["a"].slope - 2.5) < 1e-6
    assert abs(out["b"].slope - (-1.0)) < 1e-6
    assert abs(out["a"].intercept - 7.0) < 1.0   # intercept magnifies
    assert abs(out["b"].intercept - 100.0) < 1.0  # slope quantization


# -- decayed trending ----------------------------------------------------------


def test_decayed_trending_halflife_semantics(spark):
    """An event exactly one half-life older contributes half the
    weight of the newest event; the newest contributes 1.0."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import events_decayed_trending

    # build a private parquet dir shaped like the fixture
    import tempfile

    base = dt.datetime(2025, 1, 2, 0, 0, 0)
    rows = [
        (1, base, 10, "a", 2.0, "{}"),
        (2, base - dt.timedelta(days=1), 11, "a", 2.0, "{}"),
        (3, base - dt.timedelta(days=2), 12, "b", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = tempfile.mkdtemp(prefix="decay_ev_")
    # write int64 micros like the fixture generator (Spark's default
    # INT96 physical type defeats load_table's footer probe)
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = {r.event_type: r for r in events_decayed_trending(spark, d).collect()}
    assert out["a"].n_events == 2
    assert abs(out["a"].decayed_count - 1.5) < 1e-9      # 1.0 + 0.5
    assert abs(out["a"].decayed_value - 3.0) < 1e-6      # 2*(1.0+0.5)
    assert abs(out["b"].decayed_count - 0.25) < 1e-9     # two half-lives
    assert abs(out["b"].decayed_value - 1.0) < 1e-6


def test_decayed_trending_partition_invariant(spark, sf_dir):
    from diabetes_etl_spark.plans.events import events_decayed_trending

    a = sorted(map(tuple, events_decayed_trending(spark, sf_dir).collect()))
    b = sorted(map(tuple, events_decayed_trending(spark, sf_dir).collect()))
    assert a == b


# -- multi-touch attribution -----------------------------------------------------


def test_multitouch_u_shape_weights(spark, tmp_path):
    """3 clicks before a purchase: 0.4 / 0.2 / 0.4; a single click
    gets 1.0; total credit equals the number of attributed
    purchases."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import (
        events_multitouch_attribution,
    )

    base = dt.datetime(2025, 1, 2, 10, 0, 0)
    rows = [
        # user 1: 3 clicks then a purchase
        (1, base - dt.timedelta(minutes=50), 1, "click", 0.0, "{}"),
        (2, base - dt.timedelta(minutes=30), 1, "click", 0.0, "{}"),
        (3, base - dt.timedelta(minutes=10), 1, "click", 0.0, "{}"),
        (4, base, 1, "purchase", 9.0, "{}"),
        # user 2: one click in-window
        (5, base - dt.timedelta(minutes=5), 2, "click", 0.0, "{}"),
        (6, base, 2, "purchase", 5.0, "{}"),
        # user 3: click OUTSIDE the 1h window -> unattributed
        (7, base - dt.timedelta(minutes=90), 3, "click", 0.0, "{}"),
        (8, base, 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "attr")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = {r.click_hour: r for r in
           events_multitouch_attribution(spark, d).collect()}
    # hours: 9 (clicks at 9:10,9:30,9:55) and 10 (9:50? no: base 10:00;
    # -50m=9:10, -30m=9:30, -10m=9:50, -5m=9:55 -> all hour 9)
    total_credit = sum(r.credit for r in out.values())
    total_touches = sum(r.n_touches for r in out.values())
    assert total_touches == 4
    assert abs(total_credit - 2.0) < 1e-9  # two attributed purchases
    assert set(out) == {9}
    assert abs(out[9].credit - 2.0) < 1e-9


def test_burstiness_known_patterns(spark, tmp_path):
    """Perfectly periodic gaps -> B = -1 bin (bin 0); highly variable
    gaps -> positive B (bin >= 5)."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import events_burstiness_profile

    base = dt.datetime(2025, 1, 1)
    rows = []
    eid = 0
    # user 1: periodic every 60s (sigma=0 -> B=-1 -> bin 0)
    for i in range(6):
        rows.append((eid, base + dt.timedelta(seconds=60 * i), 1,
                     "click", 0.0, "{}")); eid += 1
    # user 2: bursty — gaps 1s,1s,1s,10000s
    offs = [0, 1, 2, 3, 10003]
    for o in offs:
        rows.append((eid, base + dt.timedelta(seconds=o), 2,
                     "click", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "burst")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = {r.bin: r for r in events_burstiness_profile(spark, d).collect()}
    assert out[0].n_users == 1          # the periodic user at B=-1
    assert abs(out[0].burst_mass + 1.0) < 1e-9
    bursty_bins = [b for b in out if b >= 5]
    assert len(bursty_bins) == 1 and out[bursty_bins[0]].n_users == 1


def test_peak_concurrency_sweep_line(spark, tmp_path):
    """Three overlapping 5-min slots -> peak 3; a back-to-back handoff
    at exactly +5m must NOT double-count (half-open intervals)."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import events_peak_concurrency

    base = dt.datetime(2025, 3, 1, 12, 0, 0)
    rows = [
        # type a: 3 overlapping
        (1, base, 1, "a", 0.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 2, "a", 0.0, "{}"),
        (3, base + dt.timedelta(minutes=2), 3, "a", 0.0, "{}"),
        # type b: handoff exactly at the 5-minute boundary
        (4, base, 4, "b", 0.0, "{}"),
        (5, base + dt.timedelta(minutes=5), 5, "b", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "conc")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = {r.event_type: r for r in
           events_peak_concurrency(spark, d).collect()}
    assert out["a"].peak_concurrent == 3
    assert out["a"].n_intervals == 3
    assert out["b"].peak_concurrent == 1  # end processed before start


def test_daily_autocorrelation_on_periodic_series(spark, tmp_path):
    """Alternating hi/lo daily counts: lag-1 ACF strongly negative,
    lag-2 strongly positive."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import orders_daily_autocorrelation

    rows = []
    oid = 0
    base = dt.date(1995, 1, 1)
    for day in range(30):
        n = 20 if day % 2 == 0 else 2
        for _ in range(n):
            rows.append(
                (oid, 1, dt.datetime.combine(
                    base + dt.timedelta(days=day), dt.time()), 1.0, "P")
            )
            oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double, o_orderpriority string",
    )
    d = str(tmp_path / "acf")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    r = orders_daily_autocorrelation(spark, d).collect()[0]
    assert r.n_days == 30
    assert r.acf_approx_1 < -0.5
    assert r.acf_approx_2 > 0.5


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """20 days at rate 5, then 20 days at rate 15: the CUSUM magnitude
    peaks exactly at the shift boundary (last low day)."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import events_cusum_changepoint

    rows = []
    eid = 0
    base = dt.date(2025, 4, 1)
    for day in range(40):
        n = 5 if day < 20 else 15
        for k in range(n):
            rows.append((eid, dt.datetime.combine(
                base + dt.timedelta(days=day), dt.time(10, k)), 1,
                "click", 0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "cusum")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    r = events_cusum_changepoint(spark, d).collect()[0]
    assert r.n_days == 40
    assert r.change_day == base + dt.timedelta(days=19)
    assert r.cusum < 0  # low-rate prefix pulls the running sum down


def test_wilson_lower_bound_ranks_sanely(spark, sf_dir):
    """The bound must sit strictly below the rate for 0 < k < n and
    never let a tiny perfect cohort outrank a large strong one."""
    import math

    from diabetes_etl_spark.plans.events import events_wilson_conversion

    rows = events_wilson_conversion(spark, sf_dir).collect()
    assert rows
    z2 = 3.8416
    for r in rows:
        assert 0.0 <= r.wilson_lower <= r.rate + 1e-12
        if 0 < r.n_converted < r.n_users:
            assert r.wilson_lower < r.rate
        # replay the formula
        p, n = r.n_converted / r.n_users, r.n_users
        want = (p + z2 / (2 * n)
                - math.sqrt(z2) * math.sqrt(p * (1 - p) / n
                                            + z2 / (4.0 * n * n))) / (
            1 + z2 / n)
        assert abs(r.wilson_lower - round(want, 9)) < 1e-9
    # the classic comparison: 1/1 must not outrank 180/200
    def wl(k, n):
        p = k / n
        return (p + z2 / (2 * n)
                - math.sqrt(z2) * math.sqrt(p * (1 - p) / n
                                            + z2 / (4.0 * n * n))) / (
            1 + z2 / n)
    assert wl(1, 1) < wl(180, 200)


def test_seasonal_decomposition_flags_planted_spike(spark, tmp_path):
    """35 days with a weekly pattern plus mild drift; one mid-series
    day gets a 10x spike.  The spike day must be the anomaly with the
    largest residual; the far-from-spike days must not be flagged."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import events_seasonal_anomalies

    rows = []
    eid = 0
    base = dt.date(2025, 3, 3)  # a Monday
    for day in range(35):
        n = 10 + (day % 7) * 2 + (day % 3)  # weekly + mild aperiodic
        if day == 17:
            n += 120  # planted spike
        for _ in range(n):
            t = dt.datetime.combine(
                base + dt.timedelta(days=day), dt.time(12, 0))
            rows.append((eid, t, eid % 7, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "seas")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = events_seasonal_anomalies(spark, d).collect()
    assert len(out) == 35
    spike_day = (base + dt.timedelta(days=17)).strftime("%Y-%m-%d")
    by_day = {r.day: r for r in out}
    assert by_day[spike_day].is_anomaly
    # spike residual dominates every other day's
    others = [abs(r.residual) for r in out if r.day != spike_day]
    assert by_day[spike_day].residual > max(others)
    # days far from the spike (outside the +-3 trend window) are calm
    for day in (0, 5, 10, 28, 34):
        key = (base + dt.timedelta(days=day)).strftime("%Y-%m-%d")
        assert not by_day[key].is_anomaly, key


def test_theil_sen_ignores_outlier_days_ols_does_not(spark, tmp_path):
    """Clean linear series c = 50 + 3d with 3 planted 10x outlier
    days: the Theil-Sen slope/intercept recover (3, 50) EXACTLY
    (clean pairs are the majority, their slopes are exactly 3.0)
    while the OLS slope is dragged away."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import orders_theil_sen_trend

    rows = []
    oid = 0
    base = dt.date(1995, 1, 1)
    for day in range(30):
        n = 500 if day in (27, 28, 29) else 50 + 3 * day
        for _ in range(n):
            rows.append(
                (oid, 1, dt.datetime.combine(
                    base + dt.timedelta(days=day), dt.time()), 1.0, "P")
            )
            oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double, o_orderpriority string",
    )
    d = str(tmp_path / "theil")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    r = orders_theil_sen_trend(spark, d).collect()[0]
    assert r.n_days == 30 and r.n_pairs == 435
    assert r.ts_slope == 3.0
    assert r.ts_intercept == 50.0
    assert abs(r.ols_slope - 3.0) > 0.5  # OLS feels the outliers


def test_kaplan_meier_known_censoring_scenario(spark, tmp_path):
    """10 users, corpus ends day 30: 2 die at t=0, 4 die at t=10,
    3 censored at t=28, 1 censored at t=30.  KM: S(0)=0.8 (2/10),
    S(10)=0.8*0.5=0.4 (4/8 at risk); censored rows must NOT move
    the survival curve."""
    import datetime as dt
    import math

    from diabetes_etl_spark.plans.events import events_km_survival

    base = dt.date(2025, 1, 1)

    def ev(eid, uid, day):
        return (eid, dt.datetime.combine(
            base + dt.timedelta(days=day), dt.time(9)), uid, "c", 1.0, "{}")

    rows, eid = [], 0
    for uid in (1, 2):            # single-event users: t=0, dead
        rows.append(ev(eid, uid, 5)); eid += 1
    for uid in (3, 4, 5, 6):      # span [0,10], dead
        rows.append(ev(eid, uid, 0)); eid += 1
        rows.append(ev(eid, uid, 10)); eid += 1
    for uid in (7, 8, 9):         # span [0,28], censored
        rows.append(ev(eid, uid, 0)); eid += 1
        rows.append(ev(eid, uid, 28)); eid += 1
    rows.append(ev(eid, 10, 0)); eid += 1   # span [0,30], censored
    rows.append(ev(eid, 10, 30)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "km")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    out = {r.t_days: r for r in events_km_survival(spark, d).collect()}
    assert set(out) == {0, 10, 28, 30}
    assert (out[0].n_risk, out[0].n_deaths, out[0].n_censored) == (10, 2, 0)
    assert (out[10].n_risk, out[10].n_deaths) == (8, 4)
    assert (out[28].n_deaths, out[28].n_censored) == (0, 3)
    assert abs(math.exp(out[0].log_survival) - 0.8) < 1e-6
    assert abs(math.exp(out[10].log_survival) - 0.4) < 1e-6
    # censoring leaves the curve flat
    assert out[28].log_survival == out[10].log_survival
    assert out[30].log_survival == out[10].log_survival


def test_holt_smoothing_constant_and_ramp(spark, tmp_path):
    """Constant daily volume: level locks on, trend and MSE stay 0.
    Linear ramp: the trend estimate converges near the true slope."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import orders_holt_smoothing

    def write(days, counts, sub):
        rows, oid = [], 0
        base = dt.date(1995, 1, 1)
        for day in range(days):
            for _ in range(counts(day)):
                rows.append(
                    (oid, 1, dt.datetime.combine(
                        base + dt.timedelta(days=day), dt.time()), 1.0, "P")
                )
                oid += 1
        df = spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderdate timestamp, "
            "o_totalprice double, o_orderpriority string",
        )
        d = str(tmp_path / sub)
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        try:
            df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        return d

    r = orders_holt_smoothing(
        spark, write(20, lambda d: 5, "const")).collect()[0]
    assert r.n_days == 20
    assert r.level == 5.0 and r.trend == 0.0
    assert r.forecast_1 == 5.0 and r.forecast_7 == 5.0
    assert r.mse_1step == 0.0

    r = orders_holt_smoothing(
        spark, write(40, lambda d: 10 + 2 * d, "ramp")).collect()[0]
    assert 1.5 < r.trend < 2.5
    assert abs(r.forecast_1 - (r.level + r.trend)) < 1e-9


def test_mase_zero_for_perfect_weekly_pattern(spark, tmp_path):
    """Exactly week-periodic volumes: the lag-7 seasonal-naive errors
    are all zero -> MASE 0, while the one-step naive MAE is not."""
    import datetime as dt

    from diabetes_etl_spark.plans.events import orders_mase_backtest

    rows, oid = [], 0
    base = dt.date(1995, 1, 1)
    for day in range(35):
        for _ in range(10 * (day % 7 + 1)):
            rows.append(
                (oid, 1, dt.datetime.combine(
                    base + dt.timedelta(days=day), dt.time()), 1.0, "P")
            )
            oid += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double, o_orderpriority string",
    )
    d = str(tmp_path / "mase")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    try:
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    r = orders_mase_backtest(spark, d).collect()[0]
    assert r.n_days == 35
    assert r.mae_seasonal7 == 0.0 and r.mase_seasonal == 0.0
    assert r.mae_naive1 > 0.0
