"""Round-13 additions (second batch): the CUSUM drift monitor and
the later round-13 operator families."""

from __future__ import annotations

import pytest

from diabetes_etl_spark.plans import all_queries


@pytest.fixture(scope="module")
def reg():
    return all_queries(include_extended=True)


def test_cusum_closed_form_equals_recurrence(spark, sf_dir, reg):
    """The windowed Lindley closed form S_d = M_d - min(0, min M_j)
    must equal the textbook recurrence S_d = max(0, S_{d-1} + z_d)
    replayed sequentially from the query's own per-day columns."""
    rows = (
        reg["events_cusum_drift_monitor"].fn(spark, sf_dir)
        .orderBy("d")
        .collect()
    )
    assert len(rows) > 0
    s_hi = s_lo = 0.0
    for r in rows:
        z_hi = round(r["rate"] - r["mu0"] - 0.005, 9)
        z_lo = round(r["mu0"] - r["rate"] - 0.005, 9)
        s_hi = max(0.0, round(s_hi + z_hi, 9))
        s_lo = max(0.0, round(s_lo + z_lo, 9))
        assert r["s_hi"] == pytest.approx(s_hi, abs=2e-9)
        assert r["s_lo"] == pytest.approx(s_lo, abs=2e-9)
        assert r["alarm_hi"] == (r["s_hi"] > 0.05)
        assert r["alarm_lo"] == (r["s_lo"] > 0.05)


def test_cusum_decided_is_monotone_and_implied_by_alarms(
    spark, sf_dir, reg
):
    rows = (
        reg["events_cusum_drift_monitor"].fn(spark, sf_dir)
        .orderBy("d")
        .collect()
    )
    seen = False
    for r in rows:
        seen = seen or r["alarm_hi"] or r["alarm_lo"]
        assert r["drift_decided"] == seen


def test_cusum_partition_invariant(spark, sf_dir, reg):
    """DECIMAL-folded running sums/mins must be bit-identical under a
    different shuffle partitioning."""
    want = sorted(
        tuple(r)
        for r in reg["events_cusum_drift_monitor"].fn(spark, sf_dir).collect()
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        got = sorted(
            tuple(r)
            for r in reg["events_cusum_drift_monitor"]
            .fn(spark, sf_dir)
            .collect()
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
