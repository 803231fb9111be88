"""Regression tests for the round-1 ADVICE findings.

1. ``expect_or_fail`` must abort the update on any violating row (it was
   silently ignored — a data-quality-gate bypass).
2. ``asof_join`` must return all payload columns from the single matched
   right row, including its NULLs (independent carry-forward could mix
   columns from different right rows).
3. The events loader must not mutate session state
   (``spark.sql.legacy.parquet.nanosAsLong`` used to leak).
4. A crash between ``compact_files``'s two renames must be recoverable.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.asof import asof_join
from diabetes_etl_spark.pipeline.registry import (
    ExpectationFailed,
    Pipeline,
    PipelineRunner,
)
from diabetes_etl_spark.sources.maintenance import (
    compact_files,
    data_file_count,
    recover_compaction,
)
from diabetes_etl_spark.sources.tables import load_table


# -- 1. expect_or_fail ----------------------------------------------------


def test_expect_or_fail_aborts_on_violation(spark):
    p = Pipeline("fail-test")

    @p.table(name="src")
    @Pipeline.expect_or_fail("positive_v", "v > 0")
    def src(ctx):
        return spark.createDataFrame([Row(v=1), Row(v=-2), Row(v=3)])

    runner = PipelineRunner(p, spark, mode="views")
    with pytest.raises(ExpectationFailed, match="positive_v.*1 row"):
        runner.run(["src"])


def test_expect_or_fail_passes_when_clean(spark):
    p = Pipeline("fail-test-clean")

    @p.table(name="src")
    @Pipeline.expect_or_fail("positive_v", "v > 0")
    def src(ctx):
        return spark.createDataFrame([Row(v=1), Row(v=3)])

    runner = PipelineRunner(p, spark, mode="views")
    out = runner.run(["src"])
    assert out["src"].count() == 2


# -- 2. asof atomic-row semantics ----------------------------------------


def test_asof_join_carries_matched_rows_nulls(spark):
    """The most recent right row has a NULL payload column: the asof
    result must surface THAT NULL, not an older row's non-NULL value."""
    ts = datetime.datetime
    left = spark.createDataFrame(
        [Row(k=1, lts=ts(2024, 1, 1, 12, 0, 0))]
    )
    right = spark.createDataFrame(
        [
            # older row: both payloads set
            Row(k=1, rts=ts(2024, 1, 1, 10, 0, 0), a=100.0, b="old"),
            # most recent row before lts: a is NULL
            Row(k=1, rts=ts(2024, 1, 1, 11, 0, 0), a=None, b="new"),
        ]
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="lts",
        right_ts="rts",
        value_cols={"rts": "match_ts", "a": "a", "b": "b"},
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert row.match_ts == ts(2024, 1, 1, 11, 0, 0)
    assert row.b == "new"
    assert row.a is None, "NULL from the matched row must not be backfilled"


def test_asof_join_no_prior_right_row_gives_nulls(spark):
    ts = datetime.datetime
    left = spark.createDataFrame([Row(k=1, lts=ts(2024, 1, 1, 9, 0, 0))])
    right = spark.createDataFrame(
        [Row(k=1, rts=ts(2024, 1, 1, 10, 0, 0), a=1.0)]
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols={"a": "a"},
    ).collect()
    assert len(out) == 1 and out[0].a is None


# -- 3. loader leaves session conf untouched ------------------------------


def test_events_loader_does_not_mutate_session_conf(spark, sf_dir):
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    df = load_table(spark, sf_dir, "events")
    assert df.limit(5).count() == 5
    assert spark.conf.get(key, None) == before


# -- 4. compaction crash recovery ----------------------------------------


def _write_dataset(spark, path: str) -> int:
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(8).write.parquet(path)
    return 1000


def test_recover_compaction_restores_backup(spark, tmp_path):
    path = str(tmp_path / "ds")
    n = _write_dataset(spark, path)
    backup = path + "__pre_compact"
    # simulate a crash between the two renames: path gone, backup present
    os.rename(path, backup)
    assert recover_compaction(path)
    assert spark.read.parquet(path).count() == n
    assert not os.path.exists(backup)


def test_recover_compaction_discards_stale_backup(spark, tmp_path):
    path = str(tmp_path / "ds")
    n = _write_dataset(spark, path)
    backup = path + "__pre_compact"
    os.makedirs(backup)  # stale leftover after a post-swap crash
    assert recover_compaction(path)
    assert not os.path.exists(backup)
    assert spark.read.parquet(path).count() == n


def test_compact_files_self_heals_before_running(spark, tmp_path):
    path = str(tmp_path / "ds")
    n = _write_dataset(spark, path)
    os.rename(path, path + "__pre_compact")  # crashed mid-swap earlier
    before, after = compact_files(spark, path, target_mb=128)
    assert spark.read.parquet(path).count() == n
    assert after <= before
    assert data_file_count(path) == after


# -- 5. widen() must not probe df.rdd (round-3 VERDICT #6) ----------------


def test_widen_repartitions_narrow_scan(spark, sf_dir):
    from diabetes_etl_spark.operators.util import widen

    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    # a tiny fixture scan estimates << defaultParallelism splits
    out = widen(docs)
    assert out.rdd.getNumPartitions() >= min(target, 8)


def test_widen_is_noop_when_scan_estimates_wide(spark, sf_dir):
    from diabetes_etl_spark.operators.util import widen

    docs = load_table(spark, sf_dir, "documents")
    # shrink the split size so Catalyst stats estimate a wide scan:
    # widen must then return the input unchanged (no repartition at
    # scale, where the scan is already wide)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        out = widen(docs)
        assert out is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_operator_path_has_no_rdd_probe():
    """The operator/plan modules must not touch df.rdd (forces eager
    physical planning + RDD lineage and bypasses AQE)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "diabetes_etl_spark"
    offenders = []
    for f in pkg.rglob("*.py"):
        src = f.read_text()
        if ".rdd" in src:
            offenders.append(str(f))
    assert offenders == [], f".rdd probe found in {offenders}"
