"""File-arrival trigger tests (SURVEY.md §2.8 operational entry point;
reference: src/diabetes_etl_pipeline.py:10 — "Pipeline will
automatically trigger when new CSV files are uploaded").

The trigger fires a fresh PipelineRunner per arrival; the streaming
checkpoint keeps ingestion incremental and exactly-once no matter how
many times the trigger fires.
"""

from __future__ import annotations

import os
import shutil
import threading

import pytest

from diabetes_etl_spark.context import RunContext
from diabetes_etl_spark.diabetes.pipeline_def import build_diabetes_pipeline
from diabetes_etl_spark.pipeline.registry import PipelineRunner
from diabetes_etl_spark.streaming.watcher import FileArrivalTrigger

CSV_DIR = "/root/reference/data"
needs_csvs = pytest.mark.skipif(
    not os.path.isdir(CSV_DIR), reason="diabetes CSVs not available"
)


@needs_csvs
def test_file_arrival_fires_incremental_runs(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    wh = str(tmp_path / "wh")
    ctx = RunContext(fixed_now="2024-06-01 12:00:00", fixed_run_id="watch")

    def run_pipeline():
        # fresh runner per update (runners memoize); same warehouse +
        # checkpoint = incremental exactly-once across runs
        PipelineRunner(
            build_diabetes_pipeline(str(src), ctx=ctx, streaming=True),
            spark,
            mode="warehouse",
            warehouse=wh,
        ).run(["diabetes_bronze"])

    trig = FileArrivalTrigger((str(src),), run_pipeline, poll_interval=0.05)

    # empty dir, nothing new -> no run
    assert trig.poll_once() is False
    assert trig.runs == 0

    # file arrives -> a run fires and ingests it
    shutil.copy(f"{CSV_DIR}/diabetes_part_1.csv", src / "part_1.csv")
    assert trig.poll_once() is True
    assert spark.read.parquet(f"{wh}/diabetes_bronze").count() == 128

    # no change -> no run
    assert trig.poll_once() is False
    assert trig.runs == 1

    # second arrival -> incremental run, no re-ingest of file 1
    shutil.copy(f"{CSV_DIR}/diabetes_part_2.csv", src / "part_2.csv")
    assert trig.poll_once() is True
    bronze = spark.read.parquet(f"{wh}/diabetes_bronze")
    assert bronze.count() == 256
    assert bronze.select("file_name").distinct().count() == 2


@needs_csvs
def test_watch_loop_background_thread(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    wh = str(tmp_path / "wh")
    ctx = RunContext(fixed_now="2024-06-01 12:00:00", fixed_run_id="watch2")
    ran = threading.Event()

    def run_pipeline():
        PipelineRunner(
            build_diabetes_pipeline(str(src), ctx=ctx, streaming=True),
            spark,
            mode="warehouse",
            warehouse=wh,
        ).run(["diabetes_bronze"])
        ran.set()

    trig = FileArrivalTrigger((str(src),), run_pipeline, poll_interval=0.05)
    stop = threading.Event()
    t = trig.start_background(stop, max_runs=1, timeout=30)
    shutil.copy(f"{CSV_DIR}/diabetes_part_3.csv", src / "part_3.csv")
    assert ran.wait(timeout=60), "watcher never fired on file arrival"
    stop.set()
    t.join(timeout=30)
    assert trig.runs == 1
    assert spark.read.parquet(f"{wh}/diabetes_bronze").count() == 128


def test_ignores_hidden_and_foreign_files(tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    fired = []
    trig = FileArrivalTrigger(
        (str(src),), lambda: fired.append(1), poll_interval=0.01
    )
    (src / ".inprogress.csv").write_text("x")
    (src / "_SUCCESS").write_text("")
    (src / "notes.txt").write_text("not a csv")
    assert trig.poll_once() is False
    (src / "real.csv").write_text("a,b\n1,2\n")
    assert trig.poll_once() is True
    assert fired == [1]
