#!/usr/bin/env python
"""Medallion-pipeline CSV-replication probe (verdict-r12 #8): the
diabetes pipeline's own E2E number has only ever been scaled via the
events twin; this probe replicates the reference's 6 CSV part-files
10x and 100x AT FILE GRAIN (10x = 60 files / 7,680 rows, 100x = 600
files / 76,800 rows — scaling both the file-listing path the
availableNow stream walks and the row volume) and times the full
streaming bronze -> silver -> gold/view warehouse run at each size,
printing ratio vs linear.  Sub-linear ratios are the expected
signature: the per-run cost is dominated by the ~17-dataset DAG's
fixed planning/trigger overhead, and the data passes are one grouped
scan each.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diabetes_etl_spark.context import RunContext  # noqa: E402
from diabetes_etl_spark.diabetes.pipeline_def import (  # noqa: E402
    build_diabetes_pipeline,
)
from diabetes_etl_spark.pipeline.registry import PipelineRunner  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402

CSV_DIR = "/root/reference/data"


def replicate_csvs(copies: int, tmp: str) -> None:
    names = sorted(
        f for f in os.listdir(CSV_DIR) if f.endswith(".csv")
    )
    for k in range(copies):
        for f in names:
            stem, ext = os.path.splitext(f)
            shutil.copy2(
                os.path.join(CSV_DIR, f),
                os.path.join(tmp, f"{stem}_copy{k:03d}{ext}"),
            )


def run_once(spark, csv_dir: str) -> float:
    wh = tempfile.mkdtemp(prefix="probe_e2e_wh_")
    try:
        t0 = time.perf_counter()
        ctx = RunContext(
            fixed_now="2024-06-01 12:00:00", fixed_run_id="probe-e2e"
        )
        PipelineRunner(
            build_diabetes_pipeline(csv_dir, ctx=ctx, streaming=True),
            spark,
            mode="warehouse",
            warehouse=wh,
        ).run()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    spark = get_spark(app_name="scale-probe-r13-pipeline")
    # warm-up: first streaming run pays one-time machinery init
    run_once(spark, CSV_DIR)
    t1 = min(run_once(spark, CSV_DIR) for _ in range(2))
    print(f"pipeline_e2e 1x (768 rows, 6 files): {t1}s")
    for copies in (10, 100):
        tmp = tempfile.mkdtemp(prefix=f"probe_csv_{copies}x_")
        try:
            replicate_csvs(copies, tmp)
            tn = min(run_once(spark, tmp) for _ in range(2))
            print(
                f"pipeline_e2e {copies}x ({768 * copies} rows, "
                f"{6 * copies} files): {tn}s "
                f"ratio_vs_linear={round(tn / (copies * t1), 3)}"
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
