#!/usr/bin/env python
"""10x scale spot-check for the round-12 additions (SCALE.md rows):
the cutpoint-bucketed Qini production twin (vs the rank form's
documented per-user window) and the streaming mSPRT monitor's drain
latency at 10x event volume (the two round-11 families without a
SCALE row, round-11 VERDICT #7)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe_r10 import replicate  # noqa: E402

from diabetes_etl_spark.plans import all_queries  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "events_uplift_qini_cutpoints",
    "stream_msprt_monitor",
    "events_rdd_estimate",
    "events_aipw_doubly_robust",
    "events_policy_ips_snips",
    "events_ab_rmst",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-probe-r12")
    reg = all_queries(include_extended=True)
    tmp = tempfile.mkdtemp(prefix="scale10x_r12_")
    try:
        replicate(spark, sf_dir, tmp)

        def run(name, d):
            t0 = time.perf_counter()
            reg[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 2)

        reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
        for name in QUERIES:
            run(name, "/root/testdata/sf0.001")
            t1 = min(run(name, sf_dir) for _ in range(2))
            t10 = min(run(name, tmp) for _ in range(2))
            print(
                f"{name}: 1x={t1}s 10x={t10}s "
                f"ratio_vs_linear={round(t10 / (10 * t1), 2)}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
