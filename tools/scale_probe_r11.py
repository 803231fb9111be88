#!/usr/bin/env python
"""10x scale spot-check for the round-11 queries (SCALE.md rows).

Reuses scale_probe_r10's replication conventions.  New rows this
round:

- ml_conformal_interval — the calibration order statistic now comes
  from the bounded-histogram exact-selection operator instead of an
  unpartitioned row_number() window (round-10 VERDICT #1); the probe
  shows the repaired plan's growth.
- classifier_lift_cutpoints — the no-global-sort decile twin
  (support-grain cum-count spine); its NTILE baseline
  classifier_lift_deciles is probed alongside for the before/after
  contrast.
- classifier_knn_lsh_prod — the 10-table production profile
  (round-10 VERDICT #5); probed next to the 24-table covering form
  so the constant-factor cut is a measured number, not a claim.
- events_ab_hodges_lehmann — re-probed after the support-cap guard
  (the guard must not fire on money-grain data: ratio unchanged).
"""

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
    "ml_conformal_interval",
    "classifier_lift_deciles",
    "classifier_lift_cutpoints",
    "classifier_knn_lsh",
    "classifier_knn_lsh_prod",
    "events_ab_hodges_lehmann",
    "events_ab_healthcheck",
    "events_ab_fdr_bh",
    "events_ab_sequential_msprt",
    "events_ipw_stratified_ate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-probe-r11")
    reg = all_queries(include_extended=True)
    tmp = tempfile.mkdtemp(prefix="scale10x_r11_")
    try:
        replicate(spark, sf_dir, tmp)

        def run(name, d):
            t0 = time.perf_counter()
            reg[name].fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            return round(time.perf_counter() - t0, 2)

        # warm
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
