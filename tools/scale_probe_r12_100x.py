#!/usr/bin/env python
"""100x EVENTS-replication probe for the round-12 gate promotions.
(Round 13 reuses this exact script via tools/scale_probe_r13_100x.py,
which only swaps the QUERIES list — verdict-r12 #8 asked for new probe
rows at the SAME probe version.)

The six causal/inference queries promoted into the round-12 gate all
claim bounded epilogues (O(days) / O(strata) / O(value-support) /
O(score-support) spines after one user- or day-grain pass).  The 10x
rows in SCALE.md verify the first order of magnitude; this probe
replicates the sf0.1 EVENTS table 100x (user_id/event_id offsets, the
scale_probe_r10 convention — ~10M events, ~150k users) and times each
query there, printing ratio vs 100x-linear.  Flat ratios are the
direct evidence that the only corpus-scale stage is the first grouped
pass.  Other tables copy through 1x (only events-driven queries are
probed).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from diabetes_etl_spark.plans import all_queries  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "events_ab_fdr_bh",
    "events_ipw_stratified_ate",
    "events_ab_quantile_effects",
    "stream_msprt_monitor",
    "events_ab_healthcheck",
    "events_uplift_qini_cutpoints",
    "events_aipw_doubly_robust",
    "events_ab_rmst",
    "events_ab_confidence_sequence",
]

COPIES = 100


def replicate_events_100x(spark, sf_dir: str, tmp: str) -> None:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    reduce(
        DataFrame.unionByName,
        [
            ev.select(
                (F.col("event_id") + k * 10_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + k * 10_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for k in range(COPIES)
        ],
    ).repartition(64).write.mode("overwrite").parquet(
        f"{tmp}/events.parquet"
    )
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings",
    ):
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{tmp}/{t}.parquet")
        elif os.path.exists(src):
            shutil.copy2(src, f"{tmp}/{t}.parquet")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-probe-r12-100x")
    reg = all_queries(include_extended=True)
    tmp = tempfile.mkdtemp(prefix="scale100x_r12_")
    try:
        replicate_events_100x(spark, sf_dir, tmp)

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
            t100 = min(run(name, tmp) for _ in range(2))
            print(
                f"{name}: 1x={t1}s 100x={t100}s "
                f"ratio_vs_linear={round(t100 / (COPIES * t1), 3)}"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
