#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count + a bounded collect of the
result) so the full plan — scans, shuffles, windows — actually runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diabetes_etl_spark.plans import all_queries
from diabetes_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "agg_global_kpis",
    "quantiles_by_flag",
    "window_topk_per_group",
    "window_running_lead_lag",
    "join_outer_order_counts",
    "events_sessionize_sql",
    "asof_purchase_last_click",
    "medallion_events_gold",
    # diabetes medallion + dashboard (the reference's own surface)
    "diab_gold_demographics",
    "diab_dash_risk_distribution",
    # LLM-pipeline extensions
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "sim_topk_cosine",
    "sim_lsh_topk",
    "text_quality_by_lang",
    "sim_lsh_topk_vectorized",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark(app_name="diabetes-etl-spark-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
    # Warm the JVM/session on the smallest fixture so per-query numbers
    # measure the plans, not session startup.
    registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
    # Warm the Python worker pool too: the first Pandas-UDF stage pays a
    # process spawn + numpy/pandas import per core (~20s across 32
    # cores), which is session startup, not plan cost.
    from pyspark.sql import functions as F  # noqa: PLC0415

    _warm = F.pandas_udf(lambda s: s, "double")
    spark.range(256).repartition(32).select(
        _warm(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        # noop sink: full plan executes exactly once, nothing written.
        # (count() would column-prune projections; count()+collect()
        # would execute the plan twice.)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
