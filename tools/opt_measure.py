"""Optimization measurement harness (rounds 13+).

Times named registry queries in isolation with the noop sink (guide
§1.4) and captures the POST-EXECUTION ``explain("formatted")`` plan
(the AQE final plan) to ``plans/$SPARK_GRAFT_PLANS_ROUND/<name>_
<tag>.txt`` (default round: r14):

    python tools/opt_measure.py q1_pricing_summary sim_pq_adc_topk \
        [--sf /root/testdata/sf0.1] [--reps 3] [--tag before]

Prints one line per query: min / median over reps, plus exchange and
python-boundary counts from the executed plan.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diabetes_etl_spark.plans.registry import all_queries  # noqa: E402
from diabetes_etl_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default=None, help="write plans/r13/<name>_<tag>.txt")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-measure-r13")
    registry = all_queries(include_extended=True)
    # session warm-up mirroring bench.py so numbers are comparable
    registry["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001").count()
    from pyspark.sql import functions as F  # noqa: PLC0415

    _warm = F.pandas_udf(lambda s: s, "double")
    spark.range(256).repartition(32).select(
        _warm(F.col("id").cast("double"))
    ).write.format("noop").mode("overwrite").save()
    if "stream_ingest_events" in registry:
        registry["stream_ingest_events"].fn(
            spark, "/root/testdata/sf0.001"
        ).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        spec = registry.get(name)
        if spec is None:
            print(f"{name}: NOT IN REGISTRY", flush=True)
            continue
        ts = []
        df = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = spec.fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        plan = formatted_plan(df)
        if args.tag:
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        stats = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "py": plan.count("MapInPandas")
            + plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInArrow")
            + plan.count("FlatMapGroupsInPandas"),
        }
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name}: min={min(ts)} med={med} samples={ts} {stats}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
