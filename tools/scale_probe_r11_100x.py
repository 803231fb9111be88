#!/usr/bin/env python
"""One-off 100x spot check for docs_prep_pipeline_v4 (round-10 VERDICT
optional #7): the full-chain curation composite's three stages have
individual 10x probes, but the chain's edge-volume interaction at
copytag density did not have a 100x row.  Replicates documents 100x
with the copytag convention (each doc gains 99 mutual near-dup copies
— the duplication-heavy worst case for both the URL-group and DBSCAN
stages), 64-way repartitioned, and times the composite min-of-2.
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-probe-r11-100x")
    reg = all_queries(include_extended=True)
    tmp = tempfile.mkdtemp(prefix="scale100x_r11_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        reduce(
            DataFrame.unionByName,
            [
                docs.select(
                    (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                    F.concat(
                        F.col("text"), F.lit(f" copytag{k}")
                    ).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
                for k in range(100)
            ],
        ).repartition(64).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )

        def run(d):
            t0 = time.perf_counter()
            reg["docs_prep_pipeline_v4"].fn(spark, d).write.format(
                "noop"
            ).mode("overwrite").save()
            return round(time.perf_counter() - t0, 2)

        run("/root/testdata/sf0.001")  # warm
        t1 = min(run(sf_dir) for _ in range(2))
        t100 = min(run(tmp) for _ in range(2))
        print(
            f"docs_prep_pipeline_v4: 1x={t1}s 100x={t100}s "
            f"ratio_vs_linear={round(t100 / (100 * t1), 3)}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
