"""SparkSession factory with scale-aware defaults.

Defaults are tuned for local[N] testing but chosen so the same code is
correct on a multi-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting) — the OSS
  equivalent of the reference's `pipelines.autoOptimize.managed=true`
  (reference: src/diabetes_etl_pipeline.py:49-52).
- `spark.sql.session.timeZone=UTC` so timestamp semantics match the
  DuckDB oracle and are cluster-tz-independent.
- shuffle partitions default to the local core count; on a real cluster
  AQE coalesces from a higher initial number, so we only pin it down
  when running locally.
- Arrow enabled for any pandas-UDF path (vectorized transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "diabetes-etl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
        )
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
