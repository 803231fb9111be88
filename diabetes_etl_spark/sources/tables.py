"""Fixture-table loaders.

The driver materializes a TPC-H-ish star schema plus `events`,
`documents`, `embeddings` at /root/testdata/sf*/ (see TESTDATA.md).
Loading is a plain columnar parquet scan — Catalyst pushes projections
and predicates into the scan, so query code should `.select`/`.filter`
eagerly and let pruning do its job at 100 TB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright.  Read it as raw nanos (legacy long mode) and
    rebuild a TimestampType at microsecond precision — the fixture's
    values are all micro-aligned, so the conversion is lossless and
    matches DuckDB's nanosecond view of the same file.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming variant of the events loader (same nanos handling).

    Spark's file stream source wants a directory; the fixture is a single
    parquet file, so it is exposed through a per-sf symlink directory.
    """
    path = os.path.join(sf_dir, "events.parquet")
    stream_dir = os.path.join(
        tempfile.gettempdir(), "spark_graft_stream", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.format("parquet").schema(schema).load(stream_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> None:
    """Register fixture tables as temp views for the SQL entry point."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
