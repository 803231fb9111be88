"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a CPU-bound operator input has at least cluster-width
    parallelism.

    A small parquet file arrives as a single input split, so expensive
    per-row expression work (minhash signatures, shingling, LSH
    projections) would run on ONE core no matter how many executors
    exist.  At real scale the scan is already wide and this is a no-op
    — the repartition only fires when the source is narrower than the
    default parallelism, so it never adds a shuffle to a big input.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
