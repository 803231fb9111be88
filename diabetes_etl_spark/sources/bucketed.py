"""Bucketed managed tables: shuffle-free co-located joins.

At 100 TB the single biggest join cost is the pairwise shuffle of both
fact tables onto the join key.  Spark's table bucketing pre-shuffles
ONCE at write time: `bucketBy(n, key)` hashes every row into one of n
bucket files per partition, records the layout in the catalog, and a
later equi-join of two tables bucketed on the same key with the same
bucket count reads both sides already co-partitioned — the physical
plan contains NO Exchange on the join key (asserted in
tests/test_bucketed.py).  `sortBy(key)` additionally pre-sorts each
bucket so sort-merge join can skip its per-task sort.

This is the batch analogue of the repo's other shuffle-avoidance
tools (broadcast scalar-attach, AQE skew splits): pay the shuffle
once, on ingest, amortized over every downstream join/aggregate on
that key — exactly how a 1000-executor warehouse lays out its core
fact tables.

Reference parity: the reference's managed runtime (Delta liquid
clustering) owns physical layout; this module is the
catalog-native Spark expression of the same lever, next to
`sources/versioned.py`'s OPTIMIZE/Z-ORDER file-level clustering.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def bucket_table_name(sf_dir: str, table: str, keys: tuple[str, ...],
                      n_buckets: int) -> str:
    """Deterministic managed-table name for a bucketed copy of a
    fixture table (per sf_dir, so audits at different scale factors
    never collide)."""
    tag = hashlib.md5(
        f"{sf_dir}|{table}|{','.join(keys)}|{n_buckets}".encode()
    ).hexdigest()[:10]
    return f"bkt_{table}_{tag}"


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    keys: tuple[str, ...],
    n_buckets: int = 8,
    sort: bool = True,
) -> str:
    """Write `table` from sf_dir as a bucketed managed table (once;
    later calls reuse the catalog entry) and return its name.

    The write itself is the one-time shuffle the layout amortizes:
    repartition on the bucket keys so each task writes a bounded
    number of bucket files (without it every input partition emits
    n_buckets files — the classic small-file explosion at scale).
    """
    from diabetes_etl_spark.sources.tables import load_table

    name = bucket_table_name(sf_dir, table, keys, n_buckets)
    if spark.catalog.tableExists(name):
        return name
    # a fresh session starts with an empty in-memory catalog, but the
    # managed location under spark-warehouse/ survives on disk; the
    # bucketing metadata lives in the catalog, so a location without a
    # catalog entry is unusable — clear it and rewrite
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name.lower()}", ignore_errors=True)
    df = load_table(spark, sf_dir, table).repartition(n_buckets, *keys)
    writer = df.write.bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.mode("overwrite").format("parquet").saveAsTable(name)
    return name


def bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    left: str,
    right: str,
    left_key: str,
    right_key: str,
    n_buckets: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Both tables bucketed on their join keys with one shared bucket
    count — the precondition for an exchange-free equi-join."""
    ln = ensure_bucketed(spark, sf_dir, left, (left_key,), n_buckets)
    rn = ensure_bucketed(spark, sf_dir, right, (right_key,), n_buckets)
    return spark.table(ln), spark.table(rn)
