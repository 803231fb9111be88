"""Salted-join equivalence and small-file compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.joins import salted_join
from diabetes_etl_spark.sources.maintenance import compact_files, data_file_count
from diabetes_etl_spark.sources.tables import load_table, write_sink


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    plain = sorted(
        map(tuple, orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).collect())
    )
    salted = sorted(
        map(tuple, salted_join(
            orders, customer, "o_custkey", "c_custkey",
            salt_src="o_orderkey", n_salts=16,
        ).collect())
    )
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    # dimension missing most keys => left join must keep every order
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    ).filter(F.col("c_custkey") < 10)
    out = salted_join(
        orders, dim, "o_custkey", "c_custkey",
        salt_src="o_orderkey", n_salts=8, how="left",
    )
    assert out.count() == orders.count()


def test_compact_files_reduces_count_keeps_rows(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "shattered")
    write_sink(src.repartition(64), path)
    assert data_file_count(path) >= 64
    n_rows = src.count()
    before, after = compact_files(spark, path, target_mb=128)
    assert before >= 64 and after < before
    back = spark.read.parquet(path)
    assert back.count() == n_rows
    assert sorted(back.columns) == sorted(src.columns)


def test_compact_partitioned_dir(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "parted")
    write_sink(
        src.repartition(16), path, partition_by=("o_orderstatus",)
    )
    n_rows = src.count()
    before, after = compact_files(
        spark, path, target_mb=128, partition_by=("o_orderstatus",)
    )
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == n_rows
    # partition layout survives: the column is still partition-prunable
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
