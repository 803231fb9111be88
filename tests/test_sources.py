"""Source/sink coverage: multi-format round-trips (csv/json/orc keep
values and types under an explicit schema) and bucketed managed tables
(the write-once-shuffle, join-forever-free layout for 100 TB fact
tables)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from diabetes_etl_spark.sources.tables import (
    load_table,
    read_source,
    save_bucketed,
    write_sink,
)


@pytest.fixture(scope="module")
def lineitem_slice(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_shipdate",
        )
        .filter(F.col("l_orderkey") < 200)
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_format_round_trip(spark, tmp_path_factory, lineitem_slice, fmt):
    path = str(tmp_path_factory.mktemp("src") / f"rt_{fmt}")
    write_sink(lineitem_slice, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=lineitem_slice.schema)
    assert back.schema == lineitem_slice.schema
    want = sorted(map(tuple, lineitem_slice.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want


def test_text_formats_require_schema(spark, tmp_path_factory, lineitem_slice):
    path = str(tmp_path_factory.mktemp("src") / "noschema")
    write_sink(lineitem_slice, path, fmt="csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_source(spark, path, fmt="csv")


def test_partitioned_sink_prunes(spark, tmp_path_factory, lineitem_slice):
    path = str(tmp_path_factory.mktemp("src") / "parted")
    write_sink(lineitem_slice, path, fmt="parquet", partition_by=("l_returnflag",))
    back = read_source(spark, path, fmt="parquet").filter(
        F.col("l_returnflag") == "R"
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter handled at listing time, not as a data filter
    assert back.count() == lineitem_slice.filter(F.col("l_returnflag") == "R").count()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Both sides bucketed on the join key => SortMergeJoin with zero
    Exchange operators (broadcast disabled to force the SMJ path)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    save_bucketed(orders, "t_orders_bkt", ("o_custkey",), 8, ("o_custkey",))
    save_bucketed(customer, "t_customer_bkt", ("c_custkey",), 8, ("c_custkey",))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_orders_bkt").join(
            spark.table("t_customer_bkt"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the same thing as the plain join
        plain = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_customer_bkt")


def test_bucketed_aggregation_is_shuffle_free(spark, sf_dir):
    """groupBy on the bucket key reuses the bucketing => no Exchange."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    save_bucketed(orders, "t_orders_bkt_agg", ("o_custkey",), 8)
    try:
        agg = (
            spark.table("t_orders_bkt_agg")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt_agg")


def test_save_range_sorted_yields_disjoint_file_ranges(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    from diabetes_etl_spark.sources.tables import load_table, save_range_sorted

    out = str(tmp_path / "orders_sorted")
    save_range_sorted(
        load_table(spark, sf_dir, "orders"), out, ("o_orderkey",), n_files=4
    )
    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        col_idx = md.schema.to_arrow_schema().get_field_index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
            # within a file, row groups are sorted: tight stats
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    # files' key ranges must be pairwise disjoint (range partitioning)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, (ranges,)
    # and a key-filtered scan pushes the predicate to those footers
    got = (
        spark.read.parquet(out)
        .filter("o_orderkey = 7")
        .select("o_orderkey")
        .collect()
    )
    assert [r.o_orderkey for r in got] == [7]


def test_merge_schema_reads_evolving_parquet(spark, tmp_path):
    """Schema evolution: files written before a column existed merge
    with later files (mergeSchema) — the additive-evolution contract a
    long-lived 100 TB table needs."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "k long, v string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, score double"
    ).write.mode("append").parquet(out)
    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"k", "v", "score"}
    rows = {r.k: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}


def test_csv_malformed_row_handling_modes(spark, tmp_path):
    """Ingest-side data quality: PERMISSIVE captures bad rows in
    _corrupt_record, DROPMALFORMED drops them, FAILFAST raises — the
    three contracts a bronze layer chooses between."""
    p = tmp_path / "dirty.csv"
    p.write_text("k,v\n1,10\nnot_an_int,20\n3,30\n")
    schema = "k int, v int, _corrupt_record string"
    permissive = read_source(
        spark, str(p), fmt="csv", schema=schema, mode="PERMISSIVE"
    )
    bad = permissive.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and "not_an_int" in bad[0]._corrupt_record
    dropped = read_source(
        spark, str(p), fmt="csv", schema="k int, v int", mode="DROPMALFORMED"
    )
    assert sorted(r.k for r in dropped.collect()) == [1, 3]
    import pytest as _pytest

    failfast = read_source(
        spark, str(p), fmt="csv", schema="k int, v int", mode="FAILFAST"
    )
    # pin the SPECIFIC failure (malformed-record abort), not any error
    with _pytest.raises(Exception, match="(?i)malformed"):
        failfast.collect()
