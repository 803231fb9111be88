"""Bucketed managed tables (sources/bucketed.py): the co-located-join
layout must actually eliminate the join-side shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.sources.bucketed import (
    bucket_table_name,
    bucketed_pair,
    ensure_bucketed,
)
from diabetes_etl_spark.sources.tables import load_table


def _plan_str(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )


def test_bucketed_join_has_no_exchange_on_join_key(spark, sf_dir):
    """With broadcast disabled (at 100 TB neither fact side fits),
    the bucketed layout must carry the join: both scans read
    Bucketed: true and the sort-merge join sits directly on them —
    no Exchange anywhere in the plan."""
    orders, lineitem = bucketed_pair(
        spark, sf_dir, "orders", "lineitem", "o_orderkey", "l_orderkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(
            lineitem, lineitem["l_orderkey"] == orders["o_orderkey"]
        ).select("o_orderkey", "l_extendedprice")
        plan = _plan_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan  # both sides pre-co-located
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Bucketed: true" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    orders, lineitem = bucketed_pair(
        spark, sf_dir, "orders", "lineitem", "o_orderkey", "l_orderkey"
    )
    got = (
        orders.join(
            lineitem, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    ro = load_table(spark, sf_dir, "orders")
    rl = load_table(spark, sf_dir, "lineitem")
    want = (
        ro.join(rl, rl["l_orderkey"] == ro["o_orderkey"])
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_groupby_on_bucket_key_skips_exchange(spark, sf_dir):
    name = ensure_bucketed(spark, sf_dir, "orders", ("o_orderkey",), 8)
    agg = spark.table(name).groupBy("o_orderkey").agg(
        F.count("*").alias("n")
    )
    assert "Exchange" not in _plan_str(agg)


def test_ensure_bucketed_is_idempotent_and_deterministic(spark, sf_dir):
    a = ensure_bucketed(spark, sf_dir, "orders", ("o_orderkey",), 8)
    b = ensure_bucketed(spark, sf_dir, "orders", ("o_orderkey",), 8)
    assert a == b == bucket_table_name(sf_dir, "orders", ("o_orderkey",), 8)
    # a different layout gets a different catalog entry
    c = bucket_table_name(sf_dir, "orders", ("o_orderkey",), 16)
    assert c != a
