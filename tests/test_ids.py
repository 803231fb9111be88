"""Global-id assignment (operators/ids.py) tests: correctness equals
the global rank, invariance to parallelism, and the no-single-
partition-corpus-exchange plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from diabetes_etl_spark.operators.ids import assign_global_ids


def _df(spark, n=1000, parts=7):
    return (
        spark.range(n)
        .select(
            (F.col("id") * 2654435761 % 1000003).alias("k"),
            F.col("id").alias("orig"),
        )
        .repartition(parts)
    )


def test_ids_equal_global_rank(spark):
    df = _df(spark)
    got = {
        r.k: r.global_id
        for r in assign_global_ids(df, ["k"]).collect()
    }
    want = {
        r.k: i
        for i, r in enumerate(df.orderBy("k").collect())
    }
    assert got == want


def test_ids_invariant_to_partition_count(spark):
    df = _df(spark)
    a = sorted(
        (r.k, r.global_id)
        for r in assign_global_ids(df, ["k"], num_buckets=3).collect()
    )
    b = sorted(
        (r.k, r.global_id)
        for r in assign_global_ids(df, ["k"], num_buckets=17).collect()
    )
    assert a == b


def test_ids_dense_and_zero_based(spark):
    out = assign_global_ids(_df(spark, 500), ["k"]).collect()
    ids = sorted(r.global_id for r in out)
    assert ids == list(range(500))


def test_no_single_partition_exchange_on_corpus(spark, sf_dir):
    """The corpus side must flow through rangepartitioning; the only
    SinglePartition exchange feeds the #partitions-row offset plan."""
    from diabetes_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = assign_global_ids(docs, ["doc_id"])
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "extended"
    )
    phys = plan.split("== Physical Plan ==")[-1]
    # corpus branch: the row_number window shuffles on the derived
    # bucket, not into a single partition …
    assert "Exchange hashpartitioning(_pid" in phys
    # … and at most ONE SinglePartition exchange exists — the
    # num_buckets-row offset prefix-sum, never the corpus itself
    assert phys.count("Exchange SinglePartition") <= 1
