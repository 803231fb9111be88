"""AQE skew-join split: the runtime safety net under the repo's
explicit salting operators (operators/joins.py salted join,
operators/skew.py key_skew_profile).

The session enables spark.sql.adaptive.skewJoin; this test proves the
split actually FIRES at runtime: a 99%-one-key join, broadcast
disabled (the 100 TB fact-fact regime), must finish with
SortMergeJoin(skew=true) in the final adaptive plan — the hot
partition was split across tasks instead of serializing one reducer.

Two caveats this test documents by construction:
- AQE only rewrites a finalized stage, so the plan is inspected AFTER
  an action, and
- a downstream shuffle on the join key suppresses the rewrite (Spark
  refuses to break the required partitioning unless
  forceOptimizeSkewedJoin is set) — which is exactly why the repo
  keeps the explicit salting path for skewed-join-then-aggregate
  shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.shuffle.partitions": "8",
}


def _with_confs(spark, fn):
    prev = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    try:
        return fn()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_join(spark):
    left = spark.range(200_000).select(
        F.when(F.col("id") % 100 < 99, 7)
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("a"),
        F.lit("x" * 40).alias("pad"),
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), F.col("id").alias("b")
    )
    return left.join(right, "k").select("k", "a", "b")


def test_aqe_splits_skewed_join_partition(spark):
    def run():
        j = _skewed_join(spark)
        rows = j.count()
        j.collect()  # finalize the adaptive plan on the join itself
        plan = spark._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        return rows, plan

    rows, plan = _with_confs(spark, run)
    assert rows == 200_000
    assert plan.count("skew=true") >= 1, plan[:2000]


def test_skew_results_match_unskewed_plan(spark):
    got = _with_confs(
        spark, lambda: sorted(
            map(tuple, _skewed_join(spark).groupBy("k").count().collect())
        )
    )
    want = sorted(
        map(tuple, _skewed_join(spark).groupBy("k").count().collect())
    )
    assert got == want
