"""Key-skew diagnostics — the measurement half of the skew toolkit
(operators/joins.py salted join and plans/relational.py salted agg are
the mitigation half).

Before salting a 100 TB join you need to know WHICH keys are heavy and
HOW heavy: shuffle partitions are sized for the average, and a key
holding >> rows/partitions of the data turns one reducer into the
job's critical path (or an OOM).  This operator computes, in ONE
aggregate pass over the keys:

- the top-N heaviest keys with absolute counts,
- each key's share of the table,
- its ratio to the MEAN key load (the "skew factor" — a key at 100x
  the mean is what AQE's skewedPartitionFactor looks for at the
  partition level, surfaced here at the KEY level before the join
  even runs).

Everything is exact integer arithmetic + single IEEE divisions, so the
output is oracle-checkable; at scale the same plan runs over a SAMPLE
(`df.sample(0.01)`) with identical shape — sampling changes the
numbers, not the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """(key, n_rows, share, x_vs_mean) for the ``top_n`` heaviest keys
    of ``key_col``, ordered by (n_rows DESC, key) with a total
    tiebreak.  share = n_rows / total_rows; x_vs_mean = n_rows /
    (total_rows / distinct_keys).  One groupBy + one broadcast 1-row
    aggregate + one top-k — no driver collect."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count("*").alias("__nkeys"),
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(
            "key",
            "n_rows",
            (F.col("n_rows") / F.col("__total").cast("double")).alias(
                "share"
            ),
            (
                F.col("n_rows")
                / (
                    F.col("__total").cast("double") / F.col("__nkeys")
                )
            ).alias("x_vs_mean"),
        )
        .orderBy(F.col("n_rows").desc(), F.col("key"))
    )
