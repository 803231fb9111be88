"""Column profiling — the ANALYZE/data-quality pass a warehouse runs
before trusting a new 100 TB drop: per-column null rates, distinct
cardinality, numeric min/max/mean, and string length stats, computed
in ONE scan.

Shape: every per-column statistic is a conditional aggregate in a
single global groupBy().agg(...) — Spark evaluates all of them in one
partial/final aggregate pass (the shuffle carries one row per task),
then the wide 1-row result is unpivoted to (column, metric) rows
driver-free with a stack() projection.  Exact countDistinct is used
for the oracle-paired profile (it adds an expand + shuffle per
column); ``approx=True`` swaps in HLL approx_count_distinct for the
100 TB path, where a 2% cardinality error is a fine trade against the
exact distinct's per-column shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

from diabetes_etl_spark.functions.numeric import dec_avg, dec_cast


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value,
    mean_value, avg_length) — one row per input column, one scan.

    min/max/mean apply to numeric columns (NULL otherwise, surfaced
    as DOUBLE for a uniform schema; mean at 6 decimals via the
    deterministic decimal fold); avg_length to strings."""
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(
            F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls")
        )
        distinct = (
            F.approx_count_distinct(f.name)
            if approx
            else F.countDistinct(f.name)
        )
        aggs.append(distinct.alias(f"{f.name}__distinct"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"{f.name}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{f.name}__max"))
            aggs.append(
                dec_cast(dec_avg(c.cast("double"), 6), 6).alias(
                    f"{f.name}__mean"
                )
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{f.name}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{f.name}__max"))
            aggs.append(F.lit(None).cast("double").alias(f"{f.name}__mean"))
        if isinstance(f.dataType, StringType):
            aggs.append(
                dec_cast(dec_avg(F.length(c).cast("double"), 4), 4).alias(
                    f"{f.name}__avglen"
                )
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{f.name}__avglen"))
    wide = df.agg(*aggs)
    # unpivot the 1-row wide result into per-column rows with stack():
    # still a plain projection — no shuffle, no driver collect
    n_cols = len(df.columns)
    stack_args = []
    for f in df.schema.fields:
        stack_args.append(f"'{f.name}'")
        stack_args.extend(
            [
                f"`{f.name}__nulls`",
                f"`{f.name}__distinct`",
                f"`{f.name}__min`",
                f"`{f.name}__max`",
                f"`{f.name}__mean`",
                f"`{f.name}__avglen`",
            ]
        )
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({n_cols}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value, "
            "mean_value, avg_length)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nulls", "n_distinct",
        "min_value", "max_value", "mean_value", "avg_length",
    ).orderBy("column")
