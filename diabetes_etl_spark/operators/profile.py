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


def encoding_profile(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    kind: str,
    label: str | None = None,
) -> DataFrame:
    """One-row physical-encoding profile for ``value_col`` under the
    table's LOGICAL key order (``order_cols`` — natural scan order is
    engine/partitioning-dependent, so runs are only well-defined
    against a declared sort): run statistics, bit widths, and an
    integer cost model choosing among RLE / DICT / DELTA / PLAIN —
    the storage-advisor question every 100 TB layout decision starts
    with (cf. Abadi et al. 2006, integrating compression into
    column stores).

    ``kind``: 'int' (value must cast to BIGINT; DELTA applies) or
    'str' (DELTA excluded, width = 8 * max length).

    Cost model (bits, all exact integers):
      RLE   = n_runs * (value_bits + 32)
      DICT  = n_rows * bits(n_distinct) + n_distinct * 64
      DELTA = n_rows * (bits(max_abs_delta) + 1)     [int only]
      PLAIN = n_rows * 64  (int)  /  8 * total_chars (str)
    recommended = argmin with the fixed tie order RLE, DICT, DELTA,
    PLAIN.  A real writer measures; this ranks candidates
    deterministically — and at 100 TB you run it on a SAMPLE, the
    model is order-of-magnitude by design.

    Scale note: run/delta statistics need one sort by the key
    columns (a real table would already be range-sorted or
    bucket-sorted by them; cf. sources/tables.py range layout); all
    other aggregates are map-side-combined single passes."""
    from pyspark.sql import Window

    if kind not in ("int", "str"):
        raise ValueError(f"kind must be 'int' or 'str', got {kind!r}")
    name = label or value_col
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    v = F.col("__v")
    base = df.select(
        (
            F.col(value_col).cast("long")
            if kind == "int"
            else F.col(value_col).cast("string")
        ).alias("__v"),
        *[F.col(c) for c in order_cols],
    )
    chg = (
        F.when(F.lag(v).over(w).isNull(), F.lit(1))
        .when(v != F.lag(v).over(w), F.lit(1))
        .otherwise(F.lit(0))
    )
    seq = base.withColumn("__chg", chg).withColumn(
        "__run",
        F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    if kind == "int":
        seq = seq.withColumn(
            "__delta", F.abs(v - F.lag(v).over(w))
        )
    runs = seq.groupBy("__run").agg(F.count("*").alias("__rl"))
    run_stats = runs.agg(
        F.count("*").alias("n_runs"), F.max("__rl").alias("max_run")
    )
    aggs = [
        F.count("*").alias("n_rows"),
        F.countDistinct("__v").alias("n_distinct"),
    ]
    if kind == "int":
        aggs += [
            F.max(v).alias("__vmax"),
            F.max("__delta").alias("__dmax"),
        ]
    else:
        aggs += [
            F.max(F.length(v)).alias("__wmax"),
            F.sum(F.length(v)).alias("__chars"),
        ]
    col_stats = seq.agg(*aggs)
    j = col_stats.crossJoin(run_stats)

    def bits(col):
        return F.greatest(
            F.length(F.expr(f"bin({col})")), F.lit(1)
        ).cast("long")

    if kind == "int":
        value_bits = bits("greatest(__vmax, 0)")
        delta_bits = bits("greatest(__dmax, 0)") + 1
        plain = F.col("n_rows") * 64
        delta_cost = F.col("n_rows") * delta_bits
    else:
        value_bits = (F.col("__wmax") * 8).cast("long")
        delta_cost = F.lit(None).cast("long")
        plain = (F.col("__chars") * 8).cast("long")
    dict_bits = bits("n_distinct")
    rle_cost = F.col("n_runs") * (value_bits + 32)
    dict_cost = F.col("n_rows") * dict_bits + F.col("n_distinct") * 64
    out = j.select(
        F.lit(name).alias("column"),
        "n_rows",
        "n_distinct",
        "n_runs",
        "max_run",
        value_bits.alias("value_bits"),
        rle_cost.alias("rle_cost"),
        dict_cost.alias("dict_cost"),
        delta_cost.alias("delta_cost"),
        plain.alias("plain_cost"),
    )
    best = (
        F.when(
            (F.col("rle_cost") <= F.col("dict_cost"))
            & (
                F.col("delta_cost").isNull()
                | (F.col("rle_cost") <= F.col("delta_cost"))
            )
            & (F.col("rle_cost") <= F.col("plain_cost")),
            F.lit("RLE"),
        )
        .when(
            (
                F.col("delta_cost").isNull()
                | (F.col("dict_cost") <= F.col("delta_cost"))
            )
            & (F.col("dict_cost") <= F.col("plain_cost")),
            F.lit("DICT"),
        )
        .when(
            F.col("delta_cost").isNotNull()
            & (F.col("delta_cost") <= F.col("plain_cost")),
            F.lit("DELTA"),
        )
        .otherwise(F.lit("PLAIN"))
    )
    return out.withColumn("recommended", best)
