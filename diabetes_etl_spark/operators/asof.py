"""As-of (point-in-time) join as a composition of native DataFrame ops.

Spark has no built-in ASOF JOIN (DuckDB/pandas do).  The scalable
formulation is the union-and-carry-forward trick:

1. tag left rows (probe) and right rows (reference) and union them on a
   common (key, ts) spine;
2. one hash shuffle on the key + one per-key sort on (ts, side);
3. `last(value, ignorenulls=True)` over an unbounded-preceding window
   carries the most recent right-side payload forward onto each left row.

This is a single shuffle + sort — the same cost profile as a sort-merge
join — and never materializes the per-key cross product, so it holds at
100 TB where a naive range join would explode.  A per-group
`pd.merge_asof` via applyInPandas would need the same shuffle plus
Arrow transfer, so the native form is strictly better here.

Tie semantics: a right row with ts equal to the left ts IS matched
(`right_ts <= left_ts`), matching DuckDB's ASOF JOIN used as the test
oracle (tests/test_oracle.py, plans/events.py::asof_purchase_last_click).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: dict[str, str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` within the same ``on`` key group.

    value_cols maps right-side column -> output column name.  Left rows
    with no prior right row get NULLs (left-outer semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    out_names = list(value_cols.values())
    right_types = dict(right.dtypes)

    # All right-side payload columns travel as ONE struct so the matched
    # row is atomic: carrying each column independently with
    # last(ignorenulls=True) could mix values from different right rows
    # whenever the most recent row holds a NULL payload column (an older
    # row's non-NULL value would be substituted).  A struct is non-NULL
    # as soon as the row exists, so its fields — including genuine NULLs
    # — always come from the single matched row, same as DuckDB ASOF JOIN.
    rv_type = (
        "struct<"
        + ",".join(f"{dst}:{right_types[src]}" for src, dst in value_cols.items())
        + ">"
    )
    l2 = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__row"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
        ).alias("__row"),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in value_cols.items()]
        ).alias("__rv"),
    )
    # right rows sort before left rows at equal ts => inclusive match.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r2.unionByName(l2).select(
        "__side",
        "__row",
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rv"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rv.{c}").alias(c) for c in out_names],
    )
