"""Top-k per group via ranking window (SURVEY §2.6 library operator)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top-k rows per group.  ``order_cols`` must be a total
    order (add a unique tiebreak) for deterministic results.

    Scale: one shuffle on the group keys; the window sort is per-group.
    The rank filter prunes before anything downstream, so only k rows
    per group survive the stage.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def topk_per_group_pruned(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """:func:`topk_per_group` with MAP-SIDE PRUNING — the shuffle-
    volume fix for heavy-hitter groups at scale: the window form
    shuffles EVERY row to its group's reducer and sorts whole groups;
    at 100 TB with k=10 that moves the table to keep a sliver.

    Two phases:
    1. local: sortWithinPartitions(group, order) — a narrow per-
       partition sort, NO exchange — then one Arrow-batched
       ``mapInPandas`` keeps the first k rows per group per partition
       (pandas groupby.head(k): vectorized, no Python-per-row work).
       Survivors per group are bounded by k × n_partitions, and in
       total by k × n_partitions × (groups present per partition) —
       independent of row count.
    2. global: the standard ranking window over the survivors (tiny).

    Result identical to :func:`topk_per_group` for any TOTAL
    ``order_cols`` order (local pruning can never drop a global top-k
    row: a row outside its partition's per-group top k is dominated by
    k rows that also reached the reducer).  Python appears only as a
    vectorized head() over already-sorted Arrow batches — the honest
    exception case (Spark has no bounded-top-k partial aggregate);
    the sort itself stays JVM-side.

    ``order_cols`` must be plain columns (optionally .desc()) whose
    names can be given to sortWithinPartitions; expressions should be
    projected to columns first.
    """
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    sorted_df = df.sortWithinPartitions(*group_cols, *order_cols)
    schema = sorted_df.schema

    def local_head(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas may split one partition into several batches;
        # carrying counts across batches keeps the per-partition bound
        # exact (a group's rows are contiguous after the sort)
        carry: dict[tuple, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            # dropna=False: NULL group keys form a group, exactly as
            # the SQL window's partitionBy groups nulls together
            grp = pdf.groupby(list(group_cols), sort=False, dropna=False)
            taken = grp.cumcount()
            if carry:
                base = pd.Series(
                    [
                        carry.get(key, 0)
                        for key in zip(*[pdf[c] for c in group_cols])
                    ],
                    index=pdf.index,
                )
                taken = taken + base
            keep = taken < k
            for key, cnt in (
                pdf.assign(__t=taken + 1)
                .groupby(list(group_cols), sort=False, dropna=False)["__t"]
                .max()
                .items()
            ):
                key_t = key if isinstance(key, tuple) else (key,)
                carry[key_t] = max(carry.get(key_t, 0), int(cnt))
            out = pdf[keep]
            if not out.empty:
                yield out

    pruned = sorted_df.mapInPandas(local_head, schema=schema)
    return topk_per_group(pruned, group_cols, order_cols, k, rank_col)


def skyline2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
    id_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier; Börzsönyi et al. 2001): rows not
    STRICTLY dominated — no other row with ``minimize_col`` <= mine
    AND ``maximize_col`` >= mine and at least one strict.  Duplicate
    points survive together (neither strictly dominates).

    Scale shape: the classic sort-scan, not the O(n^2) self-join —
    one RANGE-frame window gives each row the best ``maximize`` value
    among all strictly-smaller ``minimize`` values, one partition
    window gives the best at EQUAL ``minimize``; a row is on the
    frontier iff it strictly beats the former and ties the latter.
    Cost: one sort + two windows, O(n log n); the oracle proves
    equivalence against the literal NOT EXISTS definition."""
    from pyspark.sql import Window

    mn, mx = F.col(minimize_col), F.col(maximize_col)
    w_lt = (
        Window.orderBy(mn)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy(mn)
    out = (
        df.withColumn("__best_lt", F.max(mx).over(w_lt))
        .withColumn("__best_eq", F.max(mx).over(w_eq))
        .filter(
            (F.col("__best_lt").isNull() | (mx > F.col("__best_lt")))
            & (mx == F.col("__best_eq"))
        )
        .drop("__best_lt", "__best_eq")
    )
    return out
