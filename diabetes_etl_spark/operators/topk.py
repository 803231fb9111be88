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
