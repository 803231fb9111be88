"""Time-series gap handling: last-observation-carried-forward (LOCF)
fill — the standard treatment for sparse measurements in event
streams (sensor readings, price ticks, profile attributes that only
appear on change events).

Reference parity note: the reference (/root/reference/src/
diabetes_etl_pipeline.py) fills missing vitals with column MEDIANS
(global imputation, diabetes/features.py implements that surface);
LOCF is the ORDERED counterpart for time-keyed data, where the most
recent prior observation — not a global statistic — is the right
imputation.  Extension tier (BASELINE.json north star).

Scale notes (100 TB lens): one window over (key, time) — exactly one
hash-partition exchange on the key plus a per-partition sort, the
same shuffle a sessionize or as-of join needs anyway; the fill
itself is a running ``last(..., ignorenulls=True)`` evaluated in a
single pass over each sorted partition (no self-join, no per-gap
lookup).  Keys are users/devices — high cardinality, so partitions
stay balanced; a single global-ordered fill (no key) would be the
one shape to avoid at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def locf_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    fill_cols: Sequence[str | Column],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Append ``<col>_filled`` columns carrying the last non-null
    observation forward within each key group, in ``order_cols``
    order.

    ``order_cols`` must be a DETERMINISTIC total order within a key
    (include a tiebreaker id when timestamps can collide) — otherwise
    two runs can legally disagree about which observation is
    "previous".  ``fill_cols`` may be column names or expressions
    (e.g. a CASE that nulls out non-measurement rows); pass
    ``out_names`` to name expression outputs.

    Rows before a key's first observation keep NULL — LOCF has
    nothing to carry; chain a global-statistic imputation (cf.
    diabetes/features.py) if a default is required.
    """
    if out_names is None:
        out_names = [
            (c if isinstance(c, str) else f"fill_{i}")
            for i, c in enumerate(fill_cols)
        ]
    if len(out_names) != len(fill_cols):
        raise ValueError("out_names must match fill_cols in length")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c, name in zip(fill_cols, out_names):
        col = F.col(c) if isinstance(c, str) else c
        out = out.withColumn(
            f"{name}_filled", F.last(col, ignorenulls=True).over(w)
        )
    return out


def linear_interpolate(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    order_cols: Sequence[str],
    value: str | Column,
    out_name: str = "interp",
) -> DataFrame:
    """Append ``<out_name>`` linearly interpolating a SPARSE series
    between its neighbouring observations within each key group:

        v(t) = v_prev + (v_next - v_prev) * (t - t_prev)/(t_next - t_prev)

    Rows that carry an observation keep it exactly; rows with only one
    neighbour (before the first / after the last observation) stay
    NULL — interpolation does not extrapolate (chain ``locf_fill`` or
    a global imputation for edges).

    Shape at 100 TB: TWO running windows over the SAME
    (key, order) sort — last/first non-null value and timestamp in
    each direction — so the whole fill costs one key-partition
    exchange + one sort, no self-join, no per-gap lookup (the
    ``locf_fill`` contract, extended with the backward pass; Catalyst
    reuses the exchange between the two window frames).  The time
    fraction divides BIGINT epoch-micro differences cast to double in
    pinned IEEE order, so both engines interpolate bit-identically;
    a zero-width gap (prev ts == next ts) yields the previous value
    (fraction guarded, no ANSI divide-by-zero).
    """
    v = F.col(value) if isinstance(value, str) else value
    tus = F.unix_micros(F.col(ts_col))
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_ts = F.when(v.isNotNull(), tus)
    prev_v = F.last(v, ignorenulls=True).over(fwd)
    prev_t = F.last(obs_ts, ignorenulls=True).over(fwd)
    next_v = F.first(v, ignorenulls=True).over(bwd)
    next_t = F.first(obs_ts, ignorenulls=True).over(bwd)
    frac = F.when(
        next_t > prev_t,
        (tus - prev_t).cast("double") / (next_t - prev_t).cast("double"),
    ).otherwise(F.lit(0.0))
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v.cast("double")
            + (next_v.cast("double") - prev_v.cast("double")) * frac,
        )
    )
    return df.withColumn(out_name, interp)


def rolling_zscore(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 10,
    z: float = 3.0,
) -> DataFrame:
    """Per-key rolling anomaly detection: score each row against the
    mean/stddev of its ``window_rows`` PRECEDING rows (the current row
    is excluded — an outlier must not dilute its own baseline), flag
    ``|x - mean| > z * std``.  The streaming-monitoring workhorse for
    metrics/sensors/prices, run here as the batch/backfill form.

    Determinism: the window sum and sum-of-squares fold through
    DECIMAL (a float window sum would depend on within-frame
    evaluation order when frames are recomputed), mean/variance then
    derive in IEEE from those exact operands with one expression
    shape — replayable verbatim in a SQL oracle.  Rows without a FULL
    baseline window score NULL (a 2-row baseline flags everything or
    nothing — worse than no answer).

    Appends: ``base_mean``, ``base_std``, ``is_anomaly``.

    Scale shape: one window over (key, order) — the sessionize/LOCF
    exchange; state per row is the O(window) frame Spark streams
    through its sort, never a self-join.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(-window_rows, -1)
    )
    x = F.col(value_col).cast("double")
    n = F.count(value_col).over(w)
    s = F.sum(F.col(value_col).cast("decimal(25,6)")).over(w).cast("double")
    sq = (
        F.sum(
            (F.col(value_col).cast("double") * F.col(value_col)).cast(
                "decimal(38,6)"
            )
        )
        .over(w)
        .cast("double")
    )
    mean = s / n
    var = F.greatest(
        (sq - s * s / n) / (n - 1), F.lit(0.0)
    )
    std = F.sqrt(var)
    full = n == window_rows
    return (
        df.withColumn("base_mean", F.when(full, mean))
        .withColumn("base_std", F.when(full, std))
        .withColumn(
            "is_anomaly",
            # zero-variance baseline: ANY deviation is infinitely many
            # sigmas out — flag on inequality (mean is exact there, so
            # the float comparison is safe), don't suppress
            F.when(
                full,
                F.when(
                    F.col("base_std") > 0,
                    F.abs(x - F.col("base_mean")) > z * F.col("base_std"),
                ).otherwise(x != F.col("base_mean")),
            ),
        )
    )


def ema(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_name: str = "ema",
) -> DataFrame:
    """One EMA row per key: the exponentially-weighted moving average
    of ``value_col`` over the key's full (``order_cols``-sorted) series
    — ema_t = alpha*x_t + (1-alpha)*ema_{t-1}, seeded at the first
    observation.  The smoothing every metrics/monitoring stack applies
    before alerting; NULL values are skipped (carry the state), so
    sparse series behave like LOCF-then-smooth.

    Shape: the recursion is inherently SEQUENTIAL per key — no window
    frame expresses it — so the series folds in-plan: one groupBy
    collects each key's (order, value) structs, array_sort fixes the
    fold order, and a native ``aggregate`` lambda runs the recursion.
    Exactly one key exchange (the same shuffle sessionize pays);
    per-key memory is the series length, which is this operator's
    honest bound — entity-keyed series (user/device/sku) are
    bounded-by-activity, and a key hot enough to blow it needs a
    windowed metric (rolling_zscore) rather than an all-history EMA.

    Determinism: the fold is a fixed-order chain of IEEE ops — both
    engines evaluate the identical expression tree element-by-element,
    so results are bit-exact (the DuckDB oracle replays the same
    list_reduce; no decimal needed because there is no commutative
    reduction anywhere).
    """
    struct_cols = [F.col(c) for c in order_cols] + [
        F.col(value_col).alias("__v")
    ]
    packed = (
        df.groupBy(*key_cols)
        .agg(F.array_sort(F.collect_list(F.struct(*struct_cols))).alias("__s"))
    )
    fold = F.aggregate(
        F.col("__s"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(x["__v"].isNull(), acc)
        .when(acc.isNull(), x["__v"].cast("double"))
        .otherwise(
            F.lit(alpha) * x["__v"].cast("double")
            + F.lit(1.0 - alpha) * acc
        ),
    )
    return packed.select(*key_cols, fold.alias(out_name))
