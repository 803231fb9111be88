"""Distribution-drift monitoring: compare a current batch's value
distribution against a reference profile — the scheduled check that
catches upstream schema-preserving breakage (a sensor rescaled, a
price column shifted units, a traffic mix flipped) that row-level
expectations (pipeline/registry.py) cannot see, because every
individual row still looks valid.

Reference parity note: the reference's data-quality surface is
row-level expectations + global aggregates
(/root/reference/src/diabetes_etl_pipeline.py:631-672); drift is the
extension-tier distributional counterpart (BASELINE.json north star).

The drift measure is total-variation distance over an equi-width
histogram: TV = 0.5 * sum_i |p_i - q_i|.  No logs, no plug-in
density — bin fractions are exact-integer ratios divided once in
IEEE (deterministic), and the cross-bin sum folds through DECIMAL, so
the score is bit-identical cross-engine (PSI/KL need ln and could
not be hash-checked; TV is also a real metric with a clean [0,1]
range and no empty-bin blowups).

Scale shape: each side is ONE map-side-combined groupBy onto at most
``bins`` rows; the comparison joins two bins-row tables — constant
cost regardless of input size, the same reason the count-min sketch
shuffles constant cells.  Run it per column on a schedule and alert
on TV above a threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diabetes_etl_spark.functions.numeric import dec_sum


def histogram_bin(col: Column, lo: float, width: float, bins: int) -> Column:
    """Equi-width bin index with clamping: values below ``lo`` land in
    bin 0, values past the top in bin ``bins - 1`` — drifted outliers
    must COUNT somewhere, or the metric goes blind exactly when it
    matters.

    The clamp happens in DOUBLE space BEFORE floor/cast: the narrowing
    casts (floor's BIGINT, then INT) only ever see values already in
    [0, bins-1], so an outlier arbitrarily far past the range — the
    rescaled-sensor scenario this module exists for — clamps into the
    edge bin instead of overflowing an ANSI cast and killing the
    monitoring job (clamping after a narrowing cast would raise on any
    value more than ~2^31 widths from ``lo``).  Values in
    [bins-1, bins) floor to bins-1 either way, so the early clamp
    changes no in-range result."""
    x = (col - F.lit(lo)) / F.lit(width)
    clamped = F.least(
        F.lit(float(bins - 1)), F.greatest(F.lit(0.0), x)
    )
    return F.floor(clamped).cast("int")


def histogram_counts(
    df: DataFrame, value_col: str, lo: float, width: float, bins: int
) -> DataFrame:
    """(bin, n): one map-side-combined aggregate onto <= bins rows.
    NULL values are excluded (count them separately if null-rate drift
    matters — it is a different signal than shape drift)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            histogram_bin(F.col(value_col), lo, width, bins).alias("bin")
        )
        .agg(F.count("*").alias("n"))
    )


def drift_profile(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    width: float,
    bins: int,
) -> DataFrame:
    """Per-bin drift table + the total-variation distance.

    Columns: bin, ref_n, cur_n, ref_frac, cur_frac, abs_diff (all
    fractions are exact-integer ratios in IEEE), and ``tv_distance``
    (constant across rows — the DECIMAL-folded 0.5 * sum of
    abs_diff), so one result table carries both the alarm scalar and
    the per-bin attribution of WHERE the mass moved."""
    spine = ref.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    r = histogram_counts(ref, value_col, lo, width, bins)
    c = histogram_counts(cur, value_col, lo, width, bins)
    joined = (
        spine.join(r, "bin", "left")
        .join(c.withColumnRenamed("n", "m"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n", F.lit(0)).alias("ref_n"),
            F.coalesce("m", F.lit(0)).alias("cur_n"),
        )
    )
    tot = joined.agg(
        F.sum("ref_n").alias("ref_total"), F.sum("cur_n").alias("cur_total")
    )
    # NULLIF on the totals: an EMPTY side (upstream died — the moment
    # the alarm matters most) would otherwise produce 0/0 = NaN
    # fractions, and the ANSI decimal cast in the TV fold raises on
    # NaN, killing the monitoring job.  With a null total, fractions /
    # abs_diff / tv_distance come back NULL — callers alert on NULL
    # exactly like on a high TV.
    per_bin = joined.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_n",
        "cur_n",
        (
            F.col("ref_n").cast("double")
            / F.nullif(F.col("ref_total"), F.lit(0))
        ).alias("ref_frac"),
        (
            F.col("cur_n").cast("double")
            / F.nullif(F.col("cur_total"), F.lit(0))
        ).alias("cur_frac"),
    )
    per_bin = per_bin.withColumn(
        "abs_diff", F.abs(F.col("ref_frac") - F.col("cur_frac"))
    )
    tv = per_bin.agg(
        (dec_sum(F.col("abs_diff"), 15, 38) / 2).alias("tv_distance")
    )
    return per_bin.crossJoin(F.broadcast(tv))
