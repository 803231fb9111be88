"""Histogram-based decision-tree split finding — the XGBoost /
LightGBM approximate algorithm as native Spark relational ops.

The scale design (the reason every production GBDT uses this instead
of exact sorting): one pass over the fact table builds a per-(leaf,
feature, bin) histogram of O(L * F * B) rows — independent of row
count — and all split evaluation happens on that tiny table with
window prefix-sums.  At 100 TB the fact scan is the only big stage
(map-side-combined grouped aggregate, fully parallel); the histogram
(say 4 leaves x 8 features x 256 bins = 8k rows) is a single-partition
window, and no per-row sort ever happens.  Growing a tree level-wise
costs exactly one extra scan per level (leaf assignment is a scan-
local CASE against the broadcast 1-row winner — the in-plan
scalar-attach pattern, no driver collect).

Determinism contract (the exact-hash oracle discipline):
- the target is summed through DECIMAL(38,6) (money columns are
  2-decimal — the fold is exact), so every histogram cell is exact;
- left/right sums are split by exact DECIMAL subtraction BEFORE the
  double cast, so both engines cast the same exact decimals;
- the variance gain  sl^2/nl + sr^2/nr - st^2/nt  is pure IEEE
  mul/div/add in pinned left-to-right order on identical inputs —
  bit-identical across engines, no libm;
- argmax ties break on (feature, bin) ascending.

With squared loss, fitting a stump to the residual (y - leaf mean)
yields the same argmax and the same gain ordering as fitting raw y
within the leaf (constant shifts cancel in the variance gain), so
depth-k leaf-wise growth below IS one gradient-boosting round per
level at learning rate 1 — without ever materializing residuals,
which keeps the arithmetic exact.

Reference parity: the reference pipeline has no tree trainer; this is
extension-tier (training-data/feature-pipeline component), same class
as operators/classifier.py's logistic trainer.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stack_features", "split_histogram", "best_splits"]


def stack_features(
    df: DataFrame,
    features: Mapping[str, Column],
    y: Column,
    keep: Sequence[str] = (),
) -> DataFrame:
    """Long-format (feature, bin, y) from one scan of ``df``.

    ``features`` maps feature name -> an integer-binned Column (the
    caller owns binning; integer bins keep the histogram exact and
    the oracle trivially expressible).  ``keep`` columns (e.g. a leaf
    id) pass through.
    """
    pairs = ", ".join(
        f"'{name}', __f_{i}" for i, name in enumerate(features)
    )
    prepared = df.select(
        *keep,
        y.alias("__y"),
        *[
            col.cast("int").alias(f"__f_{i}")
            for i, col in enumerate(features.values())
        ],
    )
    return prepared.select(
        *keep,
        F.expr(f"stack({len(features)}, {pairs})").alias(
            "feature", "bin"
        ),
        F.col("__y").alias("y"),
    )


def split_histogram(
    feats: DataFrame, partition: Sequence[str] = ()
) -> DataFrame:
    """Per-(partition..., feature, bin) exact histogram: row count and
    DECIMAL(38,6)-folded target sum.  This is the ONLY stage that
    touches fact-table-sized data; everything after runs on
    O(leaves x features x bins) rows."""
    keys = [*partition, "feature", "bin"]
    return feats.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("y").cast("decimal(38,6)")).alias("s"),
    )


def best_splits(hist: DataFrame, partition: Sequence[str] = ()) -> DataFrame:
    """Variance-gain argmax over every candidate threshold.

    Prefix windows ordered by bin give the left stats of the split
    ``feature <= bin``; the right side is the exact decimal
    difference vs the partition total.  One row per ``partition``
    group survives (rank-1 by gain desc, feature/bin asc)."""
    part = list(partition)
    wcum = (
        Window.partitionBy(*part, "feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(*part, "feature")
    cand = (
        hist.select(
            *part,
            "feature",
            "bin",
            F.sum("n").over(wcum).alias("nl"),
            F.sum("s").over(wcum).alias("sl_dec"),
            F.sum("n").over(wtot).alias("nt"),
            F.sum("s").over(wtot).alias("st_dec"),
        )
        .where(F.col("nl") < F.col("nt"))
        .select(
            *part,
            "feature",
            "bin",
            "nl",
            (F.col("nt") - F.col("nl")).alias("nr"),
            F.col("sl_dec").cast("double").alias("sl"),
            (F.col("st_dec") - F.col("sl_dec"))
            .cast("double")
            .alias("sr"),
            F.col("st_dec").cast("double").alias("st"),
            "nt",
        )
    )
    gain = (
        F.col("sl") * F.col("sl") / F.col("nl")
        + F.col("sr") * F.col("sr") / F.col("nr")
        - F.col("st") * F.col("st") / F.col("nt")
    )
    wrank = Window.partitionBy(*part).orderBy(
        F.desc("gain_raw"), F.asc("feature"), F.asc("bin")
    )
    return (
        cand.withColumn("gain_raw", gain)
        .withColumn("rk", F.row_number().over(wrank))
        .where(F.col("rk") == 1)
        .select(
            *part,
            "feature",
            F.col("bin").alias("split_bin"),
            F.round(F.col("gain_raw"), 2).alias("gain"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            F.round(F.col("sl") / F.col("nl"), 6).alias("mean_left"),
            F.round(F.col("sr") / F.col("nr"), 6).alias("mean_right"),
        )
    )
