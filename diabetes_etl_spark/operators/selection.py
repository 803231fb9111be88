"""Exact k-th smallest value in O(log) bounded passes — no global sort.

`ORDER BY v LIMIT 1 OFFSET k-1` (or an exact percentile over a total
order) plans as a full sort: a range exchange of the ENTIRE column.
At 100 TB that is the most expensive way imaginable to find one
number.  The classic distributed-selection alternative implemented
here (Blum et al.'s selection idea re-shaped for bucketed scans):

1. bracket [lo, hi], total count AND the first descent from ONE
   aggregate grouped by the value's clamped binary exponent (a
   monotonic pure function of v, <= ~4400 bins of (count, min, max)
   driver state) — the k-th value's bin gives an exact tight
   sub-bracket, so the old separate min/max/count pass is fused away
   (round-14),
2. per round: histogram the in-bracket values into B equal-width
   buckets (ONE filtered scan whose predicate pushes down to parquet
   row-group min/max stats — later rounds physically read less),
   walk the B counts on the driver (O(B) driver state, the documented
   bounded-state budget), descend into the bucket holding the target
   rank,
3. stop when the bucket holds <= `threshold` rows (sort that sliver
   locally) or its width collapses to one ulp (all remaining values
   equal).

Convergence: each round shrinks the candidate set by ~B× on
non-adversarial data, so a trillion rows need ~4 rounds at B=1024.
Every round's bucket assignment uses the SAME Spark expression
(floor((v-lo)/width), clamped) with lo/width as Python float
literals, so counting and descent can never disagree at boundary
ulps.  All counts are exact integers; the result is bit-identical to
the full-sort answer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_kth(
    df: DataFrame,
    col: str,
    k: int,
    buckets: int = 1024,
    threshold: int = 8192,
    max_rounds: int = 64,
) -> tuple[float, int]:
    """The exact k-th smallest (1-based) non-null value of `col`.
    Returns (value, rounds) where rounds counts histogram passes."""
    if k < 1:
        raise ValueError("k is 1-based and must be >= 1")
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col("v").isNotNull() & ~F.isnan("v")
    )
    # Fused bracket + first descent (round-14, verdict-r13 #4): the
    # old plain min/max/count aggregate spent one full pass only to
    # learn the bracket, then the first histogram round re-scanned
    # everything.  Grouping that SAME pass by a magnitude bin — the
    # clamped binary exponent, a monotonic pure function of v with at
    # most ~4400 distinct values — returns per-bin (count, min, max),
    # which is simultaneously the global bracket/count AND a first
    # histogram: the driver walks the bins (bounded driver state, the
    # documented budget) and descends straight into the k-th value's
    # bin with its EXACT [min, max] sub-bracket.  One Spark job
    # replaces two, and the first equal-width round starts from a
    # tighter bracket.  Exactness is unchanged: bin assignment uses
    # the same Spark expression for counting and filtering (boundary
    # ulps cannot disagree), and the final answer still comes from an
    # exact sliver sort / collapsed bracket.  Clamp BEFORE floor so
    # +-inf inputs saturate instead of overflowing the long cast
    # under ANSI.
    _CLAMP = 1100.0  # |binary exponent| bound (subnormals reach -1074)

    def _magnitude_bin(v: Column) -> Column:
        exp_of = lambda x: F.floor(  # noqa: E731
            F.greatest(
                F.lit(-_CLAMP), F.least(F.lit(_CLAMP), F.log2(x))
            )
        )
        return (
            F.when(v == 0, F.lit(0).cast("long"))
            .when(v > 0, F.lit(2000) + exp_of(v))
            .otherwise(F.lit(-2000) - exp_of(-v))
        )

    bin_rows = {
        r.b: (int(r.c), float(r.bmin), float(r.bmax))
        for r in vals.groupBy(_magnitude_bin(F.col("v")).alias("b"))
        .agg(
            F.count("*").alias("c"),
            F.min("v").alias("bmin"),
            F.max("v").alias("bmax"),
        )
        .collect()
    }
    n = sum(c for c, _, _ in bin_rows.values())
    if k > n:
        raise ValueError(f"k={k} exceeds non-null count {n}")
    target = k
    for b in sorted(bin_rows):
        c, bmin, bmax = bin_rows[b]
        if target <= c:
            break
        target -= c
    lo, hi = bmin, bmax
    # The bin's rows are exactly the rows in [bmin, bmax]: the bin
    # function is monotonic non-decreasing in v, so any v > bmin has
    # bin(v) >= b and any v < bmax has bin(v) <= b — bins partition
    # the value line into disjoint intervals.  Filtering by the VALUE
    # range instead of re-evaluating the bin expression keeps later
    # rounds' predicates pushable to parquet row-group min/max stats
    # (the operator's later-rounds-read-less property) and off the
    # log2 path.
    cur = vals.where(
        (F.col("v") >= F.lit(lo)) & (F.col("v") <= F.lit(hi))
    )
    rounds = 0
    if c <= threshold:
        sliver = sorted(r.v for r in cur.collect())
        return sliver[min(target, len(sliver)) - 1], rounds
    while rounds < max_rounds:
        if lo == hi:
            return lo, rounds
        remaining = cur
        width = (hi - lo) / buckets
        if width == 0 or not math.isfinite(width):
            return lo, rounds
        rounds += 1
        bucket = F.least(
            F.lit(buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
            ),
        )
        counts = dict(
            remaining.groupBy(bucket.alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        cum = 0
        for b in range(buckets):
            c = counts.get(b, 0)
            if cum + c >= target:
                break
            cum += c
        else:  # numeric edge: target beyond histogram (shouldn't happen)
            b, c = buckets - 1, counts.get(buckets - 1, 0)
        target -= cum
        in_bucket = remaining.where(
            bucket == F.lit(b)
        )
        new_lo = lo + b * width
        new_hi = hi if b == buckets - 1 else lo + (b + 1) * width
        if c <= threshold or (new_lo == lo and new_hi == hi):
            sliver = sorted(
                r.v for r in in_bucket.collect()
            )  # <= threshold rows: bounded driver state
            if not sliver:
                return new_lo, rounds
            return sliver[min(target, len(sliver)) - 1], rounds
        cur, lo, hi = in_bucket, new_lo, new_hi
    raise RuntimeError("exact_kth failed to converge")  # pragma: no cover
