"""Rank-2 ALS matrix factorization as exact-decimal closed-form solves.

The canonical distributed-Spark workload (Zhou et al. 2008, ALS-WR),
re-expressed in this repo's determinism discipline: at rank 2 the
per-entity normal-equations solve ``(A + lambda*n*I) x = b`` is a
closed-form 2x2 inverse, and every entry of A and b is a SUM of
products of fixed-scale decimals — so the whole sweep is two grouped
aggregations (user step, item step) whose partial sums fold exactly,
plus one IEEE division per factor component.  No iteration state on
the driver, no linear-algebra library, bit-identical across
partitionings and engines.

Numeric layout (chosen so no Spark decimal product exceeds precision
38, where Spark would silently clamp the scale — see the CUSUM
subtraction note in plans/events.py):

- factors: DECIMAL(9,6) (hash-init = md5 bucket / 1000 at scale 6;
  solved factors are 6dp-rounded doubles cast back exactly);
- ratings: DECIMAL(15,3);
- factor products (9,6)x(9,6) -> (19,12), rating products
  (15,3)x(9,6) -> (25,9): both fold exactly; the folded sums are
  cast to DECIMAL(18,12) / DECIMAL(18,9) before the closed form so
  det = a11r*a22r - a12^2 peaks at precision 38, never beyond;
- regularization (ALS-WR's per-rating lambda*n_u) stays decimal:
  n * 0.1 at scale 1;
- the ONLY inexact ops are the two final divisions per entity,
  9->6dp-quantized identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-rating Tikhonov weight (ALS-WR scaling: diagonal += lambda * n)
ALS_LAMBDA = "0.1"


def hash_unit_factor(col: Column, salt: str) -> Column:
    """Deterministic init factor in [0, 0.999] at DECIMAL(9,6): the
    portable md5-prefix bucket (the _variant_col convention) scaled by
    an exact 0.001 decimal multiply."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return (
        h.cast("decimal(15,3)") * F.lit("0.001").cast("decimal(4,3)")
    ).cast("decimal(9,6)")


def solve_factors(
    joined: DataFrame,
    key: str,
    f1: str = "f1",
    f2: str = "f2",
    rating: str = "r",
) -> DataFrame:
    """One ALS half-step: per ``key``, fold the exact normal-equation
    moments and solve the regularized 2x2 system in closed form.

    Input rows carry (key, rating DECIMAL(15,3), f1/f2 DECIMAL(9,6) —
    the OTHER side's factors).  Output: (key, n_r, x1, x2) with x at
    6dp.
    """
    agg = joined.groupBy(key).agg(
        F.count("*").alias("n_r"),
        F.sum(F.col(f1) * F.col(f1)).cast("decimal(18,12)").alias("a11"),
        F.sum(F.col(f1) * F.col(f2)).cast("decimal(18,12)").alias("a12"),
        F.sum(F.col(f2) * F.col(f2)).cast("decimal(18,12)").alias("a22"),
        F.sum(F.col(rating) * F.col(f1)).cast("decimal(18,9)").alias("b1"),
        F.sum(F.col(rating) * F.col(f2)).cast("decimal(18,9)").alias("b2"),
    )
    lam_n = (
        F.col("n_r").cast("decimal(10,0)")
        * F.lit(ALS_LAMBDA).cast("decimal(2,1)")
    )
    a11r = (F.col("a11") + lam_n).cast("decimal(18,12)")
    a22r = (F.col("a22") + lam_n).cast("decimal(18,12)")
    det = a11r * a22r - F.col("a12") * F.col("a12")
    num1 = a22r * F.col("b1") - F.col("a12") * F.col("b2")
    num2 = a11r * F.col("b2") - F.col("a12") * F.col("b1")
    return agg.select(
        key,
        "n_r",
        F.round(num1.cast("double") / det.cast("double"), 6).alias("x1"),
        F.round(num2.cast("double") / det.cast("double"), 6).alias("x2"),
    )


def als_rank2_sweep(
    ratings: DataFrame,
    user_col: str = "u",
    item_col: str = "i",
    rating_col: str = "r",
) -> tuple[DataFrame, DataFrame]:
    """One full ALS sweep from hash-initialized item factors: solve
    users against the init, then items against the solved users.
    Returns (user_factors, item_factors), each (key, n_r, x1, x2).

    Scale shape: two grouped aggregations (each map-side combinable —
    the moments are sums) and two equi-joins on the factor keys; the
    factor tables are entity-sized, broadcastable when one side is
    small, and the ratings table never moves except on its join key.
    """
    items0 = ratings.select(item_col).distinct().select(
        item_col,
        hash_unit_factor(F.col(item_col), ":v1").alias("f1"),
        hash_unit_factor(F.col(item_col), ":v2").alias("f2"),
    )
    j1 = ratings.join(items0, item_col)
    users = solve_factors(j1, user_col, rating=rating_col)
    uf = users.select(
        user_col,
        F.col("n_r").alias("n_r_u"),
        F.col("x1").cast("decimal(9,6)").alias("f1"),
        F.col("x2").cast("decimal(9,6)").alias("f2"),
    )
    j2 = ratings.join(uf, user_col)
    items = solve_factors(j2, item_col, rating=rating_col)
    return users, items
