"""Cancellation-proof second-moment folds for the A/B battery.

The textbook one-pass sample variance ``(s2 - s1^2/n)/(n-1)`` computed
in doubles is a catastrophic-cancellation trap: when the mean dwarfs
the spread (money-grain sums, cents^2-scale ``s2``), the two double
operands agree in their leading digits and the subtraction silently
loses most of its precision — and because the DuckDB oracle mirrors
the same expression tree, BOTH engines lose it identically, i.e. the
hashes still match while the answer drifts (round-11 VERDICT "What's
wrong #2").

The durable form computes the numerator EXACTLY and defers the single
rounding to one final double cast:

    var = (n*s2 - s1*s1) / n / (n-1)
    cov = (n*sxy - sx*sy) / n / (n-1)

with ``n*s2 - s1*s1`` evaluated in Spark DECIMAL(38,0) and DuckDB
HUGEINT (both exact 128-bit-class integer arithmetic; both cast to
DOUBLE with round-to-nearest, bit-identically).  Fractional inputs
(the DECIMAL(38,6) money folds) are first shifted to integer grain by
``10^frac_digits`` — exact, because the folds quantized them to that
many decimals when they were born.

Headroom: the numerator needs ``n * s2 * 10^(2*frac_digits) < 1e38``.
For the money grain (frac_digits=6) that is ``n * sum(x^2) < 1e26`` —
comfortable for cents-scale values at 1e12 rows; the count grain
(frac_digits=0) allows ``n * sum(c^2) < 1e38``.

Both halves of each pair MUST be edited together: ``exact_var`` /
``exact_cov`` build the Spark column, ``sql_exact_var`` /
``sql_exact_cov`` emit the literally-mirrored DuckDB expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _wide(c: Column, mult: int) -> Column:
    if mult == 1:
        return c.cast("decimal(38,0)")
    return (c * mult).cast("decimal(38,0)")


def exact_cov_num(
    sx: Column, sy: Column, sxy: Column, n: Column, frac_digits: int = 0
) -> Column:
    """The exact DECIMAL(38,0) numerator ``n*sxy - sx*sy``, scaled to
    integer grain by ``10^frac_digits`` per factor (i.e. the value is
    ``(n*sxy - sx*sy) * 10^(2*frac_digits)``).  Exposed for ratio
    forms (an OLS slope is ``cov_num/var_num`` — the common scale
    cancels, so dividing the two double-cast numerators avoids four
    needless roundings)."""
    mult = 10**frac_digits
    if mult == 1:
        return n.cast("decimal(38,0)") * _wide(sxy, 1) - _wide(
            sx, 1
        ) * _wide(sy, 1)
    return n.cast("decimal(38,0)") * _wide(sxy, mult) * mult - _wide(
        sx, mult
    ) * _wide(sy, mult)


def exact_cov(
    sx: Column, sy: Column, sxy: Column, n: Column, frac_digits: int = 0
) -> Column:
    """Sample covariance ``(sxy - sx*sy/n)/(n-1)`` with the
    cancellation performed exactly in DECIMAL(38,0): numerator
    ``n*sxy - sx*sy`` (scaled to integer grain first), one double
    cast, then the pinned division chain ``/ M^2 / n / (n-1)``."""
    mult = 10**frac_digits
    num = exact_cov_num(sx, sy, sxy, n, frac_digits)
    if mult == 1:
        return num.cast("double") / n / (n - 1)
    return (
        num.cast("double") / float(mult * mult) / n / (n - 1)
    )


def exact_var(
    s1: Column, s2: Column, n: Column, frac_digits: int = 0
) -> Column:
    """Sample variance ``(s2 - s1^2/n)/(n-1)`` via the exact-numerator
    fold — ``exact_cov`` with x = y."""
    return exact_cov(s1, s1, s2, n, frac_digits)


def sql_exact_cov_num(
    sx: str, sy: str, sxy: str, n: str, frac_digits: int = 0
) -> str:
    """The DuckDB mirror of :func:`exact_cov_num` — HUGEINT."""
    mult = 10**frac_digits
    if mult == 1:
        return (
            f"CAST({n} AS HUGEINT) * CAST({sxy} AS HUGEINT) "
            f"- CAST({sx} AS HUGEINT) * CAST({sy} AS HUGEINT)"
        )
    return (
        f"CAST({n} AS HUGEINT) * CAST({sxy} * {mult} AS HUGEINT) * {mult} "
        f"- CAST({sx} * {mult} AS HUGEINT) * CAST({sy} * {mult} AS HUGEINT)"
    )


def sql_exact_cov(
    sx: str, sy: str, sxy: str, n: str, frac_digits: int = 0
) -> str:
    """The DuckDB mirror of :func:`exact_cov` — HUGEINT numerator,
    identical double cast and division order."""
    mult = 10**frac_digits
    num = sql_exact_cov_num(sx, sy, sxy, n, frac_digits)
    if mult == 1:
        return f"CAST({num} AS DOUBLE) / {n} / ({n} - 1)"
    return (
        f"CAST({num} AS DOUBLE) / CAST({mult * mult} AS DOUBLE) "
        f"/ {n} / ({n} - 1)"
    )


def sql_exact_var(s1: str, s2: str, n: str, frac_digits: int = 0) -> str:
    """The DuckDB mirror of :func:`exact_var`."""
    return sql_exact_cov(s1, s1, s2, n, frac_digits)
