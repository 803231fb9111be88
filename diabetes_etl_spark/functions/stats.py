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
(the DECIMAL(38,6) money folds) are first shifted to integer grain —
exact, because the folds quantized them to that many decimals when
they were born.  That premise is the CALLER's to uphold: ``_wide``
would silently ROUND an input whose true fractional grain exceeds its
declared ``frac`` (and Spark HALF_UP vs DuckDB casts can then split
on exact ties), so pass each factor's real quantization grain.

Mixed grains are first-class: ``frac_digits`` is the x-factor grain,
``frac_y`` (default: same) the y grain; the product sum ``sxy`` may
be quantized at any grain up to ``frac_digits + frac_y`` — it is
scaled by the full ``10^(fx+fy)`` BEFORE the integer cast, so the
product grain is honored exactly (round-12 ADVICE: the earlier
``10^max`` pre-cast scale silently rounded an sxy finer than the
coarser factor, identically in both engines).  Use ``frac_y=0`` for
count-grain y next to money-grain x — it divides the
DECIMAL(38,0)/HUGEINT headroom burn by 1e6.

Headroom: the numerator needs
``n * sxy * 10^(frac_digits + frac_y) < 1e38``.  For money x money
(6,6) that is ``n * sum(x*y) < 1e26``; money x count (6,0) allows
``n * sum(x*y) < 1e32``; count x count (0,0) the full 1e38.
A breach fails LOUDLY on both engines as this repo configures them:
Spark 4 defaults to ANSI mode, where DECIMAL(38,0) overflow raises
NUMERIC_VALUE_OUT_OF_RANGE, and DuckDB HUGEINT/DECIMAL arithmetic
raises out-of-range.  (Only an ``ansi.enabled=false`` session — which
this repo never constructs — would instead produce the silent-NULL /
oracle-error asymmetry.)  The boundary test
(``tests/test_round13.py::test_stats_headroom_breach_is_loud``) pins
the ANSI setting and both raise behaviors so a config drift cannot
quietly reintroduce the asymmetry.

Both halves of each pair MUST be edited together: ``exact_var`` /
``exact_cov`` / ``exact_cov_num`` build the Spark column,
``sql_exact_var`` / ``sql_exact_cov`` / ``sql_exact_cov_num`` emit
the literally-mirrored DuckDB expression.
"""

from __future__ import annotations

from pyspark.sql import Column


def _wide(c: Column, mult: int) -> Column:
    if mult == 1:
        return c.cast("decimal(38,0)")
    return (c * mult).cast("decimal(38,0)")


def _grains(frac_digits: int, frac_y: int | None) -> tuple[int, int]:
    fy = frac_digits if frac_y is None else frac_y
    return frac_digits, fy


def exact_cov_num(
    sx: Column,
    sy: Column,
    sxy: Column,
    n: Column,
    frac_digits: int = 0,
    frac_y: int | None = None,
) -> Column:
    """The exact DECIMAL(38,0) numerator ``n*sxy - sx*sy``, scaled to
    integer grain per factor (i.e. the value is
    ``(n*sxy - sx*sy) * 10^(frac_digits + frac_y)``).  Exposed for
    ratio forms (an OLS slope is ``cov_num/var_num`` — when both
    numerators share the same grain sum the scale cancels, so
    dividing the two double-cast numerators avoids four needless
    roundings; with DIFFERENT grain sums divide the ratio by the
    leftover power of ten)."""
    fx, fy = _grains(frac_digits, frac_y)
    # sxy is scaled by the FULL 10^(fx+fy) before the integer cast:
    # exact for any sxy grain up to fx+fy (the docstring contract).
    # Scaling by 10^max then multiplying post-cast would silently
    # HALF_UP-round an sxy quantized finer than max(fx, fy).
    num = n.cast("decimal(38,0)") * _wide(sxy, 10 ** (fx + fy))
    return num - _wide(sx, 10**fx) * _wide(sy, 10**fy)


def exact_cov(
    sx: Column,
    sy: Column,
    sxy: Column,
    n: Column,
    frac_digits: int = 0,
    frac_y: int | None = None,
) -> Column:
    """Sample covariance ``(sxy - sx*sy/n)/(n-1)`` with the
    cancellation performed exactly in DECIMAL(38,0): numerator
    ``n*sxy - sx*sy`` (scaled to integer grain first), one double
    cast, then the pinned division chain ``/ 10^(fx+fy) / n /
    (n-1)``."""
    fx, fy = _grains(frac_digits, frac_y)
    mult2 = 10 ** (fx + fy)
    num = exact_cov_num(sx, sy, sxy, n, fx, fy)
    if mult2 == 1:
        return num.cast("double") / n / (n - 1)
    return (
        num.cast("double") / float(mult2) / n / (n - 1)
    )


def exact_var(
    s1: Column, s2: Column, n: Column, frac_digits: int = 0
) -> Column:
    """Sample variance ``(s2 - s1^2/n)/(n-1)`` via the exact-numerator
    fold — ``exact_cov`` with x = y."""
    return exact_cov(s1, s1, s2, n, frac_digits)


def sql_exact_cov_num(
    sx: str,
    sy: str,
    sxy: str,
    n: str,
    frac_digits: int = 0,
    frac_y: int | None = None,
) -> str:
    """The DuckDB mirror of :func:`exact_cov_num` — HUGEINT."""
    fx, fy = _grains(frac_digits, frac_y)

    def wide(c: str, mult: int) -> str:
        if mult == 1:
            return f"CAST({c} AS HUGEINT)"
        return f"CAST({c} * {mult} AS HUGEINT)"

    # Mirror of the Spark half: full 10^(fx+fy) pre-cast scale on sxy.
    num = f"CAST({n} AS HUGEINT) * {wide(sxy, 10 ** (fx + fy))}"
    return f"{num} - {wide(sx, 10**fx)} * {wide(sy, 10**fy)}"


def sql_exact_cov(
    sx: str,
    sy: str,
    sxy: str,
    n: str,
    frac_digits: int = 0,
    frac_y: int | None = None,
) -> str:
    """The DuckDB mirror of :func:`exact_cov` — HUGEINT numerator,
    identical double cast and division order."""
    fx, fy = _grains(frac_digits, frac_y)
    mult2 = 10 ** (fx + fy)
    num = sql_exact_cov_num(sx, sy, sxy, n, fx, fy)
    if mult2 == 1:
        return f"CAST({num} AS DOUBLE) / {n} / ({n} - 1)"
    return (
        f"CAST({num} AS DOUBLE) / CAST({mult2} AS DOUBLE) "
        f"/ {n} / ({n} - 1)"
    )


def sql_exact_var(s1: str, s2: str, n: str, frac_digits: int = 0) -> str:
    """The DuckDB mirror of :func:`exact_var`."""
    return sql_exact_cov(s1, s1, s2, n, frac_digits)
