"""Space-filling-curve data layout: Hilbert-curve clustering next to
the Morton/Z-order the versioned table's OPTIMIZE already ships
(sources/versioned.py:_zorder).

Why a second curve: Morton interleaving has unbounded jumps at bit
boundaries (the (0,255)->(255,0) seam), while the Hilbert curve is
CONTINUOUS — consecutive indexes are always grid neighbors — which is
why modern clustering layouts (e.g. Delta liquid clustering) moved
from Z-order to Hilbert: for the same tile size, Hilbert tiles span a
tighter x/y bounding box, so multi-dimensional range predicates prune
more files.  The layout_hilbert_clustering query measures exactly
that, side by side, per tile.

Everything is INTEGER bit arithmetic (the canonical xy2d walk:
per-bit quadrant digit + frame rotation), expressed as a native
``aggregate`` fold over bit positions — zero Python, zero shuffle for
the index itself; the oracle replays the identical walk as a
recursive CTE (no list lambdas on the DuckDB side, and the XOR-free
quadrant CASE avoids DuckDB's ``^``-means-power trap).

Scale shape (100 TB lens): computing the index is a per-row
projection; the LAYOUT write that consumes it is a single
repartitionByRange(index) — one range shuffle, the same cost Z-order
pays — after which min/max file statistics prune on BOTH dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hilbert_index(x_col: str, y_col: str, bits: int = 8) -> Column:
    """Hilbert d-index of integer grid point (x, y), both in
    [0, 2^bits): the canonical xy2d loop — per step s = 2^(bits-i),
    the quadrant digit ((3*rx) XOR ry, spelled as a CASE so both
    engines read it identically) scales by s*s, then the frame
    rotates (ry=0: flip when rx=1, then swap)."""
    n = 1 << bits
    s = f"shiftleft(1, {bits} - i)"
    rx = f"(CASE WHEN (acc.x & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (acc.y & {s}) > 0 THEN 1 ELSE 0 END)"
    q = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 0 THEN 3 ELSE 2 END)"
    )
    nx = (
        f"CASE WHEN {ry} = 1 THEN acc.x "
        f"WHEN {rx} = 1 THEN {n} - 1 - acc.y ELSE acc.y END"
    )
    ny = (
        f"CASE WHEN {ry} = 1 THEN acc.y "
        f"WHEN {rx} = 1 THEN {n} - 1 - acc.x ELSE acc.x END"
    )
    return F.expr(
        f"aggregate(sequence(1, {bits}), "
        f"named_struct('x', CAST({x_col} AS INT), "
        f"'y', CAST({y_col} AS INT), 'd', 0), "
        f"(acc, i) -> named_struct('x', {nx}, 'y', {ny}, "
        f"'d', acc.d + {s} * {s} * {q})).d"
    )


def morton_index(x_col: str, y_col: str, bits: int = 8) -> Column:
    """Morton/Z-order index (bit interleave, y high): the comparison
    baseline — identical to the versioned table's OPTIMIZE clustering
    key, expressed the same per-bit way as the Hilbert fold."""
    return F.expr(
        f"aggregate(sequence(0, {bits} - 1), 0, (acc, i) -> acc "
        f"+ CASE WHEN ({x_col} & shiftleft(1, i)) > 0 "
        f"THEN shiftleft(1, 2 * i) ELSE 0 END "
        f"+ CASE WHEN ({y_col} & shiftleft(1, i)) > 0 "
        f"THEN shiftleft(1, 2 * i + 1) ELSE 0 END)"
    )
