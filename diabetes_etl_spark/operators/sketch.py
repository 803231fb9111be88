"""Count-min sketch: fixed-memory, MERGEABLE frequency estimation —
the sketch companion to the exact heavy-hitters query
(plans/textplans.py:text_heavy_hitters) for streams and corpora whose
key cardinality is too large to hash-aggregate exactly.

Why a sketch at 100 TB: an exact per-key count table is O(vocabulary)
— fine for words, fatal for URLs/n-grams/user-ids at web scale.  The
CMS cell table is O(depth x width) REGARDLESS of input size, the
shuffle after map-side combine is bounded by the same constant, and
two sketches merge by cell-wise addition — so per-partition / per-day
sketches roll up without touching raw data (the same mergeability
contract as percentile sketches and HLL elsewhere in this repo).

Estimates are upper bounds: est(k) >= true(k) always, and
est(k) <= true(k) + eps*N with probability 1-delta for
width = ceil(e/eps), depth = ceil(ln(1/delta)) (Cormode & Muthu 2005).

Determinism contract: the d hash functions are the repo's portable
LCG mix (operators/sampling.py) over the polynomial rolling-hash
fingerprint of the key (operators/text.py) — pure integer arithmetic,
so cells, estimates, and overcounts are bit-identical across engines,
partitionings, and runs, which is what lets an APPROXIMATE structure
be hash-checked against a DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from diabetes_etl_spark.operators.sampling import _mix
from diabetes_etl_spark.operators.text import fingerprint

# stride between per-row hash seeds (same spacing trick as the LSH
# hyperplane seeds in operators/similarity.py)
_SEED_STRIDE = 1000003


def _cms_col(fp: Column, width: int, depth_idx: int, seed: int) -> Column:
    """Column index of a key in sketch row ``depth_idx``."""
    return F.pmod(
        _mix(fp, seed + depth_idx * _SEED_STRIDE), F.lit(width)
    ).cast("int")


def cms_cells(
    df: DataFrame,
    key_col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """(r, c, cnt): the depth x width sketch of ``key_col``'s frequency
    distribution, one occurrence per input row.

    Plan shape: a narrow map emits ``depth`` (r, c) pairs per row, then
    ONE groupBy whose key space is bounded by depth*width — map-side
    combine collapses each partition to at most depth*width partial
    cells before the exchange, so shuffle volume is a constant
    independent of input size.  Merging sketches = unionByName +
    groupBy(r, c).sum(cnt).
    """
    # fingerprint projected ONCE per row — Catalyst does not CSE the
    # character fold across the depth structs, so inlining it would
    # evaluate the per-key hash depth times
    fp = F.col("__fp")
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("r"), _cms_col(fp, width, j, seed).alias("c")
            )
            for j in range(depth)
        ]
    )
    return (
        # NULL keys carry no countable identity — dropped, not hashed
        # into phantom (r, NULL) cells that would silently skew merges
        df.filter(F.col(key_col).isNotNull())
        .select(fingerprint(key_col).alias("__fp"))
        .select(F.explode(probes).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point estimates for ``keys``: min over the sketch rows of the
    addressed cells (absent cell = 0).  ``width``/``depth``/``seed``
    must match the ``cms_cells`` call that built ``cells``.

    The cell table is at most depth*width rows, so it BROADCASTS — the
    estimate join never shuffles the key side.
    """
    fp = F.col("__fp")
    probes = F.array(
        *[
            F.struct(
                F.lit(j).alias("r"), _cms_col(fp, width, j, seed).alias("c")
            )
            for j in range(depth)
        ]
    )
    probed = (
        keys.select("*", fingerprint(key_col).alias("__fp"))
        .select(*keys.columns, F.explode(probes).alias("rc"))
        .select(
            *keys.columns, F.col("rc.r").alias("r"), F.col("rc.c").alias("c")
        )
    )
    return (
        probed.join(F.broadcast(cells), ["r", "c"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_cnt"))
    )


def merge_cells(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of CMS cell tables built with identical
    (width, depth, seed) — the rollup operation: per-partition,
    per-day, or per-micro-batch sketches combine into the sketch of
    the concatenated input exactly (tested), in one bounded
    depth*width aggregate."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
