"""Join-family library operators beyond plain equi-joins.

The skew problem at 100 TB: one hot key (a default user id, an empty
string, a bot account) can put 1% of a fact table into a single reducer
task while the other 999 executors finish in minutes.  AQE skew-join
splitting (on globally, session.py) handles this at runtime; the
explicit salted form here is the deterministic-plan alternative for
pipelines that must not depend on runtime stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    skewed_key: str,
    small_key: str,
    salt_src: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    The skewed side gets a deterministic salt in [0, n_salts) derived by
    hashing `salt_src` (any column that varies within a key group — a
    row id, not the join key); the small side is exploded n_salts times
    so every (key, salt) combination still matches.  A hot key's rows
    then spread across n_salts shuffle partitions instead of one
    straggler.  Cost: the small side is shipped n_salts times — use for
    big⋈small with a skewed big side.  The result is salt-invariant, so
    the gate query oracle-checks against a plain join.
    """
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "_salt_r",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)])),
    )
    return (
        salted.join(
            replicated,
            (F.col(skewed_key) == F.col(small_key))
            & (F.col("_salt") == F.col("_salt_r")),
            how,
        )
        .drop("_salt")
        .drop("_salt_r")
    )


def bloom_reduced_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 16384,
    k: int = 5,
    seed: int = 23,
) -> DataFrame:
    """Inner equi-join with an EXPLICIT portable Bloom semi-join
    reduction: the dim side's distinct keys fold into an m-bit Bloom
    filter whose bit table becomes a LITERAL bitmask in the fact
    scan's filter (operators/sketch.py:bloom_hit_mask_fp — two integer
    ops + a bit test per probe, inside whole-stage codegen), so fact
    rows with no possible match die BEFORE the join exchange.  Bloom
    false positives survive the pre-filter but the exact join removes
    them — the RESULT is bit-identical to the plain join, which is
    what lets the oracle pair on plain SQL.

    Spark's own runtime bloom-filter injection
    (``spark.sql.optimizer.runtime.bloomFilter.*``, plan-asserted in
    tests/test_plans.py) covers the same ground adaptively; this
    explicit form exists for when you want the reduction GUARANTEED
    and portable — the filter applies regardless of optimizer
    thresholds, join strategy, or engine, and its selectivity is
    deterministic (portable fingerprint + quadratic probes), so a
    DuckDB replay prunes the identical rows.

    Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k for n distinct
    dim keys — keep m >= ~10n for sub-1% noise; an undersized m only
    costs pruning power (saturated filter -> no rows die early), never
    correctness.  The bit table collects ONCE to the driver (<= m
    one-int rows — the bounded-collect budget every literal-mask user
    in this repo shares).

    Scale shape (100 TB lens): the dim side aggregates to <= m ints;
    the fact side is filtered IN ITS SCAN (no extra pass, no shuffle)
    down to ~|matching| + fp-rate rows before the join shuffles — for
    a selective dim, that is the difference between shuffling 100 TB
    and shuffling the 2% that can match.
    """
    from diabetes_etl_spark.operators.sketch import (
        bloom_bits,
        bloom_hit_mask_fp,
    )
    from diabetes_etl_spark.operators.text import fingerprint

    if "__fp" in fact.columns:
        raise ValueError(
            "fact side already has a '__fp' column (reserved for the "
            "Bloom probe fingerprint); rename it first"
        )
    key_str = f"CAST({dim_key} AS STRING)"
    bits = bloom_bits(
        dim.select(F.expr(key_str).alias("__k")), "__k", m=m, k=k, seed=seed
    )
    fact_fp = fingerprint(f"CAST({fact_key} AS STRING)")
    pruned = fact.withColumn("__fp", fact_fp).filter(
        bloom_hit_mask_fp(bits, F.col("__fp"), m=m, k=k, seed=seed)
    ).drop("__fp")
    if fact_key == dim_key:
        return pruned.join(dim, [fact_key])
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
