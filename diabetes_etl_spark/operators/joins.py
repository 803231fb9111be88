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
