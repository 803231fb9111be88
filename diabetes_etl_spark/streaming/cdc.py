"""CDC apply-changes: SCD Type 1 (latest-wins) and Type 2 (full
version history) upsert/delete streams into a bucket-partitioned
parquet target — the engine's analogue of DLT's ``apply_changes`` API
(the reference pipeline itself doesn't call it, but it is the flagship
DLT surface a migrating user expects).

Semantics (the public ``dlt.apply_changes`` contract for SCD type 1):

- per key, the row with the highest ``(sequence_col, *tiebreak_cols)``
  wins;
- late/out-of-order rows lose to an already-applied newer row — even
  across separate runs (the target retains the sequence columns, so
  every merge re-resolves winners against what was applied before);
- a winning row matching ``delete_expr`` removes the key FROM THE LIVE
  STATE but persists in the target as a tombstone carrying its
  sequence — otherwise a late upsert older than the delete would find
  no applied row to lose to and resurrect the key.  Tombstones are
  filtered out of the returned state; :func:`vacuum_tombstones` is the
  retention sweep (Delta VACUUM analogue) that drops them once they
  age past the late-data horizon.

Implementation: ``foreachBatch`` + bucket-partitioned parquet.

- The target is laid out as ``__bucket=<xxhash64(keys) % n_buckets>/``
  directories.
- Each micro-batch reduces to its per-key winners (one window over the
  batch — small), reads back ONLY the bucket dirs those winners touch,
  re-resolves winners against them, and swaps just those buckets (two
  renames each, same crash contract as
  sources/maintenance.py:compact_files, with per-bucket recovery).
- Buckets the batch doesn't name are never read or written, so merge
  cost scales with ``batch_size x target_size / n_buckets``, not with
  target size.  At warehouse scale the same statement maps onto Delta
  MERGE (see pipeline/registry.py's delta gate); this file is the
  format-independent expression of the operator.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _winners(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _recover_buckets(target_dir: str) -> None:
    """Per-bucket crash recovery: restore any bucket whose swap was
    interrupted (backup exists without a live dir), drop stale backups."""
    if not os.path.isdir(target_dir):
        return
    for name in os.listdir(target_dir):
        if not name.endswith("__pre_swap"):
            continue
        backup = os.path.join(target_dir, name)
        live = backup[: -len("__pre_swap")]
        if os.path.exists(live):
            shutil.rmtree(backup)  # crash after swap completed
        else:
            os.rename(backup, live)  # crash inside the window


def _bucket_dirs(target_dir: str) -> list[str]:
    if not os.path.isdir(target_dir):
        return []
    return sorted(
        os.path.join(target_dir, d)
        for d in os.listdir(target_dir)
        if d.startswith("__bucket=") and not d.endswith("__pre_swap")
    )


def _with_deleted(df: DataFrame) -> DataFrame:
    """Compatibility shim: SCD1 targets written before tombstones were
    persisted carry no __deleted column — treat every stored row as
    live (which is exactly what the old layout meant)."""
    if "__deleted" not in df.columns:
        df = df.withColumn("__deleted", F.lit(False))
    return df


def _swap_buckets(target_dir: str, tmp: str, affected: list[int]) -> None:
    """Two-rename swap of the affected bucket dirs from ``tmp`` into the
    target (crash contract of sources/maintenance.py:compact_files,
    recovered per bucket by _recover_buckets).  A bucket absent from
    ``tmp`` is removed — an empty new state is a legal one."""
    os.makedirs(target_dir, exist_ok=True)
    for b in affected:
        src = os.path.join(tmp, f"__bucket={b}")
        dst = os.path.join(target_dir, f"__bucket={b}")
        backup = dst + "__pre_swap"
        if os.path.exists(backup):
            shutil.rmtree(backup)
        if os.path.exists(dst):
            os.rename(dst, backup)
        if os.path.exists(src):
            os.rename(src, dst)
        if os.path.exists(backup):
            shutil.rmtree(backup)
    shutil.rmtree(tmp, ignore_errors=True)


def read_target(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Read the current state of an apply-changes target (all buckets);
    None when no batch has ever committed a bucket."""
    _recover_buckets(target_dir)
    dirs = _bucket_dirs(target_dir)
    if not dirs:
        return None
    return spark.read.option("basePath", target_dir).parquet(*dirs)


def apply_changes_scd1(
    spark: SparkSession,
    changes: DataFrame,
    target_dir: str,
    keys: list[str],
    sequence_col: str,
    tiebreak_cols: list[str] | None = None,
    delete_expr: str | None = None,
    n_buckets: int = 16,
    checkpoint: str | None = None,
) -> DataFrame | None:
    """Drain the ``changes`` stream (availableNow) into ``target_dir``
    with latest-wins upsert semantics; returns the resulting state (or
    None if nothing has ever been applied).

    ``changes`` must be a streaming DataFrame containing ``keys``,
    ``sequence_col`` and any ``tiebreak_cols``.  ``delete_expr`` is a
    SQL boolean over the change row; a winning delete removes the key.
    """
    order_cols = [sequence_col, *(tiebreak_cols or [])]
    ck = checkpoint or tempfile.mkdtemp(prefix="cdc_scd1_ck_")

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if not batch.columns:
            return
        _recover_buckets(target_dir)
        tagged = batch.withColumn(
            "__bucket",
            F.pmod(
                F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
            ).cast("int"),
        ).withColumn(
            # NULL from delete_expr must mean "not a delete", never a
            # phantom NULL tombstone that no filter or vacuum matches
            # (same coalesce convention as expectation conditions,
            # pipeline/registry.py)
            "__deleted",
            F.coalesce(F.expr(delete_expr), F.lit(False))
            if delete_expr
            else F.lit(False),
        )
        best = _winners(tagged, keys, order_cols)
        affected = sorted(
            r[0] for r in best.select("__bucket").distinct().collect()
        )
        if not affected:
            return
        existing_dirs = [
            os.path.join(target_dir, f"__bucket={b}")
            for b in affected
            if os.path.isdir(os.path.join(target_dir, f"__bucket={b}"))
        ]
        if existing_dirs:
            # the target stores __deleted tombstones alongside live rows
            existing = _with_deleted(
                spark.read.option("basePath", target_dir).parquet(
                    *existing_dirs
                )
            )
            merged = _winners(
                existing.unionByName(best), keys, order_cols
            )
        else:
            merged = best

        tmp = target_dir.rstrip("/") + "__merge_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        # tombstones are WRITTEN (their sequence must outlive the row so
        # later out-of-order upserts still lose) and filtered on read
        merged.write.partitionBy("__bucket").mode("overwrite").parquet(tmp)
        _swap_buckets(target_dir, tmp, affected)

    (
        changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    raw = read_target(spark, target_dir)
    if raw is None:
        return None
    # live state only: tombstones and the layout column are internal
    return (
        _with_deleted(raw)
        .filter(~F.col("__deleted"))
        .drop("__deleted", "__bucket")
    )


def apply_changes_scd2(
    spark: SparkSession,
    changes: DataFrame,
    target_dir: str,
    keys: list[str],
    sequence_col: str,
    tiebreak_cols: list[str] | None = None,
    delete_expr: str | None = None,
    n_buckets: int = 16,
    checkpoint: str | None = None,
) -> DataFrame | None:
    """SCD Type 2 apply-changes: every change VERSION is kept, with
    ``__start_at`` = its own sequence value and ``__end_at`` = the next
    version's sequence (NULL while current) — DLT's
    ``stored_as_scd_type=2`` contract.

    A delete row closes the key's current version and is itself kept
    as a tombstone version flagged ``__deleted`` (so the history shows
    WHEN the key disappeared); re-upserting later re-opens history.
    Late rows splice into their correct historical position — the
    per-key window is recomputed over the merged history, which is
    bucket-scoped like SCD1 (only buckets the batch names are read or
    rewritten).
    """
    order_cols = [sequence_col, *(tiebreak_cols or [])]
    ck = checkpoint or tempfile.mkdtemp(prefix="cdc_scd2_ck_")

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if not batch.columns:
            return
        _recover_buckets(target_dir)
        incoming = batch.withColumn(
            "__bucket",
            F.pmod(
                F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
            ).cast("int"),
        ).withColumn(
            "__deleted",
            F.coalesce(F.expr(delete_expr), F.lit(False))
            if delete_expr
            else F.lit(False),
        )
        affected = sorted(
            r[0] for r in incoming.select("__bucket").distinct().collect()
        )
        if not affected:
            return
        existing_dirs = [
            os.path.join(target_dir, f"__bucket={b}")
            for b in affected
            if os.path.isdir(os.path.join(target_dir, f"__bucket={b}"))
        ]
        if existing_dirs:
            history = (
                spark.read.option("basePath", target_dir)
                .parquet(*existing_dirs)
                .drop("__start_at", "__end_at")
                .unionByName(incoming)
            )
        else:
            history = incoming
        # exact-duplicate versions (same key + sequence + tiebreaks)
        # collapse to one row — reprocessing a file is idempotent
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).asc() for c in order_cols]
        )
        versioned = (
            _winners(history, [*keys, *order_cols], ["__deleted"])
            .withColumn("__start_at", F.col(sequence_col))
            .withColumn("__end_at", F.lead(sequence_col).over(w))
        )

        tmp = target_dir.rstrip("/") + "__merge_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        versioned.write.partitionBy("__bucket").mode("overwrite").parquet(tmp)
        _swap_buckets(target_dir, tmp, affected)

    (
        changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    raw = read_target(spark, target_dir)
    if raw is None:
        return None
    # history keeps tombstone VERSIONS (__deleted marks them); only the
    # physical layout column is internal
    return raw.drop("__bucket")


def vacuum_tombstones(
    spark: SparkSession,
    target_dir: str,
    keep_after: tuple[str, object],
) -> int:
    """Drop SCD1 tombstones whose sequence is < ``keep_after`` —
    the retention sweep completing the delete lifecycle.

    ``keep_after`` must be at or behind the late-data horizon: a
    tombstone may only be dropped once no change older than it can
    still arrive (the same contract as a streaming watermark; dropping
    earlier re-opens the resurrection window the tombstone closed).

    Bucket-scoped like the merges: only buckets that actually hold
    expired tombstones are read and rewritten (two-rename swap, same
    crash recovery); untouched buckets keep their files.  Returns the
    number of tombstones removed.  Like any file-replacing maintenance
    (sources/maintenance.py:compact_files), DataFrames created over the
    target BEFORE the sweep go stale — re-read after vacuuming.
    """
    # validate BEFORE any I/O — misuse should be free
    if not (isinstance(keep_after, tuple) and len(keep_after) == 2):
        raise TypeError(
            "keep_after must be (sequence_col_name, threshold_value)"
        )
    seq_col, threshold = keep_after
    _recover_buckets(target_dir)
    dirs = _bucket_dirs(target_dir)
    if not dirs:
        return 0
    all_rows = _with_deleted(
        spark.read.option("basePath", target_dir).parquet(*dirs)
    )
    expired = F.col("__deleted") & (F.col(seq_col) < F.lit(threshold))
    affected = sorted(
        r[0]
        for r in all_rows.filter(expired).select("__bucket").distinct().collect()
    )
    if not affected:
        return 0
    # partition pruning turns this into the affected-buckets-only scan —
    # no second read is needed
    bucket_rows = all_rows.filter(F.col("__bucket").isin(affected))
    n_expired = bucket_rows.filter(expired).count()
    keep = bucket_rows.filter(~expired)

    tmp = target_dir.rstrip("/") + "__vacuum_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    keep.write.partitionBy("__bucket").mode("overwrite").parquet(tmp)
    _swap_buckets(target_dir, tmp, affected)
    return n_expired
