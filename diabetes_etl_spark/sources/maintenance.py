"""Table-maintenance utilities: the small-files problem.

A streaming or heavily-parallel writer leaves thousands of small files
behind; at 100 TB that means listing storms and a task per tiny file on
every read.  The reference delegates this to Databricks
(`pipelines.autoOptimize.managed=true`, src/diabetes_etl_pipeline.py:49-52);
here compaction is an explicit rewrite sized by bytes-on-disk, swapped
in atomically so concurrent readers see either the old or the new
layout, never a half-written directory.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

from diabetes_etl_spark.sources.tables import read_source, write_sink


def _data_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_file_count(path: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n


def compact_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_mb: int = 128,
    partition_by: tuple[str, ...] = (),
    schema=None,
) -> tuple[int, int]:
    """Rewrite a file directory into ~target_mb-sized files.

    File count is derived from actual bytes on disk (never a guess), the
    compacted copy is written beside the original, and the swap is two
    renames.  The swap is NOT atomic: there is a brief window between the
    renames where ``path`` does not exist, a concurrent reader can fail,
    and ``os.rename`` requires tmp/backup to live on the same filesystem
    as ``path`` (they are siblings, so they do unless ``path`` itself is
    a mount point).  A crash inside the window is recoverable: the next
    ``compact_files`` (or ``recover_compaction``) restores the
    ``__pre_compact`` backup before doing anything else.  With
    partition_by the same partition layout is re-created, compacted
    within each partition.  Returns (files_before, files_after).
    """
    recover_compaction(path)
    before = data_file_count(path)
    n_files = max(1, math.ceil(_data_bytes(path) / (target_mb * 1024 * 1024)))
    df = read_source(spark, path, fmt=fmt, schema=schema)
    if partition_by:
        from pyspark.sql import functions as F

        df = df.repartition(n_files, *[F.col(c) for c in partition_by])
    else:
        df = df.repartition(n_files)
    tmp = path.rstrip("/") + "__compact_tmp"
    backup = path.rstrip("/") + "__pre_compact"
    if os.path.exists(tmp):  # leftover from an earlier crash pre-swap
        shutil.rmtree(tmp)
    write_sink(df, tmp, fmt=fmt, partition_by=partition_by)
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return before, data_file_count(path)


def recover_compaction(path: str) -> bool:
    """Crash recovery for ``compact_files``.

    If a previous compaction crashed between its two renames, the data
    survives only as ``<path>__pre_compact``.  Restore it (preferring the
    backup whenever ``path`` is missing; a leftover backup *alongside* a
    live ``path`` means the crash happened after the second rename, so
    the backup is stale and is discarded).  Returns True if a restore or
    cleanup happened.
    """
    backup = path.rstrip("/") + "__pre_compact"
    if not os.path.exists(backup):
        return False
    if os.path.exists(path):
        shutil.rmtree(backup)  # crash after swap completed: backup stale
    else:
        os.rename(backup, path)  # crash inside the window: restore
    return True
