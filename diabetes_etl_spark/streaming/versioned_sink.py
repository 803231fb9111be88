"""Exactly-once streaming sink into the versioned table.

`foreachBatch` is at-least-once: after a crash between the sink's
write and the checkpoint advance, Structured Streaming REPLAYS the
batch, and a naive append duplicates it.  The fix is the Delta-style
`txn` handshake this repo's `VersionedTable` already speaks
(`sources/versioned.py:append(app_txn=...)` /
`last_app_version`): every commit atomically records (app_id ->
batch_id) in the SAME manifest as the data, so the sink can test
"did some committed version already carry this batch?" and skip the
replay — append becomes idempotent per (app_id, batch_id).

This is the standard Structured-Streaming + Delta exactly-once
recipe (foreachBatch + txnAppId/txnVersion), expressed against the
repo's object-store-native manifest commits.

Caveat (same as Delta's): idempotence assumes batch ids grow
monotonically under ONE checkpoint lineage.  Losing the checkpoint
restarts batch numbering at 0, so replays are skipped — correct for
pure re-reads of the same input, but NEW files bundled into those
low-numbered batches would be skipped too.  Recovery from checkpoint
loss therefore pairs with a fresh `app_id` (documented here, tested
in tests/test_versioned_sink.py).

Reference parity: the reference's DLT runtime owns this guarantee
invisibly; this module is the explicit Spark-native equivalent,
composing streaming/ingest.py's availableNow drains with
sources/versioned.py's ACID commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from diabetes_etl_spark.sources.versioned import VersionedTable


def stream_append_versioned(
    stream_df: DataFrame,
    table: VersionedTable,
    app_id: str,
    checkpoint: str,
) -> None:
    """Drain all available input into `table`, exactly once per
    (app_id, batch) even across crash/replay, then stop."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        last = table.last_app_version(app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch: its data is already committed
        table.append(batch_df, app_txn=(app_id, batch_id))

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
