"""Streaming upsert into the snapshot table — the ingest-to-lakehouse sink.

``foreachBatch`` + copy-on-write ``SnapshotTable.merge`` is the standard
streaming-upsert pattern (Structured Streaming's foreachBatch contract +
Iceberg/Delta MERGE): each micro-batch lands as one atomic snapshot commit
that rewrites only the partitions the batch touches.

Exactly-once across restarts: foreachBatch replays the in-flight batch id
after recovery, so the writer stamps every commit with its batch id
(``app_meta``) and skips any batch id already committed — replay becomes a
no-op instead of a duplicate snapshot. Combined with the atomic manifest
rename this gives idempotent, resumable ingest: crash between data write
and manifest rename leaves an orphan dir (cleaned by ``expire_snapshots``)
and the replay commits cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from parallelcovertree_spark.sources.snapshots import SnapshotTable


def snapshot_upsert_writer(
    table: SnapshotTable, key_col: str, partition_by: str | None = None
):
    """A foreachBatch function committing each micro-batch as an upsert."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        hist = table.history()
        # latest committed batch id anywhere in history — an interleaved
        # compact()/delete()/manual commit (no batch_id) must not defeat
        # replay detection, so scan back past non-stream manifests
        last_batch = None
        for man in reversed(hist):
            b = (man.get("app_meta") or {}).get("batch_id")
            if b is not None:
                last_batch = b
                break
        if last_batch is not None and batch_id <= last_batch:
            return  # replayed micro-batch after restart — already committed
        if not hist:
            table.commit(batch_df, partition_by=partition_by,
                         meta={"batch_id": batch_id})
        else:
            table.merge(batch_df.sparkSession, batch_df, key_col=key_col,
                        meta={"batch_id": batch_id})

    return write


def upsert_stream_to_table(
    stream_df: DataFrame,
    table: SnapshotTable,
    key_col: str,
    checkpoint_dir: str,
    partition_by: str | None = None,
):
    """Run a stream into the table with availableNow (drain-and-stop);
    returns the started query. Restartable from ``checkpoint_dir``."""
    return (
        stream_df.writeStream
        .foreachBatch(snapshot_upsert_writer(table, key_col, partition_by))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
