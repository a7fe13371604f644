"""Streaming ingestion into the columnar TableStore — the streaming
form of the O1/O3 load path: a file-source stream lands
exactly-once into a store table via ``foreachBatch`` + an epoch
guard.

Exactly-once argument (the part worth reading): Structured Streaming
guarantees at-least-once delivery of each micro-batch to
``foreachBatch`` — on failure after the write but before the
checkpoint commit, the SAME epoch is replayed. The store append is
made idempotent per epoch by recording the last committed epoch id in
the engine's SyncState (the same persistent watermark store the O3
incremental path uses, written atomically AFTER the append): a
replayed epoch sees ``last >= epoch_id`` and skips. Checkpoint
(which files are consumed) + epoch guard (no double-append) together
give end-to-end exactly-once into the manifest store — the streaming
generalization of the reference's watermark-append semantics
(``jdbsChSession.scala:93-121``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ora_ch_spark.store import TableStore
from ora_ch_spark.syncstate import SyncState

EPOCH_COL = "__stream_epoch"


def stream_ingest_files(
    spark: SparkSession,
    source_dir: str,
    store: TableStore,
    schema: str,
    table: str,
    checkpoint_dir: str,
    query_name: str = "stream_ingest",
) -> DataFrame:
    """Run the currently-available source files (availableNow) into
    ``schema.table`` exactly once and return the table. Re-running
    with the same checkpoint after new files land appends only the
    new rows; re-delivered epochs are skipped by the epoch guard."""
    static = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(static.schema).parquet(source_dir)
    state = SyncState(store.root)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        last = state.get_watermark(schema, table, EPOCH_COL)
        if last is not None and int(last) >= epoch_id:
            return  # replayed epoch — already committed to the store
        if store.table_exists(schema, table):
            store.append(schema, table, batch_df)
        else:
            store.write(schema, table, batch_df)
        state.set_watermark(schema, table, EPOCH_COL, epoch_id)

    q = (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.read(schema, table)
