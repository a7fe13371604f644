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

import os

from pyspark.sql import DataFrame, SparkSession

from ora_ch_spark.store import TableStore
from ora_ch_spark.syncstate import SyncState


def _hfs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-supported scheme — local,
    HDFS, S3A — resolved the same way Spark's own writers do."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _hfs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _hfs(spark, path)
    return bool(fs.exists(p))


def _hfs_delete(spark: SparkSession, path: str) -> None:
    fs, p = _hfs(spark, path)
    try:
        fs.delete(p, True)
    except Exception:
        # best-effort cleanup — a leftover stage is re-deleted on the
        # next run; never fail a committed epoch over it
        pass

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


def stream_upsert_files(
    spark: SparkSession,
    source_dir: str,
    store: TableStore,
    schema: str,
    table: str,
    checkpoint_dir: str,
    key_cols: list[str],
    seq_col: str,
    query_name: str = "stream_upsert",
) -> DataFrame:
    """Streaming keyed UPSERT (CDC apply): each micro-batch MERGES
    into ``schema.table`` by ``key_cols`` — the row with the
    greatest ``seq_col`` wins ACROSS batches (the stored row joins
    the comparison, so a late-arriving older seq never clobbers a
    newer stored row; ties: the greatest full row — a stable
    max-struct, no RNG). Idempotence: the same epoch guard as
    :func:`stream_ingest_files` — a replayed epoch is skipped before
    any mutation, so delete+append never double-applies. This is the
    Delta ``foreachBatch MERGE`` pattern on the manifest store; the
    delete rewrites ONLY files holding matched keys (broadcast
    probe), so a small CDC batch against a 100 TB table touches
    O(affected files)."""
    from pyspark.sql import functions as F

    from ora_ch_spark.streaming.util import as_stream_dir

    source_dir = as_stream_dir(source_dir, "stream_ups_src_")
    static = spark.read.parquet(source_dir)
    stream = spark.readStream.schema(static.schema).parquet(source_dir)
    state = SyncState(store.root)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        last = state.get_watermark(schema, table, EPOCH_COL)
        if last is not None and int(last) >= epoch_id:
            return
        other = [c for c in batch_df.columns if c not in key_cols]
        ordered = [seq_col] + [c for c in other if c != seq_col]

        def pick_latest(df: DataFrame) -> DataFrame:
            return (
                df.groupBy(*key_cols)
                .agg(F.max(F.struct(*ordered)).alias("__w"))
                .select(
                    *key_cols, *[F.col(f"__w.{c}").alias(c) for c in ordered]
                )
                .select(*batch_df.columns)
            )

        latest = pick_latest(batch_df)
        if store.table_exists(schema, table):
            # the seq comparison must span BATCHES, not just rows
            # within one batch — a late-arriving older seq for an
            # already-stored key must lose. Pull the stored rows for
            # the touched keys (broadcast semi — O(batch)) into the
            # same max-struct pick.
            existing = store.read(schema, table).join(
                F.broadcast(latest.select(*key_cols)), key_cols, "left_semi"
            ).select(*batch_df.columns)
            # materialize winners ONCE, before any mutation — to a
            # RELIABLE staging file under the stream checkpoint dir
            # (ADVICE r06). A localCheckpoint barrier (the r5 fix)
            # truncates lineage but lives in executor memory: lose an
            # executor between delete and append and the batch fails
            # with stored rows already deleted — and the availableNow
            # RETRY would recompute `existing` from the mutilated
            # table, permanently losing those rows. Staged parquet
            # survives executor loss AND the retry: a rerun of this
            # epoch reuses the completed stage (_SUCCESS marker)
            # instead of recomputing from the half-mutated table.
            stage = os.path.join(
                checkpoint_dir, "__winners", f"epoch={epoch_id}"
            )
            # existence / cleanup go through the Hadoop FileSystem
            # API, NOT driver-local os.path/shutil — the checkpoint
            # dir may be HDFS/S3, where a local check is always False
            # and the crash-safety guarantee would silently vanish
            # (review r7)
            if not _hfs_exists(spark, os.path.join(stage, "_SUCCESS")):
                pick_latest(latest.unionByName(existing)).write.mode(
                    "overwrite"
                ).parquet(stage)
            winners = spark.read.parquet(stage)
            store.delete_by_keys(schema, table, winners, key_cols)
            store.append(schema, table, winners)
        else:
            store.write(schema, table, latest)
        state.set_watermark(schema, table, EPOCH_COL, epoch_id)
        # the epoch is committed (watermark guard skips any replay) —
        # its stage is dead weight; drop it so the checkpoint dir
        # doesn't grow one directory per epoch forever
        _hfs_delete(
            spark, os.path.join(checkpoint_dir, "__winners", f"epoch={epoch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return store.read(schema, table)
