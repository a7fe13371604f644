"""Structured Streaming analogues of the reference's incremental
semantics.

The reference's only time-moves-forward concept is batch watermarking
(O3 AppendByMax — SURVEY.md §1.1). Structured Streaming generalizes
it: ``readStream`` + event-time watermark + windowed aggregation is
the continuous form of "copy rows newer than max".

``streaming_hourly_rollup`` — watermarked tumbling-window aggregate
over the events table (late rows beyond the watermark delay are
dropped; append mode emits only finalized windows).

``streaming_append_bymax`` — the O3 operator as a stream: file-source
stream over the source directory, each micro-batch appended to the
store through ``foreachBatch`` with the watermark predicate applied —
exactly-once per the checkpoint, which replaces the reference's
max-probe state.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


def streaming_hourly_rollup(
    spark: SparkSession,
    events_path: str,
    watermark_delay: str = "10 minutes",
    query_name: str = "events_rollup",
) -> DataFrame:
    """Run a watermarked 1-hour tumbling aggregate over the (static)
    events parquet via a file-source stream, synchronously to
    completion, and return the materialized result.

    Append mode means only windows whose end ≤ final watermark
    (max(ts) − delay) are emitted — deterministic for a static input.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if os.path.isfile(events_path):
        # the file stream source requires a directory — expose the
        # single parquet file through a temp dir symlink (absolute
        # target; a relative one would dangle from the tmpdir)
        d = tempfile.mkdtemp(prefix="stream_src_")
        src = os.path.abspath(events_path)
        os.symlink(src, os.path.join(d, os.path.basename(src)))
        events_path = d
    from ora_ch_spark.io import normalize_ts

    static = spark.read.parquet(events_path)
    stream = normalize_ts(spark.readStream.schema(static.schema).parquet(events_path))

    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def streaming_append_bymax(
    spark: SparkSession,
    source_path: str,
    store,
    schema: str,
    table: str,
    watermark_col: str,
    checkpoint_dir: str,
) -> None:
    """O3 as a continuous pipeline: new files in ``source_path``
    stream in; each micro-batch keeps only rows above the target's
    current max and appends via foreachBatch (exactly-once per
    checkpoint)."""
    static = spark.read.parquet(source_path)
    stream = spark.readStream.schema(static.schema).parquet(source_path)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        df = batch_df
        if store.table_exists(schema, table):
            hi = store.read(schema, table).agg(F.max(watermark_col)).first()[0]
            if hi is not None:
                df = df.filter(F.col(watermark_col) > F.lit(hi))
            store.append(schema, table, df)
        else:
            store.write(schema, table, df)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup_within_watermark(
    spark: SparkSession,
    events_path: str,
    keys: list[str] | None = None,
    watermark_delay: str = "10 minutes",
    query_name: str = "events_dedup_wm",
) -> DataFrame:
    """Native bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    EVICTS key state once the watermark passes its event time plus
    the delay — the 100 TB-stream answer to the unbounded seen-set
    the custom ``applyInPandasWithState`` dedup carries (that form
    dedups exactly-once FOREVER; this one guarantees it only within
    the watermark horizon, in exchange for O(horizon) state).

    Returns the deduplicated KEY projection (value columns of "the
    first row" are partition-order-dependent; the key set is what is
    deterministic and differential-testable).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    keys = keys or ["user_id", "event_type"]
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_dwm_src_")
        src = os.path.abspath(events_path)
        os.symlink(src, os.path.join(d, os.path.basename(src)))
        events_path = d
    from ora_ch_spark.io import normalize_ts

    static = spark.read.parquet(events_path)
    stream = normalize_ts(spark.readStream.schema(static.schema).parquet(events_path))
    deduped = (
        stream.select(*keys, "ts")
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
