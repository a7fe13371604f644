"""Sessionization — the classic event-stream rollup the reference's
batch-watermark model can't express, in both batch and stateful
streaming form.

- ``sessionize`` (batch): gap-based sessions via window functions —
  lag → gap-flag → cumulative sum → per-session aggregate. One
  shuffle on ``user_id``; everything else is within-partition window
  work. Deterministic: ordering ties broken by ``event_id``.

- ``streaming_stateful_dedup``: a custom stateful operator via
  ``applyInPandasWithState`` — exactly-once cross-batch dedup by key
  (state = seen key set per group). The operator shape (state schema,
  output schema, timeout contract) is the one any custom stateful
  rollup uses; dedup keeps its single-batch behavior deterministic
  enough to differential-test.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization. Returns one row per session:
    (user_id, session_id, session_start, session_end, n_events,
    total_value). All referenced columns are parameters."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
    with_flag = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


DEDUP_STATE_SCHEMA = "seen array<bigint>"
DEDUP_OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, event_type string, value double"
)


def _dedup_fn(key, pdf_iter: Iterator[pd.DataFrame], state):
    """applyInPandasWithState body: emit only first-seen event_ids per
    user; carry the seen-set across micro-batches in state."""
    (user_id,) = key
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("event_id")
        fresh = pdf[~pdf["event_id"].isin(seen)]
        fresh = fresh.drop_duplicates(subset=["event_id"])
        seen.update(fresh["event_id"].tolist())
        if len(fresh):
            out.append(fresh[["user_id", "event_id", "event_type", "value"]])
    state.update((sorted(seen),))
    if out:
        yield pd.concat(out)


def streaming_stateful_dedup(
    spark: SparkSession,
    events_path: str,
    query_name: str = "dedup_out",
) -> DataFrame:
    """Cross-batch exactly-once dedup by (user_id, event_id) as a
    Structured Streaming stateful operator; runs the available input
    to completion and returns the materialized output."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_dedup_src_")
        src = os.path.abspath(events_path)  # relative targets would
        # resolve against the tmpdir and dangle
        os.symlink(src, os.path.join(d, os.path.basename(src)))
        events_path = d
    static = spark.read.parquet(events_path)
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(events_path)
        .select("user_id", "event_id", "event_type", "value")
    )
    deduped = stream.groupBy("user_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
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
