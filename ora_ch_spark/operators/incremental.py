"""Incremental view maintenance (IVM) for distributive aggregates:
a materialized per-group rollup of a store table that refreshes from
the MANIFEST DELTA — only files appended since the last refresh are
read, and their partial aggregates merge into the view by group key.

This is the batch materialization of the same incremental contract
the reference's append operations keep (O3's watermark probe,
``ora/jdbcSession.scala:93-121``): refresh cost is O(delta), never
O(source). Correct for distributive/algebraic aggregates (count,
sum; avg = sum/count at read time). Sums accumulate in DECIMAL so
the merge is exact and order-independent — refresh-in-N-steps is
bit-identical to one full recompute.

Fallback contract: if any previously-processed file LEFT the
manifest (delete_where, keyed update, compaction rewrote groups),
the delta bookkeeping can no longer prove correctness and the
refresh recomputes from scratch — detected from the file set alone,
no data read. A production extension would retract per-file partials
instead; recompute-on-shrink is the safe default.

State: the processed file list persists through ``SyncState`` (the
engine's watermark store), written only AFTER the view commit — a
crashed refresh re-reads its delta (at-least-once, idempotent
because the view write is a full snapshot swap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ora_ch_spark.store import TableStore
from ora_ch_spark.syncstate import SyncState

_SUM_TYPE = "decimal(30,2)"  # fixed across refreshes: exact, headroom


def refresh_agg_view(
    store: TableStore,
    src: tuple[str, str],
    view: tuple[str, str],
    group_cols: list[str],
    value_col: str,
    sync: SyncState | None = None,
) -> DataFrame:
    """Bring the materialized rollup ``view`` (group_cols, n_rows,
    val_sum) up to date with ``src``; returns the refreshed view."""
    src_schema, src_table = src
    view_schema, view_table = view
    sync = sync or SyncState(store.root)
    state_key = f"__ivm__{view_schema}.{view_table}"

    m = store._manifest(src_schema, src_table)
    cur = sorted(fe["path"] for fe in m["files"] if fe["rows"] > 0)
    done = sync.get_watermark(src_schema, src_table, state_key) or []
    done_set, cur_set = set(done), set(cur)

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast(_SUM_TYPE)
            .alias("val_sum"),
        )

    view_exists = store.table_exists(view_schema, view_table)
    # hive-partitioned sources always full-recompute: read_files does
    # not restore partition columns from the dir layout, so a delta
    # read would lose them (and partition drops already mean shrink)
    partitioned = bool(m.get("partition_by"))
    if partitioned or (done_set - cur_set) or not view_exists:
        # shrunk file set (delete/update/compaction) or first build →
        # the safe full recompute
        view_df = _agg(store.read(src_schema, src_table))
    else:
        new = [p for p in cur if p not in done_set]
        if not new:
            return store.read(view_schema, view_table)
        partial = _agg(store.read_files(src_schema, src_table, new))
        old = store.read(view_schema, view_table)
        view_df = (
            old.unionByName(partial)
            .groupBy(*group_cols)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("val_sum").cast(_SUM_TYPE).alias("val_sum"),
            )
        )
    store.write(view_schema, view_table, view_df)
    sync.set_watermark(src_schema, src_table, state_key, cur)
    return store.read(view_schema, view_table)
