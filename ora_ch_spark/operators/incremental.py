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

Crash safety: the processed-file list commits INSIDE the view's own
snapshot manifest (``store.write(meta=...)``) — one atomic pointer
swap covers data and state, so a crash anywhere leaves either the
old view with the old watermark or the new view with the new one.
There is no window in which the delta could be merged twice.

Fallback contract: if any previously-processed file LEFT the source
manifest (delete_where, keyed update, compaction rewrote groups) —
or the source is hive-partitioned (a file-list delta read would drop
the partition columns) — the refresh recomputes from scratch,
detected from the manifests alone with no data read. A production
extension would retract per-file partials instead; recompute-on-
shrink is the safe default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ora_ch_spark.store import TableStore

_SUM_TYPE = "decimal(30,2)"  # fixed across refreshes: exact, headroom
_META_KEY = "ivm_processed_files"


def refresh_agg_view(
    store: TableStore,
    src: tuple[str, str],
    view: tuple[str, str],
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Bring the materialized rollup ``view`` (group_cols, n_rows,
    val_sum) up to date with ``src``; returns the refreshed view."""
    src_schema, src_table = src
    view_schema, view_table = view

    m = store._manifest(src_schema, src_table)
    cur = sorted(fe["path"] for fe in m["files"] if fe["rows"] > 0)
    view_exists = store.table_exists(view_schema, view_table)
    done = (
        store.table_meta(view_schema, view_table).get(_META_KEY, [])
        if view_exists
        else []
    )
    done_set, cur_set = set(done), set(cur)

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast(_SUM_TYPE)
            .alias("val_sum"),
        )

    # hive-partitioned sources always full-recompute: read_files does
    # not restore partition columns from the dir layout, so a delta
    # read would lose them (and partition drops already mean shrink)
    partitioned = bool(m.get("partition_by"))
    if partitioned or (done_set - cur_set) or not view_exists:
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
    store.write(view_schema, view_table, view_df, meta={_META_KEY: cur})
    return store.read(view_schema, view_table)
