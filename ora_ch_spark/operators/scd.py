"""Slowly-changing-dimension (type 2) merge — the warehouse-side
history-keeping counterpart of the reference's ALTER-UPDATE merge
(``ora_ch_spark/operators/load_ops.py:update_op`` overwrites in
place; SCD2 *versions* instead). Reference parity anchor: the update
operation's key-matched merge semantics (``ora/jdbcSession.scala``
staged-update flow), extended with validity intervals.

Semantics (the standard Kimball type-2 contract):

- ``base`` is the current history: every key has exactly one row with
  ``is_current = true`` (open interval, ``eff_to`` NULL); closed rows
  carry their ``[eff_from, eff_to)`` span.
- ``updates`` is a snapshot batch effective ``batch_date`` with one
  row per key (caller contract — dedup upstream if the feed can
  repeat keys).
- A key whose tracked attributes CHANGED gets its current row closed
  (``eff_to = batch_date``) and a new open row inserted.
- A key absent from the batch, or present with identical tracked
  attributes (NULL-safe comparison), passes through untouched — no
  spurious versions.
- A brand-new key inserts an open row.

Scale shape: ONE shuffle — the full-outer join of current rows vs
the batch on the dimension key. Closed history never joins (it
unions straight through — at 100 TB that's the bulk of the table and
it stays untouched on disk with a manifest-level append of the new
rows). The joined frame is persisted because three branches (closed /
carried / inserted) read it; all three are narrow projections.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    batch_date: str,
    from_col: str = "eff_from",
    to_col: str = "eff_to",
    cur_col: str = "is_current",
) -> DataFrame:
    """Apply one snapshot batch to a type-2 history table; returns the
    new history (closed rows ∪ close-outs ∪ carried rows ∪ inserts).

    ``updates`` must contain ``key_col`` + every ``tracked_cols``;
    change detection is NULL-safe per tracked column."""
    attrs = list(tracked_cols)
    hist = base.filter(~F.col(cur_col))
    cur = base.filter(F.col(cur_col))

    u = updates.select(
        F.col(key_col),
        *[F.col(c).alias(f"__u_{c}") for c in attrs],
    ).withColumn("__in_batch", F.lit(True))
    j = cur.join(u, key_col, "full_outer").persist()

    in_cur = F.col(from_col).isNotNull()  # eff_from never NULL on real rows
    in_batch = F.col("__in_batch").isNotNull()
    changed = in_cur & in_batch & ~reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"__u_{c}")) for c in attrs],
    )
    batch_d = F.to_timestamp(F.lit(batch_date))

    out_cols = [key_col, *attrs, from_col, to_col, cur_col]
    closed = (
        j.filter(changed)
        .withColumn(to_col, batch_d)
        .withColumn(cur_col, F.lit(False))
        .select(*out_cols)
    )
    carried = j.filter(in_cur & ~changed).select(*out_cols)
    inserted = (
        j.filter(changed | (in_batch & ~in_cur))
        .select(
            F.col(key_col),
            *[F.col(f"__u_{c}").alias(c) for c in attrs],
            batch_d.alias(from_col),
            F.lit(None).cast("timestamp").alias(to_col),
            F.lit(True).alias(cur_col),
        )
    )
    return hist.select(*out_cols).unionByName(closed).unionByName(carried).unionByName(
        inserted
    )


def as_scd2_base(
    dim: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    initial_date: str,
    from_col: str = "eff_from",
    to_col: str = "eff_to",
    cur_col: str = "is_current",
) -> DataFrame:
    """Bootstrap a plain dimension table into SCD2 shape: every row
    becomes the open (current) version effective ``initial_date``."""
    return dim.select(
        F.col(key_col),
        *[F.col(c) for c in tracked_cols],
        F.to_timestamp(F.lit(initial_date)).alias(from_col),
        F.lit(None).cast("timestamp").alias(to_col),
        F.lit(True).alias(cur_col),
    )
