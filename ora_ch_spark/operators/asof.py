"""As-of join — the classic time-series operator Spark has no native
form of (the reference has none either; DuckDB/kdb/pandas do).

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` within the same key (inclusive at equality).

Implementation is a pure DataFrame composition — the union-and-carry
trick: tag both sides, union, and per key carry the last-seen right
row forward with ``last(..., ignorenulls=True)`` over an
(event-time, side) ordering where right rows sort BEFORE left rows at
equal timestamps (inclusive semantics). One shuffle on the key, one
within-partition sort — the same cost as a window function, never a
range cross-join. (Alternative at extreme scale: bucketize time +
equi-join + per-bucket fallback, or ``pd.merge_asof`` per group via
applyInPandas.)

Rights must be unique per (key, ts) — pre-deduplicate (the helper
keeps the max tiebreak id) — otherwise "the" as-of match is ambiguous
in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right values
    at-or-before its timestamp (NULLs when no prior right row)."""
    rvals = right_value_cols or [
        c for c in right.columns if c not in key_cols + [right_ts]
    ]
    l_tag = left.withColumn("__side", F.lit(1)).withColumn("__ats", F.col(left_ts))
    r_tag = (
        right.select(
            *key_cols,
            F.col(right_ts).alias("__ats"),
            *[F.col(c).alias(f"__r_{c}") for c in rvals],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__r_ts", F.col("__ats"))
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in [f"__r_{c}" for c in rvals] + ["__r_ts"]:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    u = l_tag.select(r_tag.columns).unionByName(r_tag)
    # rights (side=0) sort before lefts (side=1) at equal ts → inclusive
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ats"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in rvals
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *left.columns, *[f"asof_{c}" for c in rvals], "asof_ts"
    )


def dedup_right_per_ts(
    right: DataFrame, key_cols: list[str], ts_col: str, tiebreak_col: str
) -> DataFrame:
    """One right row per (key, ts): keep the max tiebreak id (makes
    the as-of match unambiguous on any engine)."""
    w = Window.partitionBy(*key_cols, ts_col).orderBy(F.desc(tiebreak_col))
    return (
        right.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def interval_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "window_start",
    end_col: str = "window_end",
    bin_minutes: int = 60,
) -> DataFrame:
    """Point-in-interval (range) join, the scale-correct way: Spark
    has no range-join optimizer rule, so a naive
    ``events JOIN intervals ON ts BETWEEN start AND end`` compiles to
    a BroadcastNestedLoopJoin (corpus × every interval — quadratic
    scans) or an outright cartesian. The standard fix is **time
    binning**: explode each interval into the fixed-width bins it
    overlaps, map each event to its single bin, equi-join on the bin
    key (hash join — shuffle-partitionable, AQE-skew-handled), then
    re-check the exact BETWEEN predicate to discard bin-edge false
    candidates. Bin width is the tuning knob: ≈ median interval
    length keeps the explode factor ~2 while the equi-join prunes
    everything non-overlapping.

    Returns event rows joined with their matching interval's columns
    (events in k overlapping intervals appear k times — range-join
    semantics)."""
    binw = bin_minutes * 60  # seconds; integer div below — no float epochs
    ev = events.withColumn("__bin", F.expr(f"unix_timestamp({ts_col}) div {binw}"))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.expr(
                f"sequence(unix_timestamp({start_col}) div {binw},"
                f" unix_timestamp({end_col}) div {binw})"
            )
        ),
    )
    return (
        ev.join(iv, "__bin")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bin")
    )
