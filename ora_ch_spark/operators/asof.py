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
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right values nearest
    its timestamp in the given ``direction`` (NULLs when none exists):

    - ``backward`` (default): greatest right_ts <= left_ts,
    - ``forward``: smallest right_ts >= left_ts,
    - ``nearest``: whichever of the two is closer in absolute time,
      ties resolved backward (pandas ``merge_asof`` convention).

    ``tolerance_seconds`` (pandas/polars ``tolerance``): a match
    farther than this from the left timestamp is rejected — the
    asof_* columns come back NULL, exactly as if no right row
    existed. Applied AFTER the pick (a post-filter on the carried
    struct), so the plan is unchanged.

    All three are the same one-shuffle union-and-carry plan; nearest
    carries both directions in a single window pass and picks per
    row — still no range join, still no second shuffle."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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
    # backward frame: rights (side=0) sort before lefts (side=1) at
    # equal ts → the preceding frame INCLUDES the equal-ts right.
    # forward frame: same ordering, frame flipped to (current,
    # following) — but the equal-ts right sorts BEFORE the left row and
    # would escape the frame, so the forward pass sorts by (ts, -side).
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ats"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ats"), F.col("__side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # the carried unit is ONE struct per right row (NULL on left rows):
    # ignorenulls then skips exactly the left rows, never a right row
    # whose VALUE happens to be NULL — carrying columns independently
    # would mix fields from different right records in that case, and
    # nearest's pick must take ts and values from the same record
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            *[F.col(f"__r_{c}").alias(c) for c in rvals],
            F.col("__r_ts").alias("__ts"),
        ),
    )
    u = u.withColumn("__p", payload)
    cols: list = ["*"]
    if direction in ("backward", "nearest"):
        cols.append(F.last("__p", ignorenulls=True).over(w_back).alias("__bp"))
    if direction in ("forward", "nearest"):
        cols.append(F.first("__p", ignorenulls=True).over(w_fwd).alias("__fp"))
    carried = u.select(*cols).filter(F.col("__side") == 1)
    if direction == "backward":
        src = F.col("__bp")
    elif direction == "forward":
        src = F.col("__fp")
    else:
        # closer side wins; ties and single-sided rows → backward
        d_b = F.unix_micros(F.col("__ats")) - F.unix_micros(F.col("__bp.__ts"))
        d_f = F.unix_micros(F.col("__fp.__ts")) - F.unix_micros(F.col("__ats"))
        use_fwd = F.col("__bp").isNull() | (
            F.col("__fp").isNotNull() & (d_f < d_b)
        )
        src = F.when(use_fwd, F.col("__fp")).otherwise(F.col("__bp"))
    carried = carried.withColumn("__pick", src)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ats")) - F.unix_micros(F.col("__pick.__ts"))
        )
        carried = carried.withColumn(
            "__pick",
            F.when(gap <= tolerance_seconds * 1_000_000, F.col("__pick")),
        )
    picked = [F.col(f"__pick.{c}").alias(f"asof_{c}") for c in rvals] + [
        F.col("__pick.__ts").alias("asof_ts")
    ]
    return carried.select(*left.columns, *picked)


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
