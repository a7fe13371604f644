"""Event-funnel and retention analytics — the ClickHouse
``windowFunnel()`` / ``retention()`` aggregate surface re-expressed as
Spark operators.

The reference's target dialect ships these as parameterized aggregate
functions (a CH user's event-analytics queries lean on them heavily);
Spark has no direct equivalent, so they are operators here:

- :func:`window_funnel` — per-user conversion depth through an ordered
  step sequence within a time window, anchored at the user's EARLIEST
  step-1 event (the standard first-conversion funnel). CH's
  ``windowFunnel`` additionally retries chains from every step-1
  event; the first-anchor rule is the common product-analytics
  definition and — unlike the retry form — replays exactly in ANSI
  SQL for the differential gate. Deviation documented here.

- :func:`retention` — CH ``retention(cond0, cond1, …)``: of the users
  satisfying cond0, how many also satisfy each later condition. Same
  flag algebra as CH (r_i = f_0 AND f_i), aggregated in one pass.

Scale posture: both are one shuffle on ``user_col``. The funnel's
per-step refinements are conditional-min aggregations over the
already-grouped frame (each step joins the step events once and
re-groups on the user — partial aggregation applies, no windows over
hot keys); retention is a single groupBy with conditional-max flags,
the cheapest possible shape. Timestamps compare as integer
microseconds (``unix_micros``) so the window arithmetic is
engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    steps: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    step_conds: list[str] | None = None,
    mode: str = "strict_increase",
) -> DataFrame:
    """Per-user funnel depth: ``(user, level)`` where level k means
    steps[0..k-1] occurred in strict time order, all within
    ``window_seconds`` of the user's earliest step-1 event. Nulls
    cascade: a missing step i leaves every later step null, so
    ``level = 1 + #non-null later steps`` is the chain length.

    ``step_conds`` generalizes the steps to arbitrary SQL boolean
    expressions over the event row (CH windowFunnel's cond list);
    without it each step matches ``type_col == steps[i]``.

    ``mode``: ``'strict_increase'`` (historical default here —
    CH's ``strict_increase`` modifier: each step's timestamp must be
    STRICTLY greater than the previous step's) or ``'default'``
    (CH's unmodified windowFunnel: equal timestamps may chain).
    CH's ``strict_dedup``/``strict_order`` modifiers (chain broken
    by interleaved events) are not expressible in this
    conditional-min shape and are not offered."""
    if mode not in ("strict_increase", "default"):
        raise ValueError("mode must be 'strict_increase' or 'default'")
    n_steps = len(step_conds) if step_conds is not None else len(steps)
    if n_steps < 2:
        raise ValueError("funnel needs at least 2 steps")
    us = F.unix_micros(F.col(ts_col))
    base = events.withColumn("__us", us)

    def matches(i: int) -> DataFrame:
        if step_conds is not None:
            m = base.filter(F.expr(step_conds[i]))
        else:
            m = base.filter(F.col(type_col) == steps[i])
        return m.select(F.col(user_col).alias("u"), F.col("__us").alias("us"))

    out = matches(0).groupBy("u").agg(F.min("us").alias("t1"))
    w_us = window_seconds * 1_000_000
    for i in range(2, n_steps + 1):
        si = matches(i - 1).select("u", F.col("us").alias("si"))
        prev = F.col(f"t{i - 1}")
        keep = [f"t{j}" for j in range(1, i)]
        out = (
            out.join(si, "u", "left")
            .withColumn(
                "__q",
                F.when(
                    (
                        (F.col("si") > prev)
                        if mode == "strict_increase"
                        else (F.col("si") >= prev)
                    )
                    & (F.col("si") <= F.col("t1") + w_us),
                    F.col("si"),
                ),
            )
            .groupBy("u", *keep)
            .agg(F.min("__q").alias(f"t{i}"))
        )
    level = F.lit(1)
    for i in range(2, n_steps + 1):
        level = level + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.select(F.col("u").alias(user_col), level.cast("int").alias("level"))


def sequence_match(
    events: DataFrame,
    conds: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """CH ``sequenceMatch('(?1).*(?2)…')`` for the ordered-conditions
    pattern family: one row per user with ``matched`` = whether events
    satisfying cond1 → cond2 → … occur in strict time order (no time
    bound — the funnel with an unbounded window, anchored at the
    earliest cond1 event; level == n ⇔ match). Patterns with
    time-gap operators map to :func:`window_funnel` directly."""
    if not conds:
        raise ValueError("sequence_match needs at least one condition")
    if len(conds) == 1:
        # CH accepts one-condition patterns ('(?1)'); the 2+-step
        # funnel would reject them — matched ⇔ any event satisfies
        # cond1 (ADVICE r04)
        hits = (
            events.filter(F.expr(conds[0]))
            .select(F.col(user_col))
            .distinct()
            .withColumn("__hit", F.lit(True))
        )
        return (
            events.select(F.col(user_col))
            .distinct()
            .join(hits, user_col, "left")
            .select(
                user_col,
                F.coalesce(F.col("__hit"), F.lit(False)).alias("matched"),
            )
        )
    horizon = 200 * 365 * 24 * 3600  # effectively unbounded
    per_user = window_funnel(
        events,
        steps=[],
        window_seconds=horizon,
        user_col=user_col,
        ts_col=ts_col,
        step_conds=conds,
    )
    # CH sequenceMatch returns 0 (not no-row) for users whose events
    # never satisfy cond1 — left-join the full user set back in
    all_users = events.select(F.col(user_col)).distinct()
    return all_users.join(per_user, user_col, "left").select(
        user_col,
        F.coalesce(F.col("level") == len(conds), F.lit(False)).alias("matched"),
    )


def funnel_counts(per_user: DataFrame) -> DataFrame:
    """Roll the per-user levels up to ``(level, n_users)``."""
    return per_user.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def retention(
    events: DataFrame,
    conds: list[str],
    user_col: str = "user_id",
) -> DataFrame:
    """CH ``retention()``: one row per condition index with the count
    of users satisfying cond0 AND cond_i (index 0 = the cond0 cohort
    itself). ``conds`` are SQL boolean expressions over the event
    row. One groupBy, conditional-max flags — a single pass."""
    if not conds:
        raise ValueError("retention needs at least one condition")
    n = len(conds)
    flags = [
        F.max(F.when(F.expr(c), 1).otherwise(0)).alias(f"f{i}")
        for i, c in enumerate(conds)
    ]
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(*flags)
    sums = per_user.agg(
        *[
            F.sum((F.col("f0") * F.col(f"f{i}")).cast("bigint")).alias(f"r{i}")
            for i in range(n)
        ]
    )
    # unpivot the single summary row — one aggregation pass total
    stack = ", ".join(f"{i}, r{i}" for i in range(n))
    return sums.selectExpr(
        f"stack({n}, {stack}) as (cond_index, n_users)"
    ).select(F.col("cond_index").cast("int"), F.col("n_users").cast("bigint"))
