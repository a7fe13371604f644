"""Time-series regularization: bucket an event stream to a fixed
grid, materialize the missing buckets (the gaps), and forward-fill
carried values — the resample/asfreq+ffill primitive every
monitoring / feature-engineering pipeline needs before window models.

Scale shape:
- The per-(entity, bucket) rollup is one partial-agg shuffle on the
  natural key.
- The spine (one row per entity-bucket in the entity's own [min, max]
  span) is generated DISTRIBUTED via ``sequence()`` + ``explode`` from
  each entity's 2-row span — never on the driver; its size is
  entities × span-buckets regardless of event volume, which is the
  whole point of downsampling.
- Forward fill is a within-partition running ``last(ignorenulls)``
  window over the same partitioning the spine join used, so the only
  shuffles are the rollup and the spine join (both on the entity key;
  AQE coalesces the tiny spine side).

Sums follow the engine determinism contract (decimal accumulate →
double present), see ``catalog.py`` docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FREQ_STEP = {"hour": "interval 1 hour", "day": "interval 1 day"}


def resample_gapfill(
    events: DataFrame,
    freq: str = "hour",
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-entity fixed-grid resample with gap materialization and
    forward fill. Returns one row per (entity, bucket) across the
    entity's own observed span: event count (0 on gaps), the bucket's
    own sum (NULL on gaps), and the forward-filled sum."""
    if freq not in _FREQ_STEP:
        raise ValueError(f"freq must be one of {sorted(_FREQ_STEP)}, got {freq!r}")
    from ora_ch_spark.io import normalize_ts

    events = normalize_ts(events, ts_col)
    bucket = F.date_trunc(freq, F.col(ts_col)).alias("bucket")
    agg = (
        events.groupBy(F.col(id_col), bucket)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("val_sum"),
        )
    ).persist()  # spans + spine join both read it — without this the
    # raw event scan runs twice (engine convention: operators persist
    # internally, the session owner clears between workloads)
    spans = agg.groupBy(id_col).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    spine = spans.select(
        id_col,
        F.explode(
            F.expr(f"sequence(__b0, __b1, {_FREQ_STEP[freq]})")
        ).alias("bucket"),
    )
    filled = spine.join(agg, [id_col, "bucket"], "left")
    w = (
        Window.partitionBy(id_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        id_col,
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "val_sum",
        F.last("val_sum", ignorenulls=True).over(w).alias("val_filled"),
    )
