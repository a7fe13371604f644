"""Keyed-array merge aggregates — the ClickHouse ``sumMap`` /
``minMap`` / ``maxMap`` family (SummingMergeTree's map-column merge
semantics): every row carries parallel (keys[], values[]) arrays, and
the aggregate merges them per group by KEY, not by position.

Spark has no map-merging aggregate, but the semantics decompose into
relational primitives that Catalyst handles well: one positional zip
+ explode, one partial-aggregable (group, key) aggregate, and one
re-collect sorted by key. That is also the honest 100 TB shape — the
only shuffle is on (group, key) with map-side combine, and the final
per-group collect is bounded by the DISTINCT key count per group (CH
holds the same merged map in memory per group).

Output is (group…, keys sorted ascending, vals aligned) as two plain
arrays — the cross-engine-stable encoding of CH's tuple-of-arrays
return value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def map_merge_agg(
    df: DataFrame,
    keys_col: str,
    vals_col: str,
    group_cols: list[str],
    merge: str = "sum",
) -> DataFrame:
    """CH ``sumMap(keys, vals)`` (``merge='sum'``; ``'min'``/``'max'``
    give minMap/maxMap): per group, positionally zip each row's
    arrays, then merge values BY KEY across rows. Ragged rows (arrays
    of different lengths — an ERROR in CH) drop the unpaired
    positions entirely: a key with no value contributes nothing (it
    does NOT surface as a NULL-valued key), and an explicit NULL
    value behaves the same.

    Returns group_cols + ``keys`` (sorted ascending) + ``vals``
    (aligned with keys)."""
    if merge not in _MERGE_FNS:
        raise ValueError(f"merge must be one of {sorted(_MERGE_FNS)}")
    fn = _MERGE_FNS[merge]
    pairs = df.select(
        *group_cols,
        F.explode(F.arrays_zip(F.col(keys_col), F.col(vals_col))).alias("__kv"),
    ).select(
        *group_cols,
        F.col(f"__kv.{keys_col}").alias("__k"),
        F.col(f"__kv.{vals_col}").alias("__v"),
    ).filter(F.col("__k").isNotNull() & F.col("__v").isNotNull())
    per_key = pairs.groupBy(*group_cols, "__k").agg(fn("__v").alias("__m"))
    rolled = per_key.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(F.struct("__k", "__m"))).alias("__kv")
    )
    return rolled.select(
        *group_cols,
        F.expr("transform(__kv, e -> e.__k)").alias("keys"),
        F.expr("transform(__kv, e -> e.__m)").alias("vals"),
    )
