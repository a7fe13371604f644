"""Data-layout clustering: linear (sort) and Z-order (Morton curve)
file clustering for the TableStore — the OPTIMIZE ... ZORDER BY of
lakehouse engines, and the layout half of the reference's MergeTree
ORDER BY semantics (ClickHouse tables declare a sort key precisely so
range predicates skip granules; here the skip unit is the file).

Why Z-order: a linear sort gives tight per-file min/max on ONE
column — range predicates on the sort key skip files, predicates on
anything else scan everything. Interleaving the bits of k columns
(Morton code) makes every file a small hyper-rectangle in k-dim key
space, so range predicates on ANY clustered column (or several at
once) prune. The z-value is layout-only — it never changes results,
only which files a predicate can skip via ``TableStore.read_pruned``.

Scale shape: one aggregate pass for per-column ranges (1 row,
broadcast back), one ``repartitionByRange`` shuffle on the z-value
(range partitioner → files tile the curve), within-partition sort.
Rewriting layout is O(table) by nature — schedule it like compaction
(the reference's OPTIMIZE FINAL), not per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ora_ch_spark.store import TableStore


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 12, out_col: str = "__z"
) -> DataFrame:
    """Append the Morton code of ``cols``: each column min-max
    normalized to ``bits``-bit rank space (one tiny agg pass,
    broadcast back), then bit-interleaved (bit i of column j lands at
    position i*k + j). NULLs sort together at curve start (rank 0).
    """
    if not cols or bits * len(cols) > 62:
        raise ValueError(f"need 1+ cols with bits*len(cols) <= 62, got {cols} @ {bits}")
    dtypes = dict(df.dtypes)
    _ok = ("tinyint", "smallint", "int", "bigint", "float", "double",
           "timestamp")
    for c in cols:
        dt = dtypes.get(c)
        if dt is None or not (dt in _ok or dt.startswith("decimal")):
            # a string column would cast to NULL → every row rank 0 →
            # an O(table) rewrite that silently clusters NOTHING; date
            # and timestamp_ntz don't cast to double either — convert
            # upstream (unix_date / a TZ timestamp) before clustering
            raise ValueError(
                f"cluster column {c!r} has non-rankable type {dt!r}; "
                f"supported: numeric or timestamp (convert date/"
                f"timestamp_ntz upstream)"
            )
    rng = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{i}") for i, c in enumerate(cols)],
    )
    with_rng = df.crossJoin(F.broadcast(rng))
    top = (1 << bits) - 1
    k = len(cols)
    ranks = []
    for i, c in enumerate(cols):
        span = F.col(f"__hi_{i}") - F.col(f"__lo_{i}")
        scaled = F.floor(
            (F.col(c).cast("double") - F.col(f"__lo_{i}")) * top
            / F.when(span > 0, span).otherwise(F.lit(1.0))
        ).cast("bigint")
        ranks.append(F.coalesce(F.least(scaled, F.lit(top)), F.lit(0)))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for j, r in enumerate(ranks):
            z = z + F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * k + j)
    return with_rng.withColumn(out_col, z).drop(
        *[f"__lo_{i}" for i in range(k)], *[f"__hi_{i}" for i in range(k)]
    )


def cluster_table(
    store: TableStore,
    schema: str,
    table: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
) -> None:
    """Rewrite a table Z-order-clustered on ``cols`` (k=1 degenerates
    to a plain sort). File count defaults to the current one so the
    rewrite changes layout, not granularity. Results are unchanged;
    ``read_pruned`` range predicates on the clustered columns now
    skip files via the manifest zone maps."""
    m = store._manifest(schema, table)
    if m.get("partition_by"):
        raise ValueError("cluster_table targets unpartitioned tables; "
                         "hive layouts already prune on their partition dirs")
    n = num_files or max(1, len(m["files"]))
    # rewrite input pinned to the same snapshot as the CAS base (r13)
    df = zorder_value(
        store._df_for_manifest(m, store._tdir(schema, table)), cols, bits
    )
    clustered = (
        df.repartitionByRange(n, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    # layout-only rewrite: carry the Bloom index setting through;
    # publish CAS-checked against the snapshot the rewrite read
    store.write(
        schema, table, clustered,
        bloom_columns=m.get("bloom_columns") or [],
        _expect_base=m.get("_base"),
    )
