"""Bucketed (co-located) tables — shuffle-free joins on a fixed key.

The scale technique for repeated fact-fact joins: write both tables
bucketed by the join key (``bucketBy(n, key).sortBy(key)``); Spark's
session catalog records the bucketing, and later equi-joins on that
key read matching buckets pairwise — **no Exchange** on either side
of the SortMergeJoin. At 100 TB this converts the nightly
lineitem⋈orders shuffle (twice the data over the network) into a
local merge per bucket.

Sizing: buckets ≈ total_size / target_partition_size (e.g. 100 TB /
256 MiB ≈ 400k — cap to a few thousand and accept multiple files per
bucket). Both tables MUST use the same bucket count for the
co-located read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Save as a bucketed managed table (session catalog +
    ``spark.sql.warehouse.dir``)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, tuple[str, ...]] | None:
    """(num_buckets, bucket_columns) from the catalog, or None if the
    table isn't bucketed."""
    rows = {r.col_name: r.data_type for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()}
    if "Num Buckets" not in rows:
        return None
    cols = tuple(
        c.strip().strip("`")
        for c in rows.get("Bucket Columns", "").strip("[]").split(",")
        if c.strip()
    )
    return int(rows["Num Buckets"]), cols


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — Catalyst
    plans a SortMergeJoin with zero Exchange when the bucket specs
    line up. Fails fast on a spec mismatch instead of silently
    regressing to a shuffled join."""
    ls, rs = bucket_spec(spark, left_table), bucket_spec(spark, right_table)
    if ls is None or rs is None or ls != rs or set(ls[1]) != set(on):
        raise ValueError(
            f"co-located join requires identical bucket specs on the join key: "
            f"{left_table}={ls}, {right_table}={rs}, on={on}"
        )
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
