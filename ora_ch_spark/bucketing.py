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


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — Catalyst
    plans a SortMergeJoin with zero Exchange when the bucket specs
    line up."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
