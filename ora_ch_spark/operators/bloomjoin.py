"""Bloom-filter semi-join pruning — the scan-side join filter every
100 TB engine applies before shuffling a fact table.

The pattern (Spark's own runtime row-level filtering, Bloom-join in
classic distributed databases): build a compact membership filter
over the SMALL side's join keys, broadcast it, and drop fact rows
that cannot match BEFORE the join's shuffle/probe. False positives
only cost wasted probe work — the exact join afterwards removes them
— so correctness never depends on the filter.

Representation: the filter is the set of SET BIT POSITIONS
(k md5-derived positions per key, modulo m) kept as a distinct-
position table rather than packed words — identical false-positive
behavior, but expressible as k broadcast ``left_semi`` joins with no
bit-twiddling UDFs and exactly replayable in the DuckDB oracle. At
m = 2^14 the table is ≤ 16384 rows ≡ a 2 KB bitmap — broadcast-free
to ship however many executors probe it.

Membership = ALL k positions present, implemented as k successive
broadcast left-semi joins (no explode: the fact table is scanned
once, each join is a broadcast hash probe inside the same stage —
whole-stage codegen keeps it one pass). Probe cost is k hash lookups
per row; shuffle volume after pruning drops by the selectivity of the
dim filter, which is the entire point at scale.

Reference anchor: the reference prunes with IN-subqueries pushed to
ClickHouse (`calc/CalcLogic.scala` query text); a Bloom pre-filter is
the scale-out generalization when the key set no longer fits an IN
list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ora_ch_spark.functions.hashes import md5_long

BLOOM_M = 1 << 14  # bits
BLOOM_K = 4  # hash functions


def bloom_position(key: Column, i: int) -> Column:
    """i-th md5-derived bit position for ``key`` (string column)."""
    return md5_long(F.concat_ws(":", F.lit(f"bf{i}"), key)) % BLOOM_M


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the filter from the small side: distinct set-bit
    positions (≤ min(k·|keys|, m) rows). Union-of-projections
    collapses to one Expand over the scan; mergeable by UNION."""
    parts = [
        keys.select(bloom_position(F.col(key_col).cast("string"), i).alias("pos"))
        for i in range(BLOOM_K)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_prune(fact: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Keep fact rows whose k positions are ALL set: k broadcast
    left-semi joins, each dropping rows early. Result is a superset
    of the true matches (false-positive rate ≈ (1-e^{-kn/m})^k)."""
    out = fact
    for i in range(BLOOM_K):
        out = (
            out.withColumn(
                "__bf_pos", bloom_position(F.col(key_col).cast("string"), i)
            )
            .join(
                F.broadcast(bloom.withColumnRenamed("pos", "__bf_pos")),
                "__bf_pos",
                "left_semi",
            )
            .drop("__bf_pos")
        )
    return out


def bloom_oracle_positions_sql(key_sql: str) -> str:
    """DuckDB expression fragments replaying bloom_position for
    i = 0..k-1 (``key_sql`` must already be varchar)."""
    return ", ".join(
        f"('0x' || substr(md5('bf{i}' || ':' || {key_sql}), 1, 15))::BIGINT % {BLOOM_M}"
        for i in range(BLOOM_K)
    )
