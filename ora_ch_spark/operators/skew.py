"""Skew-aware join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in session.py) handles most skew at runtime. This
module adds **explicit key salting** for the cases AQE can't fix —
a shuffle join where one side has a pathological hot key (e.g. a
`user_id = NULL`-sentinel or a mega-customer) and the other side is
too big to broadcast:

- the skewed (large) side gets a random-ish salt in [0, buckets)
  derived **deterministically** from other row content (md5 — keeps
  runs reproducible, unlike rand());
- the small-but-unbroadcastable side is replicated `buckets` times;
- the join key becomes (key, salt), spreading each hot key over
  `buckets` reducers.

Cost model: replication multiplies the small side by `buckets`; use
the smallest `buckets` that flattens the hot key (rule of thumb:
hot_key_rows / avg_key_rows, capped at the shuffle partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with salted keys. ``salt_source``: a column of
    ``large`` used to derive the salt (defaults to the concatenation
    of the join keys + a per-row hash of all columns).

    Only ``inner``/``left``/``left_semi``/``left_anti`` (large side
    preserved) are supported: the small side is replicated per salt
    bucket, so right/full-outer would emit ``buckets`` duplicates of
    every unmatched small-side row."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports only large-side-preserving joins {sorted(allowed)}; got {how!r}"
        )
    if salt_source is not None:
        # NULL-safe: a NULL salt_source must still land in a bucket
        # (md5(NULL) is NULL and would silently unmatch the row)
        salt_expr = F.conv(
            F.substring(
                F.md5(F.coalesce(F.col(salt_source).cast("string"), F.lit("\x00"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
    else:
        # row-position salt: correctness holds for ANY per-row salt
        # (the small side is replicated for every bucket), and position
        # spreads even fully-identical duplicate rows of a hot key —
        # which content hashing would funnel into one bucket
        salt_expr = F.monotonically_increasing_id()
    lg = large.withColumn("__salt", F.pmod(salt_expr, F.lit(buckets)).cast("int"))
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return lg.join(sm, on=on + ["__salt"], how=how).drop("__salt")


def key_histogram(df: DataFrame, on: list[str], top: int = 20) -> DataFrame:
    """Skew diagnosis: per-key row counts, heaviest first — feed the
    hot-key list into `buckets` sizing (or a broadcast carve-out)."""
    return (
        df.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.desc("rows"))
        .limit(top)
    )
