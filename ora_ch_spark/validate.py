"""Golden-aggregate reconciliation — the reference's own correctness
method, generalized.

The reference validates copies by comparing ``count``/``sum``
aggregates across systems (the shipped query's golden header,
``v_cache_for_calc_6184_4626.txt:2-4``: ``select sum(1) as cnt,
sum(summa) as summa``) and by per-copy row-count accounting
(``ora/jdbcSession.scala:544-615``). Here: after a load operation,
compute ``count(*)`` plus an exact ``decimal(38,6)`` sum of every
numeric column on BOTH the shaped source and the target, and compare.

Decimal sums are exact and order-independent, so source/target totals
match bit-for-bit iff the copied data does — a cheap one-pass check
that catches dropped/duplicated/corrupted rows at any scale (one
aggregate job per side; no row-level diff)."""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUMERIC_TYPES = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal", "long", "short", "byte"}


@dataclass(frozen=True)
class GoldenAggregates:
    count: int
    sums: dict[str, Decimal | None]


def golden_aggregates(df: DataFrame, columns: list[str] | None = None) -> GoldenAggregates:
    """count(*) + exact decimal sums of the numeric columns."""
    # exact base-type match (prefix matching would also catch
    # "interval day to second" etc.)
    num_cols = [
        name
        for name, dtype in df.dtypes
        if (columns is None or name in columns)
        and dtype.split("(")[0] in NUMERIC_TYPES
    ]
    # try_cast: values beyond decimal(38,6)'s 32 integer digits become
    # NULL instead of an ANSI-mode crash — reconciliation still
    # compares like-for-like because both sides go through the same
    # cast (documented magnitude limit: |x| < 1e32)
    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(F.expr(f"try_cast({c} as decimal(38,6))")).alias(c) for c in num_cols
    ]
    row = df.agg(*aggs).first()
    return GoldenAggregates(
        count=row["__cnt"],
        sums={c: row[c] for c in num_cols},
    )


class ReconciliationError(AssertionError):
    pass


def reconcile(source: DataFrame, target: DataFrame, label: str = "") -> GoldenAggregates:
    """Assert source and target agree on count + every numeric sum.
    Returns the (matching) golden aggregates."""
    s = golden_aggregates(source)
    t = golden_aggregates(target, columns=list(s.sums))
    problems = []
    if s.count != t.count:
        problems.append(f"count {s.count} != {t.count}")
    for c, sv in s.sums.items():
        tv = t.sums.get(c)
        if sv != tv:
            problems.append(f"sum({c}) {sv} != {tv}")
    if problems:
        raise ReconciliationError(f"golden mismatch {label}: " + "; ".join(problems))
    return s
