"""Table profiling (ANALYZE-style data-quality probe): per-column
row/null/distinct counts and min/max, computed in a SINGLE aggregation
pass over the table — the statistics a pipeline checks before and
after every load (and the engine-side generalization of the
reference's row-count / column-list probes, SURVEY §2.1 S13/S14).

Typing contract for the differential gate: numeric and timestamp
columns report min/max as doubles (timestamps as microsecond epochs —
exact integers, engine-identical); string columns report them as
strings (binary collation on both engines). Each side of the long
output carries typed nulls for the other family, so one schema covers
every column.

Scale: one job, one partial-aggregable pass. Multiple exact
count-distincts compile to Spark's Expand (one input pass, k streams)
— exact by choice; at 100 TB you'd flip ``approx=True`` to HLL
(approx_count_distinct) and drop the Expand, at the cost of losing
the exact differential oracle (which is why approx is not the
default here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile_table(
    df: DataFrame, columns: tuple[str, ...] | None = None, approx: bool = False
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nonnull, n_distinct, min_num, max_num,
    min_str, max_str)."""
    cols = list(columns or df.columns)
    for c in cols:
        # names are interpolated into stack() SQL below; quotes or
        # backticks would break out of the literal/identifier
        if "`" in c or "'" in c or "\\" in c:
            raise ValueError(f"unsupported characters in column name: {c!r}")
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__nr")]
    for c in cols:
        dt = dtypes[c]
        nd = (
            F.approx_count_distinct(F.col(c)) if approx else F.countDistinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            nd.alias(f"{c}__nd"),
        ]
        if dt in _NUMERIC or dt.startswith("decimal"):
            lo, hi = F.min(F.col(c)).cast("double"), F.max(F.col(c)).cast("double")
            aggs += [lo.alias(f"{c}__lo"), hi.alias(f"{c}__hi")]
        elif dt.startswith("timestamp"):
            us = F.unix_micros(F.col(c).cast("timestamp"))
            aggs += [
                F.min(us).cast("double").alias(f"{c}__lo"),
                F.max(us).cast("double").alias(f"{c}__hi"),
            ]
        else:  # string-family: lexicographic (binary collation)
            aggs += [
                F.min(F.col(c).cast("string")).alias(f"{c}__los"),
                F.max(F.col(c).cast("string")).alias(f"{c}__his"),
            ]
    wide = df.agg(*aggs)
    branches = []
    for c in cols:
        dt = dtypes[c]
        if dt in _NUMERIC or dt.startswith("decimal") or dt.startswith("timestamp"):
            mn, mx = f"`{c}__lo`", f"`{c}__hi`"
            mns = mxs = "cast(null as string)"
        else:
            mn = mx = "cast(null as double)"
            mns, mxs = f"`{c}__los`", f"`{c}__his`"
        branches.append(
            f"'{c}', `{c}__nn`, `{c}__nd`, {mn}, {mx}, {mns}, {mxs}"
        )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(branches)}) AS "
            "(col_name, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"
        ),
        F.col("__nr").alias("n_rows"),
    ).select(
        "col_name", "n_rows", "n_nonnull", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    )


def corr_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over k numeric columns in ONE
    aggregation pass (k² accumulators: sums, squares, cross-products —
    all partial-aggregable, so the pass is a map-side combine plus one
    tiny shuffle; never k² table scans). Long output:
    (col_a, col_b, corr double), upper triangle including diagonal.

    Determinism contract: moments accumulate as exact decimal sums
    (order-independent), the correlation is one fixed double formula —
    replayable bit-for-bit by the DuckDB oracle. Product casts are
    asymmetric decimal(18,4) × decimal(19,4): the result is precision
    38 scale 8 — exactly at both engines' cap, so products stay exact
    (symmetric 18s overflow DuckDB's int64-backed multiply; anything
    wider overflows Spark's cap and rounds)."""
    dec = {c: F.col(c).cast("decimal(18,4)") for c in columns}
    dec_w = {c: F.col(c).cast("decimal(19,4)") for c in columns}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(F.sum(dec[c]).cast("double").alias(f"_s_{c}"))
    for i, a in enumerate(columns):
        for b in columns[i:]:
            aggs.append(
                F.sum(dec[a] * dec_w[b]).cast("double").alias(f"_p_{a}_{b}")
            )
    wide = df.agg(*aggs)
    branches = []
    for i, a in enumerate(columns):
        for b in columns[i:]:
            # corr = (n*Sab - Sa*Sb) / sqrt((n*Saa - Sa^2)(n*Sbb - Sb^2))
            branches.append(
                f"'{a}', '{b}', "
                f"(_n * `_p_{a}_{b}` - `_s_{a}` * `_s_{b}`) / "
                f"sqrt((_n * `_p_{a}_{a}` - `_s_{a}` * `_s_{a}`) * "
                f"(_n * `_p_{b}_{b}` - `_s_{b}` * `_s_{b}`))"
            )
    n_pairs = len(branches)
    stack = ", ".join(branches)
    return wide.selectExpr(
        f"stack({n_pairs}, {stack}) as (col_a, col_b, corr)"
    )


def key_skew_report(
    df: DataFrame, key_col: str, top: int = 20
) -> DataFrame:
    """Shuffle-skew diagnosis for a prospective join/agg key: the
    ``top`` heaviest keys with their share of all rows and their
    skew ratio (weight vs the mean per-distinct-key weight). A
    skew_ratio ≫ 1 on the hottest key is the signal to salt
    (``operators/skew.py`` / ``dedup._banded_self_pairs``) or rely
    on AQE's skew-join split — this report is how you find out
    BEFORE the 100 TB shuffle stalls on one reducer.

    One partial-aggregable count pass (the same shuffle the real
    query would do, on pre-aggregated rows), one scalar aggregate
    over the per-key counts, and a top-k — all bounded by key
    cardinality, not table size. Deterministic: ties break on the
    key value; doubles are exact-int ratios (engine-identical).
    Returns (key value under the original column name, cnt, share,
    skew_ratio), heaviest first."""
    per = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    stats = per.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__ndv")
    )
    ranked = (
        per.orderBy(F.desc("cnt"), F.asc(key_col))
        .limit(top)
        .crossJoin(F.broadcast(stats))
    )
    return ranked.select(
        key_col,
        "cnt",
        (F.col("cnt") / F.col("__total")).alias("share"),
        (F.col("cnt") * F.col("__ndv") / F.col("__total")).alias("skew_ratio"),
    ).orderBy(F.desc("cnt"), F.asc(key_col))
