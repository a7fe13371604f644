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


def _frac_ranks2(df: DataFrame, col: str, alias: str) -> DataFrame:
    """Doubled fractional (tie-averaged) ranks of ``col``'s non-null
    values: (value, 2·rank) — ×2 keeps half-integer average ranks as
    exact bigints. Shared by :func:`spearman_corr` and
    :func:`auc_exact`; one distinct-value aggregate + a cumulative
    sum bounded by the column's cardinality."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    # avg rank of a tie group = before + (c+1)/2; ×2 keeps it int
    return per.withColumn(
        "__before", F.coalesce(F.sum("__c").over(w), F.lit(0))
    ).select(
        F.col("__v").alias(col),
        (F.lit(2) * F.col("__before") + F.col("__c") + 1).alias(alias),
    )


def spearman_corr(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Spearman rank correlation (CH ``rankCorr``): Pearson over
    FRACTIONAL ranks (ties get the average rank — the textbook
    definition both engines can replay exactly). Determinism recipe:
    ranks are half-integers, carried ×2 as exact bigints; the moment
    sums use the asymmetric decimal(18,4)×decimal(19,4) trick from
    :func:`corr_matrix`; the final formula is one fixed double
    expression over exact inputs (+,-,*,/ and sqrt are correctly
    rounded — engine-identical).

    Scale shape: the rank map is one aggregate per DISTINCT value +
    a cumulative sum over the (cardinality-bounded) distinct-value
    table, then an equi-join back — never a global row sort. Use on
    columns whose cardinality fits a broadcast (measurement-style
    numerics); continuous high-cardinality columns rank via their
    value order statistics the same way at higher join cost.

    NULL handling: rows where EITHER column is NULL are dropped
    before ranking (pandas' pairwise-complete convention — ranking
    over one column's full domain and joining after would skew rho).
    A constant column has zero rank variance → rho is NULL, not a
    divide-by-zero abort (ANSI mode).

    Returns one row: (col_a, col_b, n, rho)."""
    df = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    ranked = (
        df.select(col_a, col_b)
        .join(_frac_ranks2(df, col_a, "__ra2"), col_a)
        .join(_frac_ranks2(df, col_b, "__rb2"), col_b)
    )
    a = F.col("__ra2").cast("decimal(18,4)")
    b = F.col("__rb2").cast("decimal(19,4)")
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(a).cast("double").alias("sa"),
        F.sum(F.col("__rb2").cast("decimal(18,4)")).cast("double").alias("sb"),
        F.sum(a * b).cast("double").alias("sab"),
        F.sum(a * a.cast("decimal(19,4)")).cast("double").alias("saa"),
        F.sum(F.col("__rb2").cast("decimal(18,4)") * b).cast("double").alias("sbb"),
    )
    var_prod = (m["n"] * F.col("saa") - F.col("sa") * F.col("sa")) * (
        m["n"] * F.col("sbb") - F.col("sb") * F.col("sb")
    )
    rho = F.when(
        var_prod > 0,
        (m["n"] * F.col("sab") - F.col("sa") * F.col("sb"))
        / F.sqrt(var_prod),
    )
    return m.select(
        F.lit(col_a).alias("col_a"),
        F.lit(col_b).alias("col_b"),
        F.col("n").cast("bigint").alias("n"),
        rho.alias("rho"),
    )


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact ROC AUC (Mann-Whitney form with ½ tie credit) — the
    eval-side companion of the quality classifiers: AUC =
    (Σ rank(positives) − P(P+1)/2) / (P·N) with fractional
    average ranks over ``score_col``. Same determinism machinery as
    :func:`spearman_corr`: ranks ×2 as exact bigints, one double
    division at the end — engine-identical including ties.

    ``label_col`` must be boolean (or a boolean SQL expression
    pre-computed by the caller). Rows with a NULL score OR NULL
    label are dropped BEFORE ranking — otherwise they would inflate
    the rank positions while escaping the P/N counts and silently
    corrupt the formula. A single-class frame (P = 0 or N = 0) has
    no defined AUC → NULL, not a divide-by-zero abort (ANSI mode).
    Returns one row: (n_pos, n_neg, auc). Scale: one distinct-score
    aggregate + cumulative sum bounded by score cardinality, one
    equi-join back, one global aggregate — no global row sort."""
    df = df.select(score_col, F.col(label_col).alias("__y")).filter(
        F.col(score_col).isNotNull() & F.col("__y").isNotNull()
    )
    j = df.join(_frac_ranks2(df, score_col, "__r2"), score_col)
    agg = j.agg(
        F.sum(F.when(F.col("__y"), F.col("__r2"))).alias("s_pos2"),
        F.count_if(F.col("__y")).alias("p"),
        F.count_if(~F.col("__y")).alias("n"),
    )
    auc = F.when(
        (F.col("p") > 0) & (F.col("n") > 0),
        (
            F.col("s_pos2").cast("double")
            - F.col("p").cast("double") * (F.col("p") + 1)
        )
        / (F.lit(2.0) * F.col("p") * F.col("n")),
    )
    return agg.select(
        F.col("p").alias("n_pos"), F.col("n").alias("n_neg"),
        auc.alias("auc"),
    )
