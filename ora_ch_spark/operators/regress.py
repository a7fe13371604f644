"""One-pass closed-form linear regression (normal equations) — the
"train a quality classifier" stage of a training-data pipeline
(CCNet/LLaMA-style corpora fit small linear/logistic models over
hand-written text features to score documents).

Spark-first shape: the ONLY data pass is a single partial-aggregable
aggregation building the Gram matrix X'X and moment vector X'y — k²/2
+ k sums with map-side combine, no shuffle wider than the final
reduce, no per-row Python. The k×k solve happens on the driver
(k ≤ ~30; O(k³) microseconds — collect is metadata-bounded: one row).

Exactness contract: with INTEGRAL features the Gram sums accumulate in
``decimal(38,0)`` — exact at any scale, no float associativity — so
the fitted weights are bit-reproducible across partitionings and
engines. For k+1 ≤ 3 the solve uses an explicit Cramer expansion in
IEEE doubles (the same expression a differential SQL oracle can
spell); larger systems use Gaussian elimination with partial pivoting.

At 100 TB: the aggregation is one scan with tiny combine state
(k²/2 decimals); scoring (`score_linear`) is a projection — both
embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _det3(m: list[list[float]]) -> float:
    """3×3 determinant, FIXED expansion order — a SQL oracle spelling
    the same expression over the same doubles reproduces it bitwise."""
    a, b, c = m[0]
    d, e, f = m[1]
    g, h, i = m[2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _solve_cramer3(A: list[list[float]], rhs: list[float]) -> list[float]:
    det = _det3(A)
    out = []
    for j in range(3):
        M = [row[:] for row in A]
        for r in range(3):
            M[r][j] = rhs[r]
        out.append(_det3(M) / det)
    return out


def _solve_gauss(A: list[list[float]], rhs: list[float]) -> list[float]:
    n = len(A)
    M = [A[r][:] + [rhs[r]] for r in range(n)]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(M[r][col]))
        M[col], M[piv] = M[piv], M[col]
        p = M[col][col]
        for r in range(col + 1, n):
            f = M[r][col] / p
            for c in range(col, n + 1):
                M[r][c] -= f * M[col][c]
    w = [0.0] * n
    for r in range(n - 1, -1, -1):
        acc = M[r][n] - sum(M[r][c] * w[c] for c in range(r + 1, n))
        w[r] = acc / M[r][r]
    return w


def linear_fit_normal_eq(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    ridge: int = 1,
) -> dict:
    """Fit ``y ≈ w0 + Σ w_i · x_i`` in ONE aggregation pass.

    ``ridge`` (an INTEGER, added to every diagonal Gram entry
    including the bias — documented deviation from textbook ridge,
    chosen so the regularized matrix stays exactly integral) makes the
    system nonsingular even under collinear features.

    Returns ``{"n": int, "weights": [w0, w1, ...]}`` — weights in
    bias-first order. Reference parity note: the reference engine has
    no model-fitting surface; this is a north-star extension
    (SURVEY §6 pipeline set).
    """
    xs = ["__one"] + list(feature_cols)
    base = df.select(
        F.lit(1).alias("__one"),
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("long").alias("__y"),
    )

    def dsum(a: str, b: str, alias: str):
        return F.sum(
            (F.col(a).cast("decimal(19,0)")
             * F.col(b).cast("decimal(19,0)")).cast("decimal(38,0)")
        ).alias(alias)

    aggs = []
    for i in range(len(xs)):
        for j in range(i, len(xs)):
            aggs.append(dsum(xs[i], xs[j], f"g_{i}_{j}"))
        aggs.append(dsum(xs[i], "__y", f"r_{i}"))
    row = base.agg(*aggs).collect()[0]

    k = len(xs)
    n = int(row["g_0_0"])
    A = [[0.0] * k for _ in range(k)]
    rhs = [0.0] * k
    for i in range(k):
        for j in range(i, k):
            v = int(row[f"g_{i}_{j}"]) + (ridge if i == j else 0)
            A[i][j] = A[j][i] = float(v)
        rhs[i] = float(int(row[f"r_{i}"]))
    if k == 3:
        w = _solve_cramer3(A, rhs)
    else:
        w = _solve_gauss(A, rhs)
    return {"n": n, "weights": w}


def score_linear(
    df: DataFrame, feature_cols: list[str], weights: list[float],
    out_col: str = "score",
) -> DataFrame:
    """Apply a fitted model as a pure projection (bias-first
    weights) — whole-stage-codegen arithmetic, no UDF."""
    expr = F.lit(weights[0])
    for w, c in zip(weights[1:], feature_cols):
        expr = expr + F.lit(w) * F.col(c).cast("double")
    return df.withColumn(out_col, expr)
