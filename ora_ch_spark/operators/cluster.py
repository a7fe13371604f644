"""K-means clustering over the embedding column — the workhorse for
corpus partitioning (domain discovery, diversity-balanced sampling,
IVF coarse quantizers). Implemented as Lloyd's algorithm on the
DataFrame API: broadcast centroids, one shuffle per iteration.

Determinism contract (same as ``similarity.py``): embeddings are
quantized to integers (``floor(x·10⁴)``), so squared distances are
**exact bigint sums** — order-independent, engine-identical.
Centroid updates quantize back to the integer grid
(``floor(mean)`` — the mean is an exact-input double division, and
``floor`` is engine-exact), so every iteration's arithmetic stays in
integers and the DuckDB oracle replays the whole trajectory
bit-for-bit. Assignment ties break on lowest cluster id; empty
clusters simply drop out (both engines replay the same rule).

Scale design:
- Centroids are k×dims integers — broadcast; the assign step is a
  broadcast nested-loop over k per row, no corpus shuffle.
- The update step explodes vectors to (cluster, dim, value) and
  partial-aggregates — the standard elementwise-mean plan; the
  shuffle is k·dims groups regardless of corpus size.
- Per-iteration ``persist`` on the assignment keeps Catalyst from
  recomputing the quantization + assign chain inside the update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ora_ch_spark.operators.similarity import quantize


def _sqdist(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations (assign against current
    centroids; all but the last iteration recompute centroids) and
    return the final assignment: (id, cluster int, dist bigint).

    Init: the k lowest-id vectors seed clusters 0..k-1 (seed-free
    deterministic — same convention as IVF's seed pick).

    Persist contract: ``q`` (the quantized corpus) is referenced by
    every iteration's assign AND join-back, so it persists and stays
    cached through the caller's action (engine convention: operators
    persist internally, the session owner clears between workloads —
    an eager unpersist before the action would silently disable the
    cache and recompute the quantization ~2·iters times)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    par = int(emb.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    q = quantize(emb.repartition(par), emb_col, "qe").select(id_col, "qe").persist()
    w = Window.orderBy(id_col)
    cents = (
        q.orderBy(id_col)
        .limit(k)
        .withColumn("cluster", (F.row_number().over(w) - 1).cast("int"))
        .select("cluster", F.col("qe").alias("cq"))
    )
    assigned = None
    for it in range(iters):
        assigned = (
            q.crossJoin(F.broadcast(cents))
            .withColumn("dist", _sqdist("qe", "cq"))
            .groupBy(id_col)
            .agg(F.min(F.struct("dist", "cluster")).alias("__best"))
            .join(q, id_col)
            .select(
                id_col,
                F.col("__best.cluster").alias("cluster"),
                F.col("__best.dist").alias("dist"),
                "qe",
            )
        )
        if it < iters - 1:
            sums = (
                assigned.select("cluster", F.posexplode("qe").alias("i", "v"))
                .groupBy("cluster", "i")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .withColumn(
                    "cv",
                    F.floor(F.col("s").cast("double") / F.col("n")).cast("bigint"),
                )
            )
            cents = sums.groupBy("cluster").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cv"))),
                    lambda s: s["cv"],
                ).alias("cq")
            )
    return assigned.select(id_col, "cluster", "dist")


def diversity_sample(
    emb: DataFrame,
    per_cluster: int = 10,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    salt: str = "div",
) -> DataFrame:
    """Cluster-balanced (diversity) sampling: k-means partitions the
    embedding space, then a deterministic md5-rank reservoir keeps
    exactly ``per_cluster`` members of each cluster — the standard
    recipe for a diverse subset that plain uniform sampling (which
    mirrors the corpus's density skew) does not give. Composition of
    :func:`kmeans_assign` + the fixed-per-group selection rule, so it
    inherits both scale arguments (broadcast centroids; one window
    shuffle on the cluster key)."""
    from ora_ch_spark.operators.sampling import sample_fixed_per_group

    assigned = kmeans_assign(emb, k=k, iters=iters, id_col=id_col, emb_col=emb_col)
    return sample_fixed_per_group(
        assigned, n=per_cluster, group_col="cluster", id_col=id_col, salt=salt
    )
