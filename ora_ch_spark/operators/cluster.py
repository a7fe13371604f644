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


def _assign(
    q: DataFrame, cents: DataFrame, id_col: str, impl: str = "pandas"
) -> DataFrame:
    """Nearest-centroid assignment (argmin squared distance, tie →
    lowest cluster id). Same dual form as
    ``similarity._argmax_centroid`` (bit-equality asserted by tests):

    - ``pandas`` (default): Arrow-batched numpy — d² expands to
      |m|² + |c|² − 2·m·c with ONE int64 matmul per batch against the
      driver-collected centroid matrix (k×dims ints). All-integer →
      exact; argmin first-min = lowest cluster. No shuffle.
    - ``jvm``: the corpus×centroids product through interpreted
      higher-order functions + a struct-min agg — correct everywhere
      numpy isn't, but the product cost dominates at scale (see
      PLANS.md scale-stress table for the IVF twin of this plan).
    """
    if impl == "pandas":
        import numpy as np
        import pandas as pdl

        crows = sorted(cents.collect(), key=lambda r: r["cluster"])
        c_ids = np.array([r["cluster"] for r in crows], dtype=np.int64)
        C = np.array([r["cq"] for r in crows], dtype=np.int64)
        c_sq = (C * C).sum(axis=1)

        def batches(it):
            for pdf in it:
                M = np.array(pdf["qe"].tolist(), dtype=np.int64)
                d = (M * M).sum(axis=1)[:, None] + c_sq[None, :] - 2 * (M @ C.T)
                best = d.argmin(axis=1)  # first min = lowest cluster
                yield pdl.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "cluster": c_ids[best],
                        "dist": d[np.arange(len(best)), best],
                        "qe": pdf["qe"],
                    }
                )

        # id type from the frame; qe echoes through the batch — no
        # corpus join-back (see similarity._argmax_centroid)
        id_type = dict(q.dtypes)[id_col]
        return q.select(id_col, "qe").mapInPandas(
            batches,
            schema=f"{id_col} {id_type}, cluster bigint, dist bigint, "
                   f"qe array<bigint>",
        ).withColumn("cluster", F.col("cluster").cast("int"))
    return (
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


def _update(assigned: DataFrame) -> DataFrame:
    sums = (
        assigned.select("cluster", F.posexplode("qe").alias("i", "v"))
        .groupBy("cluster", "i")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "cv", F.floor(F.col("s").cast("double") / F.col("n")).cast("bigint")
        )
    )
    return sums.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cv"))),
            lambda s: s["cv"],
        ).alias("cq")
    )


def seed_centroids(q: DataFrame, k: int, id_col: str) -> DataFrame:
    """Deterministic seeding shared by k-means and PQ training (the
    rule every trajectory-replay oracle encodes): the k lowest-id
    vectors become clusters 0..k-1."""
    w = Window.orderBy(id_col)
    return (
        q.orderBy(id_col)
        .limit(k)
        .withColumn("cluster", (F.row_number().over(w) - 1).cast("int"))
        .select("cluster", F.col("qe").alias("cq"))
    )


def _fit(
    emb: DataFrame, k: int, iters: int, id_col: str, emb_col: str,
    par: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(persisted quantized corpus, centroids after iters-1 Lloyd
    updates) — the centroids the final assignment runs against."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # ``par`` (guide §2, scale-adaptive width): callers that KNOW the
    # corpus is small (e.g. the IVF drift guard, which has manifest
    # row counts for free) pass a bounded width so a few-hundred-row
    # retrain stops paying iters × conf-width near-empty Python tasks;
    # default stays the conf value — correct for real corpora, where
    # the assign matmul wants the full pool. Result-invariant either
    # way: assignment is per-row, updates are exact integer sums.
    if par is None:  # 0 is not a valid width — None is the contract
        par = int(emb.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    q = quantize(emb.repartition(par), emb_col, "qe").select(id_col, "qe").persist()
    cents = seed_centroids(q, k, id_col)
    for _ in range(iters - 1):
        cents = _update(_assign(q, cents, id_col))
    return q, cents


def kmeans_centroids(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    par: int | None = None,
) -> DataFrame:
    """The trained (integer-grid) centroids: (cluster int, cq
    array<bigint>) after ``iters-1`` Lloyd updates — the coarse
    quantizer an IVF index plugs in as its seed set."""
    _, cents = _fit(emb, k, iters, id_col, emb_col, par=par)
    return cents


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
    q, cents = _fit(emb, k, iters, id_col, emb_col)
    return _assign(q, cents, id_col).select(id_col, "cluster", "dist")


def semdedup(
    emb: DataFrame,
    threshold: float = 0.45,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Semantic deduplication (the SemDeDup recipe: cluster the
    embedding space, then drop near-duplicates *within* each cluster):
    k-means partitions the corpus, every within-cluster pair with
    quantized cosine ≥ ``threshold`` marks the higher id as a
    duplicate of its lowest-id witness. Returns the dropped rows:
    (id, cluster, witness_id, cosine-to-witness).

    Compared to :func:`similarity.embedding_near_dup_pairs` (banded
    sign-LSH blocking), the k-means blocking trades recall at cluster
    boundaries for *centroid-aware* blocks — the published SemDeDup
    observation is that semantic duplicates concentrate inside
    clusters, so intra-cluster search finds them at a fraction of the
    candidate volume.

    Scale: the pair join is quadratic in cluster size, so ``k`` is the
    blocking knob — size it so N/k stays bounded (100 TB posture:
    k ~ N/5000 keeps every block under the same ~10k-doc bound the
    n-gram dedup routes on; oversized clusters can additionally be
    rerouted through banded LSH exactly like ``ngram_jaccard_dedup``
    does for hot blocks). Candidate generation is one shuffle on the
    cluster id; cosines are JVM integer folds via ``with_cosine``.
    """
    from ora_ch_spark.operators.similarity import with_cosine

    q, cents = _fit(emb, k, iters, id_col, emb_col)
    assigned = _assign(q, cents, id_col).select(id_col, "cluster", "qe").persist()
    a = assigned.select(
        F.col(id_col).alias("__id_a"), "cluster", F.col("qe").alias("qa")
    )
    b = assigned.select(
        F.col(id_col).alias("__id_b"), "cluster", F.col("qe").alias("qb")
    )
    pairs = a.join(b, "cluster").filter(F.col("__id_a") < F.col("__id_b"))
    hits = with_cosine(pairs).filter(F.col("cosine") >= threshold)
    return (
        hits.groupBy(F.col("__id_b").alias(id_col), "cluster")
        .agg(F.min(F.struct("__id_a", "cosine")).alias("__w"))
        .select(
            id_col,
            "cluster",
            F.col("__w.__id_a").alias("witness_id"),
            F.col("__w.cosine").alias("cosine"),
        )
    )


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
