"""Product quantization (PQ) — the memory half of the standard
IVF+PQ ANN stack (Jégou et al., "Product Quantization for Nearest
Neighbor Search"): split each vector into ``m`` subspaces, k-means
each subspace independently, store every vector as ``m`` small codes
(here 4 × 4-bit-ish codes instead of 64 floats — the compression
that makes billion-vector indexes fit in memory at 100 TB), and
answer queries with Asymmetric Distance Computation (ADC): the query
stays full-precision, each subspace contributes a looked-up distance
from a tiny per-query table, and the candidate distance is the sum.

Determinism contract (same family as ``cluster.py``): training runs
on the quantized integer grid with the identical Lloyd trajectory
(init = first k ids' subvectors, one update, floor-of-mean
centroids, lowest-code ties), so the DuckDB oracle replays training,
encoding, AND the ADC ranking bit-for-bit; all distances are exact
bigint sums.

Scale shape: per-subspace training reuses the BLAS nearest-centroid
assignment (no shuffle); encoding is the same narrow map; the ADC
scoring joins the (N × m)-row code table against a BROADCAST
per-query distance table (m × k rows per query) and partial-agg sums
— the corpus is never crossed with queries at full dimensionality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ora_ch_spark.operators.cluster import _assign, _update, seed_centroids
from ora_ch_spark.operators.similarity import quantize


def pq_topk(
    emb: DataFrame,
    query_ids: DataFrame | None = None,
    m: int = 4,
    k_codes: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """PQ-compressed approximate top-k by ADC distance (ascending,
    ties → lowest neighbor id). Returns (q_id, n_id, rank, adc_dist
    bigint). Dimensionality is DERIVED from the data — trusting a
    parameter would let a mismatched corpus train half-empty
    subspaces and rank on a truncated vector without any error."""
    first = emb.select(F.size(emb_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding frame")
    dims = first["d"]
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m {m}")
    sub = dims // m
    q = quantize(emb, emb_col, "qe").select(id_col, "qe").persist()
    qids = (
        F.broadcast(query_ids.select(F.col(id_col).alias("__qid")))
        if query_ids is not None
        else None
    )
    parts = []
    for s in range(m):
        qs = q.select(
            id_col, F.expr(f"slice(qe, {s * sub + 1}, {sub})").alias("qe")
        ).persist()
        cents = _update(_assign(qs, seed_centroids(qs, k_codes, id_col), id_col))
        enc = _assign(qs, cents, id_col).select(
            F.col(id_col).alias("n_id"), F.col("cluster").alias("code")
        )
        queries_s = qs
        if qids is not None:
            queries_s = qs.join(qids, F.col(id_col) == F.col("__qid")).drop("__qid")
        dt = (
            queries_s.crossJoin(F.broadcast(cents))
            .withColumn(
                "dist",
                F.expr(
                    "aggregate(zip_with(qe, cq, (x, y) -> (x - y) * (x - y)),"
                    " 0L, (acc, v) -> acc + v)"
                ),
            )
            .select(F.col(id_col).alias("q_id"), F.col("cluster").alias("code"), "dist")
        )
        parts.append(enc.join(F.broadcast(dt), "code").select("q_id", "n_id", "dist"))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    adc = (
        allp.filter(F.col("q_id") != F.col("n_id"))
        .groupBy("q_id", "n_id")
        .agg(F.sum("dist").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "adc_dist")
    )
