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


_SQDIST = (
    "aggregate(zip_with(qq, recon, (x, y) -> (x - y) * (x - y)),"
    " 0L, (acc, v) -> acc + v)"
)


def _sq8_recon(q: DataFrame, levels: int, id_col: str) -> DataFrame:
    """Shared SQ8 stats + encode + decode: per-dimension [min, max]
    over the quantized corpus ``q`` (one partial-aggregable pass, a
    dims-sized collect), then the code/reconstruction projection —
    the single definition both :func:`sq8_topk` and
    :func:`ivf_sq8_topk` score against."""
    stats = (
        q.select(F.posexplode("qe").alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("i")
        .collect()
    )
    mins = [int(r["mn"]) for r in stats]
    rngs = [max(1, int(r["mx"]) - int(r["mn"])) for r in stats]
    mins_sql = "array(" + ", ".join(f"{v}L" for v in mins) + ")"
    rngs_sql = "array(" + ", ".join(f"{v}L" for v in rngs) + ")"
    return q.withColumn(
        "recon",
        F.expr(
            f"transform(qe, (x, i) -> "
            f"element_at({mins_sql}, i + 1) + "
            f"(((x - element_at({mins_sql}, i + 1)) * {levels}) "
            f"div element_at({rngs_sql}, i + 1)) "
            f"* element_at({rngs_sql}, i + 1) div {levels})"
        ),
    ).select(F.col(id_col).alias("n_id"), "recon")


def sq8_topk(
    emb: DataFrame,
    query_ids: DataFrame | None = None,
    k: int = 5,
    levels: int = 255,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization (SQ8) compressed top-k — the third member
    of the compression family next to :func:`pq_topk` (codebooks) and
    :func:`ivfadc_topk` (routed codebooks): each DIMENSION is linearly
    quantized to an 8-bit code against per-dimension [min, max]
    corpus statistics (the FAISS ``SQ8`` shape), cutting vector
    memory 4× vs float32 with no training step at all. Queries stay
    full precision and score against the DECODED corpus
    (asymmetric distance), so the only quality loss is the per-dim
    rounding.

    Determinism contract: runs on the quantized integer grid
    (``quantize``); codes are ``((x - min) * levels) div range`` and
    reconstruction ``min + (code * range) div levels`` — both
    operands non-negative, so Spark's truncating ``div`` and
    DuckDB's flooring ``//`` agree and the oracle replays stats,
    encode, decode, and ranking bit-for-bit (distances are exact
    bigint sums).

    Scale shape: the stats pass is one partial-aggregable
    min/max (64 rows out); encode/decode are map-side projections —
    no shuffle; scoring is a broadcast-queries × corpus scan (one
    pass over the code table, the same shape a 100 TB scan wants);
    only the final per-query top-k window shuffles, on rows already
    reduced to |Q|·N pairs → |Q|·k. Returns (q_id, n_id, rank,
    sq_dist bigint), ascending distance, ties → lowest n_id."""
    q = quantize(emb, emb_col, "qe").select(id_col, "qe").persist()
    # at rest only the int8 codes would be stored; recon is
    # recomputed at scan time
    recon = _sq8_recon(q, levels, id_col)
    queries = q
    if query_ids is not None:
        qids = F.broadcast(query_ids.select(F.col(id_col).alias("__qid")))
        queries = q.join(qids, F.col(id_col) == F.col("__qid")).drop("__qid")
    queries = queries.select(F.col(id_col).alias("q_id"), F.col("qe").alias("qq"))
    scored = (
        recon.crossJoin(F.broadcast(queries))
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("sq_dist", F.expr(_SQDIST))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("sq_dist"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sq_dist")
    )


def ivf_sq8_topk(
    emb: DataFrame,
    query_ids: DataFrame | None = None,
    k: int = 5,
    levels: int = 255,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF × SQ8 — coarse routing over the scalar-quantized code
    table (the FAISS ``IVF…,SQ8`` index family): queries visit only
    their ``n_probe`` nearest inverted lists, and candidates are
    scored by the SQ8 asymmetric distance (full-precision query vs
    per-dimension-decoded candidate). Completes the compression ×
    routing matrix next to :func:`ivfadc_topk` (IVF × PQ):
    SQ8 trades PQ's higher compression for training-free indexing
    and finer distances, with the SAME partition-pruned list-probe
    plan at scale. Coarse assignment replays
    :func:`ivfadc_topk`'s argmin-sqdist trajectory, encoding
    replays :func:`sq8_topk`'s — the oracle shares both.

    Returns (q_id, n_id, rank, sq_dist bigint), ascending distance,
    ties → lowest neighbor id."""
    q = quantize(emb, emb_col, "qe").select(id_col, "qe").persist()
    qids = (
        F.broadcast(query_ids.select(F.col(id_col).alias("__qid")))
        if query_ids is not None
        else None
    )
    # ---- coarse quantizer (identical trajectory to ivfadc_topk) ----
    coarse = seed_centroids(q, n_lists, id_col)
    lists = _assign(q, coarse, id_col).select(
        F.col(id_col).alias("n_id"), F.col("cluster").alias("list")
    )
    queries = q
    if qids is not None:
        queries = q.join(qids, F.col(id_col) == F.col("__qid")).drop("__qid")
    qdist = (
        queries.crossJoin(F.broadcast(coarse))
        .withColumn(
            "dist",
            F.expr(
                "aggregate(zip_with(qe, cq, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            ),
        )
        .select(F.col(id_col).alias("q_id"), F.col("cluster").alias("list"), "dist")
    )
    wp = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("list"))
    probes = (
        qdist.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= n_probe)
        .select("q_id", "list")
    )
    # ---- SQ8 stats + decode (the SAME projection sq8_topk scores) --
    recon = _sq8_recon(q, levels, id_col)
    # ---- candidates: probed lists only; score SQ8 distance ----
    cands = (
        probes.join(lists, "list")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
    )
    qq = queries.select(F.col(id_col).alias("q_id"), F.col("qe").alias("qq"))
    scored = (
        cands.join(recon, "n_id")
        .join(F.broadcast(qq), "q_id")
        .withColumn("sq_dist", F.expr(_SQDIST))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("sq_dist"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "sq_dist")
    )


def ivfadc_topk(
    emb: DataFrame,
    query_ids: DataFrame | None = None,
    m: int = 4,
    k_codes: int = 16,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """IVF + ADC composition (the FAISS ``IVFADC`` shape, Jégou et
    al. §IV): a coarse quantizer routes each query to its ``n_probe``
    nearest inverted lists, and ONLY the vectors in those lists are
    scored — by summed per-subspace ADC lookups against the PQ codes,
    never the full vectors. :func:`pq_topk` solves memory (codes
    instead of vectors) but still scores every corpus row per query;
    this composition also bounds compute and I/O to
    n_probe/n_lists of the corpus, which is what makes compressed
    search viable at 100 TB (store the code table partitioned by
    list and the probe is partition-pruned like
    ``similarity.build_ivf_index``).

    Codebooks are GLOBAL (no per-list residual encoding): encoding
    replays :func:`pq_topk` exactly, so the oracle shares its
    training trajectory; the residual refinement is a quality knob on
    the same plan shape. Coarse assignment is argmin squared distance
    (tie → lowest list id) — the L2 world PQ distances live in.

    Returns (q_id, n_id, rank, adc_dist bigint), rank ascending by
    ADC distance, ties → lowest neighbor id."""
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
    # ---- coarse quantizer: route vectors and queries to lists ----
    coarse = seed_centroids(q, n_lists, id_col)
    lists = _assign(q, coarse, id_col).select(
        F.col(id_col).alias("n_id"), F.col("cluster").alias("list")
    )
    queries = q
    if qids is not None:
        queries = q.join(qids, F.col(id_col) == F.col("__qid")).drop("__qid")
    qdist = (
        queries.crossJoin(F.broadcast(coarse))
        .withColumn(
            "dist",
            F.expr(
                "aggregate(zip_with(qe, cq, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            ),
        )
        .select(F.col(id_col).alias("q_id"), F.col("cluster").alias("list"), "dist")
    )
    wp = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("list"))
    probes = (
        qdist.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") <= n_probe)
        .select("q_id", "list")
    )
    # candidate pairs: only vectors in the probed lists — the join
    # key is the small uniform list id, and at scale the code table
    # is stored partitioned by list so this is a pruned read
    cands = (
        probes.join(lists, "list")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
    )
    # ---- PQ training + encoding (identical trajectory to pq_topk) --
    enc_parts = []
    dt_parts = []
    for s in range(m):
        qs = q.select(
            id_col, F.expr(f"slice(qe, {s * sub + 1}, {sub})").alias("qe")
        ).persist()
        cents = _update(_assign(qs, seed_centroids(qs, k_codes, id_col), id_col))
        enc_parts.append(
            _assign(qs, cents, id_col).select(
                F.col(id_col).alias("n_id"),
                F.lit(s).alias("s"),
                F.col("cluster").alias("code"),
            )
        )
        queries_s = qs
        if qids is not None:
            queries_s = qs.join(qids, F.col(id_col) == F.col("__qid")).drop("__qid")
        dt_parts.append(
            queries_s.crossJoin(F.broadcast(cents))
            .withColumn(
                "dist",
                F.expr(
                    "aggregate(zip_with(qe, cq, (x, y) -> (x - y) * (x - y)),"
                    " 0L, (acc, v) -> acc + v)"
                ),
            )
            .select(
                F.col(id_col).alias("q_id"),
                F.lit(s).alias("s"),
                F.col("cluster").alias("code"),
                "dist",
            )
        )
    enc_all = enc_parts[0]
    for p in enc_parts[1:]:
        enc_all = enc_all.unionByName(p)
    dt_all = dt_parts[0]
    for p in dt_parts[1:]:
        dt_all = dt_all.unionByName(p)
    # ---- ADC over candidates only: (q,n) → m code rows → broadcast
    # lookup → partial-agg sum. pq_topk instead expands dt against
    # the FULL code table — correct, but O(|Q|·N·m); here the
    # expansion is O(|cands|·m).
    scored = (
        cands.join(enc_all, "n_id")
        .join(F.broadcast(dt_all), ["q_id", "s", "code"])
        .groupBy("q_id", "n_id")
        .agg(F.sum("dist").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "adc_dist")
    )
