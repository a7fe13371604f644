"""Training-pair mining — turning a curated corpus into supervision
for retriever / embedding training (the standard contrastive setup:
anchor + positive + in-batch or mined negatives).

Positives come from the LSH-blocked near-duplicate pass
(``similarity.embedding_near_dup_pairs`` — banded buckets, candidates
verified by exact quantized cosine, never all-pairs). Negatives are
DETERMINISTIC pseudo-random draws: partner id = md5(anchor, draw) mod
(max_id + 1), joined against the corpus for existence — no RNG state,
so the mined dataset is reproducible run-to-run and replayable by the
DuckDB oracle, and no global index structure (dense-rank windows or
zipWithIndex) is needed at 100 TB: the draw is a projection and one
equi-join on the drawn id. Draws that miss (sparse id space), hit the
anchor itself, or collide with a true positive are dropped rather than
re-drawn — per-anchor negative counts are "up to k", deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ora_ch_spark.functions.hashes import md5_long
from ora_ch_spark.operators.similarity import embedding_near_dup_pairs


def retrieval_eval(
    run: DataFrame,
    truth: DataFrame,
    k: int,
    q_col: str = "q_id",
    d_col: str = "n_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval metrics of a ``run`` against a ``truth``
    ranking (both (query, doc, rank) frames — e.g. an ANN index vs
    the exact scan): recall@k, precision@k, and MRR@k (reciprocal
    rank of the first relevant hit, 0 when none). Division-only
    arithmetic over exact counts — engine-identical, so index
    quality is a GATED metric, not a vibe. One equi-join on
    (query, doc) + two small aggregates; no per-query collect."""
    r = run.filter(F.col(rank_col) <= k).select(
        F.col(q_col).alias("q"), F.col(d_col).alias("d"),
        F.col(rank_col).alias("rr"),
    )
    t = truth.filter(F.col(rank_col) <= k).select(
        F.col(q_col).alias("q"), F.col(d_col).alias("d")
    )
    sizes = t.groupBy("q").agg(F.count(F.lit(1)).alias("n_truth")).join(
        r.groupBy("q").agg(F.count(F.lit(1)).alias("n_run")), "q", "full_outer"
    )
    hits = r.join(t, ["q", "d"]).groupBy("q").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("rr").alias("first_hit"),
    )
    out = sizes.join(hits, "q", "left")
    z = F.coalesce(F.col("n_hits"), F.lit(0))
    # denominators stay NULL when a side lacks the query entirely
    # (run-only / truth-only) — coalescing to 0 would be a
    # DIVIDE_BY_ZERO abort under ANSI mode, and NULL is the honest
    # value for an undefined ratio
    return out.select(
        F.col("q").alias(q_col),
        z.alias("n_hits"),
        (z / F.col("n_truth")).alias("recall_at_k"),
        (z / F.col("n_run")).alias("precision_at_k"),
        F.coalesce(
            F.lit(1.0) / F.col("first_hit"), F.lit(0.0)
        ).alias("mrr_at_k"),
    )


def mine_contrastive_pairs(
    emb: DataFrame,
    threshold: float = 0.45,
    k_neg: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 4,
) -> DataFrame:
    """(id_a, id_b, label) rows: label 1 = near-duplicate positive
    (cosine ≥ threshold, id_a < id_b), label 0 = mined negative
    (id_a = anchor, id_b = deterministic draw). Every corpus id is an
    anchor for negatives — anchors without any positive still yield
    training pairs."""
    # persist (lazy) on pos only — r6 verdict item 4. The r6 eager
    # localCheckpoint cost 3.1×: a checkpoint bypasses Spark's
    # CacheManager, so repeated invocations (bench's warm second
    # pass, a session re-running the miner) re-pay the full LSH job
    # every call, while persist dedupes by canonicalized plan and
    # reuses the blocks. Lifetime follows the engine convention
    # (``cluster.kmeans_assign`` docstring): operators persist
    # internally, the session owner clears between workloads —
    # bench.py/test_parity call ``spark.catalog.clearCache()`` per
    # entry, so nothing leaks across measurements. ids is a bare
    # column projection; recomputing that scan is cheaper than
    # caching it (the r5 double-checkpoint is what regressed).
    pos = embedding_near_dup_pairs(
        emb,
        id_col=id_col,
        emb_col=emb_col,
        threshold=threshold,
        use_lsh_blocking=True,
        n_planes=n_planes,
        n_tables=n_tables,
    ).select("id_a", "id_b").persist()
    ids = emb.select(F.col(id_col).alias("id"))
    # one small driver action for the id span: a column-pruned max
    # over the id column (an in-plan scalar would need a 1-row
    # broadcast nested-loop join, which the no-product plan test
    # rightly rejects)
    max_id = ids.agg(F.max("id")).first()[0]
    if max_id is None:
        raise ValueError("empty embedding frame")
    span = int(max_id) + 1
    draws = ids.select(
        F.col("id").alias("id_a"),
        F.explode(
            F.array(*[F.lit(i) for i in range(1, k_neg + 1)])
        ).alias("__i"),
    ).select(
        "id_a",
        (
            md5_long(
                F.concat_ws(
                    ":", F.lit("neg"), F.col("id_a").cast("string"),
                    F.col("__i").cast("string"),
                )
            )
            % span
        ).alias("id_b"),
    )
    neg = (
        draws.filter(F.col("id_a") != F.col("id_b"))
        # existence: the drawn id must be a real corpus id
        .join(ids.select(F.col("id").alias("id_b")), "id_b", "left_semi")
        # never contradict a true positive (either orientation)
        .withColumn("__lo", F.least("id_a", "id_b"))
        .withColumn("__hi", F.greatest("id_a", "id_b"))
        .join(
            pos.select(
                F.col("id_a").alias("__lo"), F.col("id_b").alias("__hi")
            ),
            ["__lo", "__hi"],
            "left_anti",
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return pos.withColumn("label", F.lit(1)).unionByName(
        neg.withColumn("label", F.lit(0))
    )
