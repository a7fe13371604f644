"""Full-text keyword search over the corpus: BM25 ranking through a
distributed inverted-index plan — the retrieval half of a
training-data curation stack (nearest-query mining, quality probes,
eval-set leakage checks all reduce to "score documents against a
small query set").

Determinism contract (cross-engine exactness, same spirit as
``similarity.py``): the classic BM25 idf is ``ln((N-df+0.5)/(df+0.5))``
— but ``ln`` is the one step whose last-ulp behavior differs between
libm implementations, so the differential oracle could flake. We use
the **rational idf** ``(N-df+0.5)/(df+0.5)`` (a strictly monotone
transform of the classic idf, always positive): every remaining
operation is IEEE +,-,*,/ on exact-integer-derived doubles, which is
bit-identical on every engine. Per-term contributions are rounded to
9 decimals and summed as DECIMAL (order-independent exact sum), so
multi-term scores don't depend on float addition order. The default
``k1=1.25``/``b=0.75`` are exact binary fractions, so every derived
constant (k1+1 = 2.25, 1-b = 0.25) is literal-parse-exact in any
engine — no last-ulp drift between a Python-computed double and a
SQL decimal literal.

Scale design:
- The query side is tiny and BROADCAST; corpus tokens are semi-joined
  against it *before* any aggregation, so tf/df stats are computed
  only for query terms — the full-vocabulary posting list is never
  materialized.
- Document length (dl) is one partial-agg pass over the token stream;
  corpus totals (N, Σdl) ride along as a broadcast single-row frame —
  no driver-side collect.
- The only non-broadcast shuffle is the tf⋈dl join on the doc key;
  the tf side is bounded by docs-containing-query-terms and AQE will
  usually broadcast it.
- Final top-k is a per-query window over the scored candidates
  (bounded), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.25,
    b: float = 0.75,
    topk: int = 10,
) -> DataFrame:
    """Score every document against each query (bag of terms) with
    rational-idf BM25; return the top ``topk`` docs per query as
    (query_id, doc_id, rank, score). Ties break on doc_id ascending.

    score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    with idf(t) = (N - df + 0.5) / (df + 0.5).
    """
    spark = docs.sparkSession
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        ["query_id", "term"],
    )
    toks = docs.repartition(par).select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    # corpus stats: per-doc length + (N, avgdl) as a broadcast scalar row
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    totals = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    # prune to query terms BEFORE aggregating — the full vocabulary
    # never reaches a shuffle
    qtoks = toks.join(F.broadcast(qterms.select("term").distinct()), "term")
    tf = qtoks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    contrib = (
        tf.join(dl, id_col)
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf",
            (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)),
        )
        .withColumn(
            "tfn",
            F.col("tf") * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .withColumn(
            "c", F.round(F.col("idf") * F.col("tfn"), 9).cast(DecimalType(28, 9))
        )
    )
    scored = (
        contrib.join(F.broadcast(qterms), "term")
        .groupBy("query_id", id_col)
        .agg(F.sum("c").alias("__s"))
        .withColumn("score", F.round(F.col("__s").cast("double"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", id_col, "rank", "score")
    )
