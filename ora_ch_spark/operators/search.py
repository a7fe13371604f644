"""Full-text keyword search over the corpus: BM25 ranking through a
distributed inverted-index plan — the retrieval half of a
training-data curation stack (nearest-query mining, quality probes,
eval-set leakage checks all reduce to "score documents against a
small query set").

Determinism contract (cross-engine exactness, same spirit as
``similarity.py``): the classic BM25 idf is ``ln((N-df+0.5)/(df+0.5))``
— but ``ln`` is the one step whose last-ulp behavior differs between
libm implementations, so the differential oracle could flake. The
default here is the **rational idf** ``(N-df+0.5)/(df+0.5)``: every
remaining operation is IEEE +,-,*,/ on exact-integer-derived doubles,
bit-identical on every engine. NOTE the honest trade-off: per-term
this is a monotone transform of the classic idf, but summed over a
multi-term query it is NOT rank-equivalent to BM25 — rare terms weigh
polynomially rather than logarithmically more than common ones (a
retrieval-quality choice, deliberately exchanged for an exact
differential oracle). Production retrieval that wants the classic
weighting passes ``idf_log=True`` (same plan, ln idf) and forgoes the
exact cross-engine hash. Per-term contributions are rounded to 9
decimals and summed as DECIMAL (order-independent exact sum), so
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

from ora_ch_spark.io import local_df


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.25,
    b: float = 0.75,
    topk: int = 10,
    idf_log: bool = False,
) -> DataFrame:
    """Score every document against each query (bag of terms) with
    BM25-style ranking; return the top ``topk`` docs per query as
    (query_id, doc_id, rank, score). Ties break on doc_id ascending.

    score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))
    with idf(t) = (N - df + 0.5) / (df + 0.5) by default (rational —
    engine-exact, see module docstring for the rank trade-off), or the
    classic ln of that ratio when ``idf_log=True``.

    ``queries`` ids are INT-ONLY: the query-term relation is built
    with a pinned ``query_id bigint`` schema (one-slice local
    relation), so string ids fail at construction — callers with
    non-int ids must map them to ints first (r14 advice note).
    """
    spark = docs.sparkSession
    par = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # one-slice local relation: the query-term list is a handful of
    # rows; defaultParallelism slicing costs 32 near-empty Python
    # tasks every time the join re-evaluates it
    qterms = local_df(
        spark,
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id bigint, term string",
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
            "__ridf",
            (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)),
        )
        .withColumn("idf", F.log("__ridf") if idf_log else F.col("__ridf"))
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


def tfidf_top_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    topk: int = 5,
) -> DataFrame:
    """Characteristic-term extraction: top-k terms per document group
    (e.g. per source/domain) by tf-idf, where each GROUP plays the
    "document" role: tf = term count within the group, idf = the
    rational (n_groups + 1)/(df_groups + 1) — integer-derived, so the
    score is a single exact double division (no ln, engine-exact).
    Ties break on term ascending.

    Scale: one partial-agg shuffle on (group, term); group counts are
    a broadcast scalar frame; df-per-term is a second partial agg of
    the first's output (already term-keyed — reuses the shuffle
    partitioning); final top-k is a window over group cardinality.
    """
    par = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = docs.repartition(par).select(
        F.col(group_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    tf = toks.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # countDistinct (NOT distinct().count()) so a NULL group is
    # excluded exactly as SQL's count(DISTINCT ...) excludes it — the
    # differential oracle and any downstream SQL consumer agree
    n_groups = docs.agg(F.countDistinct(F.col(group_col)).alias("n_groups"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * (F.col("n_groups") + F.lit(1)).cast("double")
            / (F.col("df") + F.lit(1)).cast("double"),
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(group_col, "rank", "term", "tf", "df", "tfidf")
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score — the
    perplexity-style quality signal, made engine-exact by staying
    log-free: each bigram (w1, w2) in a document contributes the
    corpus-wide conditional probability P(w2 | w1) =
    count(w1 w2) / count(w1 ·), and the document's score is the MEAN
    contribution, computed as an exact DECIMAL sum of 9-dp-rounded
    probabilities divided by the bigram count. Low mean ⇒ improbable
    word transitions ⇒ disfluent/garbled text. Docs with fewer than
    one bigram score NULL.

    Scale: bigram/prefix counts are two partial-agg shuffles over the
    exploded bigram stream; per-doc scoring joins each document bigram
    against the (term-keyed) count tables — the LM "model" never
    leaves the cluster, and nothing is collected to the driver.
    """
    from pyspark.sql.types import DecimalType

    par = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = docs.repartition(par).select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("t")
    )
    # the size >= 2 guard matters: Spark's sequence(1, 0) is DESCENDING
    # ([1, 0]), so an unguarded single-token doc would emit two bogus
    # null-padded bigrams instead of zero
    bigrams = (
        toks.filter(F.expr("size(t) >= 2"))
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] as w1, t[i] as w2))"
                )
            ).alias("bg"),
        )
        .select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    pair_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    prefix_counts = pair_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    probs = pair_counts.join(prefix_counts, "w1").withColumn(
        "p",
        F.round(F.col("c12").cast("double") / F.col("c1").cast("double"), 9).cast(
            DecimalType(28, 9)
        ),
    )
    scored = (
        bigrams.join(probs.select("w1", "w2", "p"), ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("p").alias("__sp"))
        .withColumn(
            "lm_score",
            F.round(
                F.col("__sp").cast("double") / F.col("n_bigrams").cast("double"), 6
            ),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("bigint")).alias("n_bigrams"),
            "lm_score",
        )
    )
