"""Composite training-data cleaning pipeline — the operators composed
the way a real corpus-prep job chains them:

    documents
      → language ID            (keep target language)
      → quality filter         (score ≥ threshold)
      → exact dedup            (survivor = min doc_id per digest)
      → MinHash near-dedup     (drop the higher id of each pair)
      → corpus stats           (per source: docs, tokens, quality)

Every stage is one of the individually differential-tested operators
(text.lang_id, text.quality_score, dedup.exact_dedup_groups,
dedup.minhash_lsh_dedup); the composition stays one lazy DataFrame
plan end-to-end — Catalyst fuses the filters, and only the dedup
stages shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ora_ch_spark.operators.dedup import exact_dedup_groups, minhash_lsh_dedup


def _fused_lang_quality(docs: DataFrame) -> DataFrame:
    """lang_id + quality_score as ONE narrow row-wise projection (r15,
    guide §2.4 — remove shuffles outright): every number here is a
    per-document function of the token array, so the previous
    explode → lexicon-join → two groupBys → rank-window plan (three
    exchanges plus a persisted token table per call) is computable
    with higher-order functions at the scan, zero shuffles. Exact
    value parity with the exploded form (and the standalone
    operators) by construction:

    - hit counts per candidate language = size(filter(toks, in
      lexicon)) — occurrences, like the join+count;
    - argmax with ties to the LOWEST cand_lang = array_min over
      (-hits, lang) structs; zero total hits → 'und' (the exploded
      form produced no hit rows → left-join null → 'und');
    - docs with NULL text vanish entirely (split→NULL → the old
      explode emitted no rows and the inner agg join dropped the
      doc) — replicated with an explicit filter;
    - n_tokens/n_stop/sum_tok_len are the same exact integers, and
      the score expression is unchanged double arithmetic."""
    from ora_ch_spark.operators.text import LANG_LEXICON, STOPWORDS_EN

    toks = F.split(F.lower(F.col("text")), " ")
    t = docs.select("doc_id", toks.alias("__toks")).filter(
        F.col("__toks").isNotNull()
    )
    lang_structs = [
        F.struct(
            (-F.size(F.filter(F.col("__toks"), lambda x: x.isin(*words))))
            .cast("bigint")
            .alias("nh"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_LEXICON.items())
    ]
    best = F.array_min(F.array(*lang_structs))
    predicted = F.when(best["nh"] == 0, F.lit("und")).otherwise(best["lang"])
    n_tokens = F.size("__toks").cast("bigint")
    n_stop = F.size(
        F.filter(F.col("__toks"), lambda x: x.isin(*STOPWORDS_EN))
    ).cast("bigint")
    sum_tok_len = F.aggregate(
        "__toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    score = (
        F.lit(0.4) * (n_stop.cast("double") / n_tokens.cast("double"))
        + F.lit(0.3)
        * F.least(
            sum_tok_len.cast("double") / n_tokens.cast("double") / F.lit(10.0),
            F.lit(1.0),
        )
        + F.lit(0.3) * F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    )
    return t.select(
        "doc_id",
        predicted.alias("predicted_lang"),
        score.alias("quality_score"),
    )


def clean_corpus(
    docs: DataFrame,
    keep_lang: str = "en",
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """Returns the cleaned corpus (doc rows that survive all stages)."""
    lq = _fused_lang_quality(docs)
    # persist the filtered corpus: it feeds three downstream consumers
    # (exact-dedup digest scan, the survivor join, and the MinHash
    # shingle build) — without it Catalyst re-runs the lang/quality
    # window + aggregations once per consumer
    kept = (
        docs.join(lq, "doc_id")
        .filter(
            (F.col("predicted_lang") == keep_lang)
            & (F.col("quality_score") >= min_quality)
        )
        .persist()
    )
    # exact dedup: survivor = min doc_id per content digest
    survivors = exact_dedup_groups(kept).select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(survivors, "doc_id").persist()
    # near-dedup: drop the HIGHER id of every verified near-dup pair
    # (pairs computed on the post-filter corpus). Policy note: on
    # chains a–b, b–c this drops both b and c (conservative — more
    # dropped than one-survivor-per-cluster); use
    # dedup.connected_components(pairs) for exact cluster survivors.
    pairs = minhash_lsh_dedup(kept, threshold=near_dup_threshold)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return kept.join(drop, "doc_id", "left_anti")


def corpus_stats(cleaned: DataFrame) -> DataFrame:
    """Per-source stats of the cleaned corpus."""
    toks = F.split(F.lower(F.col("text")), " ")
    return (
        cleaned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(toks)).alias("n_tokens"),
            F.sum("n_chars").alias("n_chars_total"),
        )
    )


def clean_corpus_stats(docs: DataFrame, **kwargs) -> DataFrame:
    return corpus_stats(clean_corpus(docs, **kwargs))


def curate_corpus(
    docs: DataFrame,
    tokens_per_line: int = 4,
    min_docs: int = 5,
    p: float = 0.5,
) -> DataFrame:
    """Round-4 curation composite — the NEW operators chained the way
    a corpus-prep job runs them:

        documents
          → boilerplate-line removal   (lines shared by ≥ min_docs docs)
          → quality re-score           (over the CLEANED text)
          → per-lang median cut        (discrete p-quantile threshold)
          → exact dedup                (survivor = min doc_id per digest)
          → per-lang funnel summary    (n_docs, n_quality, n_final)

    Scoring happens AFTER cleaning on purpose: boilerplate inflates
    quality features (length, stopword hits), so filtering on pre-clean
    scores keeps exactly the documents cleaning hollowed out. One lazy
    plan; the scored projection persists once for the
    threshold/filter/dedup consumers."""
    from pyspark.sql import Window

    from ora_ch_spark.operators.lines import chunk_lines, strip_boilerplate
    from ora_ch_spark.operators.text import quality_score

    lines = chunk_lines(docs, tokens_per_line=tokens_per_line)
    cleaned = strip_boilerplate(
        lines, min_docs=min_docs, include_text=True
    ).join(docs.select("doc_id", "lang"), "doc_id")
    scored = quality_score(
        cleaned, text_col="kept_text", carry_cols=("lang", "kept_md5")
    ).select("doc_id", "lang", "kept_md5", "quality_score").persist()
    sizes = scored.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("lang").orderBy(
        F.asc("quality_score"), F.asc("doc_id")
    )
    thr = (
        scored.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(sizes), "lang")
        .filter(
            F.col("__rn").cast("bigint")
            == F.ceil(F.lit(p) * F.col("n_docs")).cast("bigint")
        )
        .select("lang", F.col("quality_score").alias("__thr"))
    )
    kept_q = scored.join(F.broadcast(thr), "lang").filter(
        F.col("quality_score") >= F.col("__thr")
    )
    winners = kept_q.groupBy("kept_md5").agg(
        F.min(F.struct("doc_id", "lang")).alias("__w")
    )
    n_final = winners.groupBy(F.col("__w.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_final")
    )
    n_quality = kept_q.groupBy("lang").agg(F.count(F.lit(1)).alias("n_quality"))
    return (
        sizes.join(n_quality, "lang")
        .join(n_final, "lang")
        .select("lang", "n_docs", "n_quality", "n_final")
    )


def assemble_corpus(
    docs: DataFrame,
    weights: dict[str, int],
    budget: int = 256,
    shards: int = 4,
) -> DataFrame:
    """Training-corpus ASSEMBLY composite — the selection/packing back
    half of the prep funnel (curate_corpus is the cleaning front
    half):

        documents
          → exact dedup         (survivor = min doc_id per digest)
          → mixture_sample      (largest subsample at target lang weights)
          → pack_sequences      (concat-and-chunk manifest)
          → per-(lang, shard) rollup: docs, tokens, packed-seq slots

    One lazy plan: the dedup winner set joins back broadcast-sized,
    the mixture's md5-rank window shuffles on lang, the packer on its
    shard key — no stage rereads the corpus. ``seq_slots`` sums each
    doc's [start_seq, end_seq] span width — the loader-visible cost of
    the shard's packed batches."""
    from ora_ch_spark.operators.sampling import mixture_sample, pack_sequences

    winners = exact_dedup_groups(docs).select(F.col("keep_id").alias("doc_id"))
    kept = docs.join(winners, "doc_id")
    mixed = mixture_sample(kept, weights, group_col="lang").persist()
    packed = pack_sequences(mixed, budget=budget, shards=shards)
    return (
        packed.join(mixed.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.col("end_seq") - F.col("start_seq") + 1).alias("seq_slots"),
        )
    )


def rag_chunk_topk(
    docs: DataFrame,
    chunk_chars: int = 240,
    overlap: int = 40,
    dims: int = 8,
    n_lists: int = 16,
    n_probe: int = 2,
    k: int = 5,
    query_pred: str = "doc_id < 3",
) -> DataFrame:
    """End-to-end RAG indexing composite: chunk the corpus, embed
    each chunk, route queries through an IVF index, return exact
    cosine top-k chunk neighbors per query chunk — the
    chunk→embed→index→retrieve shape a retrieval corpus build runs at
    scale, as ONE declarative plan.

    The embedder is a deterministic md5 feature hasher (``dims``
    16-bit integer lanes from the chunk digest, centered at zero) —
    the stand-in for a model encoder this container can't ship; it
    is cross-engine replayable, so the DuckDB oracle re-runs the
    ENTIRE pipeline including index routing, and swapping in a real
    encoder changes one projection, not the plan. Routing mirrors
    :func:`similarity.ivf_topk` (broadcast seed centroids, argmax
    cosine tie→lowest list, ``n_probe`` lists per query, narrow
    candidate projection before the rank window); chunk key is
    ``doc_id·1000 + chunk_id``.

    Scale: chunking is a narrow explode; embedding is per-row JVM
    (md5 + conv — no Python); the index join shuffles on the small
    uniform list id. At 100 TB the chunk/embedding table persists via
    ``similarity.build_ivf_index`` (list-clustered files) and query
    batches reuse it — this composite IS that plan, inlined."""
    from pyspark.sql import Window
    from ora_ch_spark.operators.similarity import with_cosine
    from ora_ch_spark.operators.text import chunk_documents

    # chunk key: doc_id·10⁶ + chunk_id — collision-free up to a
    # million chunks per doc (~200 MB of text at the default stride;
    # anything bigger should be split upstream)
    chunks = chunk_documents(docs, chunk_chars, overlap).select(
        (F.col("doc_id") * 1_000_000 + F.col("chunk_id")).alias("cid"),
        "doc_id",
        "chunk_text",
    )
    lanes = [
        (
            F.conv(F.substring(F.md5("chunk_text"), i * 4 + 1, 4), 16, 10)
            .cast("bigint")
            - F.lit(32768)
        )
        for i in range(dims)
    ]
    emb = chunks.select("cid", "doc_id", F.array(*lanes).alias("qe")).persist()
    seeds = F.broadcast(
        emb.orderBy("cid")
        .limit(n_lists)
        .select(
            (F.row_number().over(Window.orderBy("cid")) - 1).alias("c_id"),
            F.col("qe").alias("qc"),
        )
    )
    assign = with_cosine(
        emb.select("cid", "qe").crossJoin(seeds), qa="qe", qb="qc"
    ).select("cid", "c_id", "cosine")
    wa = Window.partitionBy("cid").orderBy(F.desc("cosine"), F.asc("c_id"))
    lists = (
        assign.withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") == 1)
        .select(F.col("cid").alias("n_id"), F.col("c_id").alias("centroid"))
    )
    queries = emb.filter(query_pred).select(
        F.col("cid").alias("q_id"), F.col("qe").alias("qa")
    )
    qprobe = with_cosine(queries.crossJoin(seeds), qa="qa", qb="qc")
    wq = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    probes = (
        qprobe.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("q_id", "qa", F.col("c_id").alias("centroid"))
    )
    corpus = lists.join(
        emb.select(F.col("cid").alias("n_id"), F.col("qe").alias("qb")), "n_id"
    )
    cands = probes.join(corpus, "centroid").filter(F.col("q_id") != F.col("n_id"))
    scored = with_cosine(cands, qa="qa", qb="qb").select("q_id", "n_id", "cosine")
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank", "cosine")
    )
