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
from ora_ch_spark.operators.text import lang_id, quality_score


def clean_corpus(
    docs: DataFrame,
    keep_lang: str = "en",
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.8,
) -> DataFrame:
    """Returns the cleaned corpus (doc rows that survive all stages)."""
    langs = lang_id(docs).select("doc_id", "predicted_lang")
    qual = quality_score(docs).select("doc_id", "quality_score")
    kept = (
        docs.join(langs, "doc_id")
        .join(qual, "doc_id")
        .filter(
            (F.col("predicted_lang") == keep_lang)
            & (F.col("quality_score") >= min_quality)
        )
    )
    # exact dedup: survivor = min doc_id per content digest
    survivors = exact_dedup_groups(kept).select(F.col("keep_id").alias("doc_id"))
    kept = kept.join(survivors, "doc_id")
    # near-dedup: drop the HIGHER id of every verified near-dup pair
    # (pairs computed on the post-filter corpus)
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
