"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (SURVEY.md §2.4 end note): exact
dedup, MinHash+LSH near-dedup, SimHash signatures, and character
n-gram Jaccard — all pure DataFrame compositions (no UDFs), so the
whole pipeline stays JVM-side in whole-stage codegen.

Scale design:
- Exact dedup is a hash-groupBy — one shuffle on the 128-bit digest.
- MinHash+LSH: shingle explode → 1 groupBy for signatures → band
  explode → self-join on (band, bucket) → candidates only are
  verified. Never an N² comparison; candidate verification joins the
  (sorted, bucketed) shingle sets of candidate pairs only. At 100 TB
  the band join is the only wide shuffle and its key space
  (band, md5-bucket) is uniform by construction — no skew.
- SimHash: token explode → 32 bit-position explode → two groupBys;
  all integer arithmetic (order-independent, exactly reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content digest: one row per distinct content,
    with the survivor id (min) and the duplicate count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document (docs with fewer
    than ``n`` tokens yield no shingles — excluded from near-dedup)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    d = df.select(F.col(id_col), toks.alias("__toks")).filter(F.size("__toks") >= n)
    arr = F.expr(
        f"transform(sequence(1, size(__toks) - {n} + 1),"
        f" i -> concat_ws(' ', slice(__toks, i, {n})))"
    )
    return d.select(
        F.col(id_col), F.explode(F.array_distinct(arr)).alias("shingle")
    )


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 16) -> DataFrame:
    """MinHash signature: for hash function *h*, the minimum of
    ``md5(shingle || '#h')`` over the doc's shingle set. Min over
    fixed-length hex strings ≡ min over the underlying 128-bit
    integers, and is exactly reproducible on any engine."""
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{h}")))).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    sig: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature: bucket key = md5 of the band's hash slice.
    Docs sharing any (band, bucket) become candidate pairs."""
    rows = num_hashes // bands
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[f"mh{b * rows + r}" for r in range(rows)])).alias("bucket"),
        )
        for b in range(bands)
    ]
    return (
        sig.select(F.col(id_col), F.explode(F.array(*entries)).alias("e"))
        .select(id_col, "e.band", "e.bucket")
    )


def candidate_pairs(bandbuckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join on (band, bucket); ordered distinct pairs."""
    a = bandbuckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = bandbuckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """Exact Jaccard on candidate pairs only (never N²): intersection
    via shingle equi-join, union by inclusion–exclusion. The division
    is one double op over exact ints — engine-independent."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    sb = shingles.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash→LSH→verify near-dedup: returns (id_a, id_b,
    jaccard) pairs above the threshold."""
    sh = word_shingles(df, id_col, text_col, shingle_n)
    sig = minhash_signatures(sh, id_col, num_hashes)
    cands = candidate_pairs(lsh_band_buckets(sig, id_col, num_hashes, bands), id_col)
    return jaccard_verify(cands, sh, id_col, threshold)


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash over whitespace tokens (with multiplicity): bit *b* of
    the signature is the sign of Σ_tokens (2·bit_b(h(token)) − 1).
    All-integer arithmetic; ties (sum = 0) resolve to 0."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    hv = toks.withColumn(
        "hv", F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("bigint")
    )
    bitrows = hv.select(
        id_col, "hv", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    )
    contrib = F.when(F.expr("(hv div shiftleft(1L, b)) % 2 = 1"), 1).otherwise(-1)
    bitsums = bitrows.groupBy(id_col, "b").agg(F.sum(contrib).alias("s"))
    return bitsums.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, b)")).otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def char_ngram_jaccard_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    n: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """Character n-gram Jaccard near-dedup with blocking: pairs are
    compared only inside a block (e.g. same lang+source) — the
    classic scalable alternative to LSH when a natural partition key
    exists. Returns (id_a, id_b, jaccard) ≥ threshold."""
    t = F.lower(F.col(text_col))
    d = df.select(F.col(id_col), *block_cols, t.alias("__t")).filter(
        F.length("__t") >= n
    )
    grams = F.expr(
        f"array_distinct(transform(sequence(1, length(__t) - {n} + 1),"
        f" i -> substring(__t, i, {n})))"
    )
    g = d.select(F.col(id_col), *block_cols, F.explode(grams).alias("gram"))
    sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col(id_col).alias("id_a"), *[F.col(c) for c in block_cols], "gram")
    b = g.select(F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in block_cols], "gram")
    cond = [a[c] == b[f"{c}_b"] for c in block_cols]
    inter = (
        a.join(b, cond + [a.gram == b.gram])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
