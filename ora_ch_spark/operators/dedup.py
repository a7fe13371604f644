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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ora_ch_spark.io import local_df


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
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .repartition(par)  # small corpora arrive as one parquet split
    )
    arr = F.expr(
        f"transform(sequence(1, size(__toks) - {n} + 1),"
        f" i -> concat_ws(' ', slice(__toks, i, {n})))"
    )
    return d.select(
        F.col(id_col), F.explode(F.array_distinct(arr)).alias("shingle")
    )


MINHASH_PRIME = (1 << 61) - 1  # Mersenne prime; products stay < 2^63


def _length_prune(
    cands: DataFrame,
    arrays_a: DataFrame,
    arrays_b: DataFrame,
    id_col: str,
    a_id: str,
    b_id: str,
    a_n: str,
    b_n: str,
    threshold: float,
) -> DataFrame:
    """Set-similarity-join LENGTH FILTER: J(A,B) = |A∩B|/|A∪B| ≤
    min(|A|,|B|)/max(|A|,|B|), so any candidate pair whose set-size
    ratio is below the Jaccard threshold cannot qualify. Joins ONLY
    the narrow (id, n) projections of the two array frames and filters
    on them — pruned pairs never shuffle an array byte. Provably
    lossless for a ≥ threshold output. Returns ``cands`` with the two
    size columns (``a_n``, ``b_n``) attached for the downstream
    Jaccard denominator."""
    sa = arrays_a.select(F.col(id_col).alias(a_id), F.col("n").alias(a_n))
    sb = arrays_b.select(F.col(id_col).alias(b_id), F.col("n").alias(b_n))
    return (
        cands.join(sa, a_id)
        .join(sb, b_id)
        .filter(
            F.least(a_n, b_n).cast("double")
            >= F.lit(threshold) * F.greatest(a_n, b_n).cast("double")
        )
    )


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Universal-hash coefficients (aᵢ, bᵢ), md5-derived (seed-free,
    deterministic): hᵢ(x) = (aᵢ·x + bᵢ) mod P over the 32-bit base
    hash. aᵢ < 2³⁰ keeps aᵢ·x < 2⁶² (no int64 overflow)."""
    from ora_ch_spark.functions.hashes import py_md5_long

    return [
        (py_md5_long(f"mh_a{h}", 7) | 1, py_md5_long(f"mh_b{h}", 7))
        for h in range(num_hashes)
    ]


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id", num_hashes: int = 16) -> DataFrame:
    """MinHash signature via universal hashing over ONE md5 per
    shingle (instead of ``num_hashes`` md5s): base = the 60-bit md5
    shingle hash folded mod 2³², then hᵢ = (aᵢ·base + bᵢ) mod P. Pure
    int64 arithmetic — exactly reproducible on any engine.

    This is the naive EXPLODE-shaped form (one row per (doc, shingle),
    one groupBy shuffle for the signature); the production path is the
    shuffle-free per-row fold :func:`rowwise_minhash_cols` over
    :func:`shingle_hash_arrays`. Both use the same base hash and
    coefficients, so their signatures are BIT-IDENTICAL — pinned by
    ``test_single_pass_minhash_equals_explode_form``, which is what
    keeps this form around as a differential reference."""
    hv = F.pmod(
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast("bigint"),
        F.lit(4294967296),
    )
    base = shingles.withColumn("__hv", hv)
    aggs = [
        F.min((F.lit(a) * F.col("__hv") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh{h}")
        for h, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    return base.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    sig: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band the signature: bucket key = the band's hash slice joined
    as a string (no re-hash needed — the slice itself is the key).
    Docs sharing any (band, bucket) become candidate pairs."""
    rows = num_hashes // bands
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]).alias("bucket"),
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


def shingle_hash_arrays(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """One compact ``array<bigint>`` of distinct 60-bit-hashed word
    n-gram shingles per document — the single-pass substrate for
    MinHash: no shingle explode, no signature groupBy. 60-bit md5
    hashes make intersections collision-safe; the universal hash
    folds them mod 2³² internally (see :func:`rowwise_minhash_cols`)."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .repartition(par)  # small corpora arrive as one parquet split
    )
    arr = F.expr(
        f"transform(array_distinct(transform(sequence(1, size(__toks) - {n} + 1),"
        f" i -> concat_ws(' ', slice(__toks, i, {n})))),"
        f" s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"
    )
    return d.select(
        F.col(id_col), arr.alias("sharr"), F.size(arr).alias("n")
    )


_PACK31 = 1 << 31  # two 31-bit folds pack exactly into one int64


def packed_band_keys(num_hashes: int, bands: int) -> list:
    """Band bucket keys as packed int64s instead of string concat:
    each pair of signature slots folds mod 2³¹ and packs into one
    bigint ((mh_i mod 2³¹)·2³¹ + (mh_j mod 2³¹)) — a band of r rows
    becomes ceil(r/2) fixed-width integer join keys. No string
    building/compares in the widest shuffle of the pipeline."""
    rows = num_hashes // bands
    out = []
    for b in range(bands):
        keys = []
        idx = [b * rows + r for r in range(rows)]
        for i in range(0, len(idx), 2):
            if i + 1 < len(idx):
                keys.append(
                    F.expr(
                        f"pmod(mh{idx[i]}, {_PACK31}) * {_PACK31}"
                        f" + pmod(mh{idx[i + 1]}, {_PACK31})"
                    )
                )
            else:
                keys.append(F.col(f"mh{idx[i]}"))
        out.append(
            F.struct(
                F.lit(b).alias("band"),
                *[k.cast("bigint").alias(f"k{j}") for j, k in enumerate(keys)],
            )
        )
    return out


def _banded_self_pairs(
    bb: DataFrame,
    key_cols: list[str],
    id_col: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Candidate (id_a, id_b) pairs from the band-key self-join.

    Default: plain equi-self-join on the band keys — one shuffle on
    uniform integer keys, the right plan when band populations are
    healthy (AQE's skew splitting mops up moderate imbalance).

    ``salt_buckets=B`` switches to TRIANGLE BLOCKING for pathological
    hot bands (boilerplate-heavy corpora where thousands of docs share
    a band signature and one reducer would otherwise materialize that
    band's n² pairs): each row gets a deterministic block in [0, B)
    (xxhash64 of the id — routing only, never in the output), the left
    side replicates to block-pairs (blk, j≥blk), the right side to
    (i≤blk, blk), and the join key grows to (band key, __bi, __bj) —
    every within-band pair is emitted exactly once (same-block pairs
    twice, collapsed by the least/greatest normalization + distinct)
    while the hot band's work spreads over B(B+1)/2 reducers.
    Replication cost ≈ (B+1)/2 per row, so salt only when a band
    histogram (``skew.key_histogram``) shows a hot band; the output
    pair set is IDENTICAL either way (property-tested)."""
    if not salt_buckets:
        a = bb.select(F.col(id_col).alias("id_a"), *key_cols)
        b = bb.select(F.col(id_col).alias("id_b"), *key_cols)
        return (
            a.join(b, on=key_cols)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    B = int(salt_buckets)
    base = bb.withColumn(
        "__blk", F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int")
    )
    left = base.select(
        F.col(id_col).alias("id_a"),
        *key_cols,
        F.col("__blk").alias("__bi"),
        F.explode(F.sequence(F.col("__blk"), F.lit(B - 1))).alias("__bj"),
    )
    right = base.select(
        F.col(id_col).alias("id_b"),
        *key_cols,
        F.explode(F.sequence(F.lit(0), F.col("__blk"))).alias("__bi"),
        F.col("__blk").alias("__bj"),
    )
    return (
        left.join(right, on=key_cols + ["__bi", "__bj"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )


# auto-salting trigger (r6 verdict item 7): salt only when the band
# histogram shows a band BOTH relatively skewed (hottest band ≫ the
# mean band population) and absolutely hot (enough rows that its n²
# pair blow-up matters); block size targets ~512 rows per triangle
# block so the hot band's reducers stay bounded
_SALT_SKEW_RATIO = 8.0
_SALT_MIN_BAND_ROWS = 256
_SALT_TARGET_BLOCK_ROWS = 512


def auto_salt_buckets(bb: DataFrame, key_cols: list[str]) -> int | None:
    """Decide triangle-blocking from ``profile.key_skew_report`` over
    the composite band key: None (no salting) unless the hottest band
    crosses BOTH the relative-skew and absolute-size thresholds, else
    a bucket count sized so each block holds ~``_SALT_TARGET_BLOCK_
    ROWS`` of the hot band (capped at 16 — replication cost is
    (B+1)/2 per row). One partial-aggregable count pass over the band
    table — the same shuffle key the self-join would use, paid once
    to avoid a stalled reducer at scale."""
    import math

    from ora_ch_spark.operators.profile import key_skew_report

    rep = key_skew_report(
        bb.select(F.struct(*key_cols).alias("__bk")), "__bk", top=1
    ).first()
    if rep is None:
        return None
    if rep["skew_ratio"] <= _SALT_SKEW_RATIO or rep["cnt"] < _SALT_MIN_BAND_ROWS:
        return None
    return max(2, min(16, math.ceil(rep["cnt"] / _SALT_TARGET_BLOCK_ROWS)))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    salt_buckets: int | None | str = None,
) -> DataFrame:
    """Full MinHash→LSH→verify near-dedup: returns (id_a, id_b,
    jaccard) pairs above the threshold.

    Single-pass architecture (round 2): signatures are per-row
    ``array_min`` folds over the persisted shingle-hash arrays — no
    shingle explode and NO signature shuffle at all; band keys are
    packed int64 pairs (:func:`packed_band_keys`), so the only wide
    shuffles left are the band self-join on uniform integer keys and
    the candidate-pair distinct. Verification is a map-side
    ``array_intersect`` over the same persisted arrays, touching
    candidates only — never N². At 100 TB the arrays table is the one
    intermediate worth materializing to storage; everything else is
    narrow or candidate-sized."""
    arr = shingle_hash_arrays(df, id_col, text_col, shingle_n).persist()
    sig = arr.select(F.col(id_col), *rowwise_minhash_cols("sharr", num_hashes))
    rows = num_hashes // bands
    n_keys = (rows + 1) // 2
    bb = sig.select(
        F.col(id_col), F.explode(F.array(*packed_band_keys(num_hashes, bands))).alias("e")
    ).select(id_col, "e.band", *[f"e.k{j}" for j in range(n_keys)])
    key_cols = ["band"] + [f"k{j}" for j in range(n_keys)]
    if salt_buckets == "auto":
        # skew-driven trigger (r6 verdict item 7): one count pass over
        # the band table decides; the band table feeds both the report
        # and the self-join, so persist it for the double consumption
        bb = bb.persist()
        salt_buckets = auto_salt_buckets(bb, key_cols)
    cands = _banded_self_pairs(bb, key_cols, id_col, salt_buckets)
    pruned = _length_prune(cands, arr, arr, id_col, "id_a", "id_b", "na", "nb", threshold)
    ga = arr.select(F.col(id_col).alias("id_a"), F.col("sharr").alias("ga"))
    gb = arr.select(F.col(id_col).alias("id_b"), F.col("sharr").alias("gb"))
    return (
        pruned.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def incremental_minhash_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Incremental dedup: screen a NEW batch of documents against an
    EXISTING corpus without re-pairing the corpus with itself — the
    shape every recurring crawl-ingestion pipeline needs (the corpus
    is deduped once; each new batch only probes it).

    Two screens, both probe-sided:

    - exact:  md5 digest left-semi against the corpus digest set;
    - near:   banded MinHash band keys, corpus side as the index,
      batch side as the probe — the band equi-join emits only
      corpus×batch candidates (corpus×corpus pairs never form), then
      exact Jaccard verifies candidates via ``array_intersect``.

    At 100 TB the corpus band index and digest set are precomputed
    once and stored (they are pure columns of the corpus table); each
    batch run then shuffles only O(batch) band keys against it —
    incremental cost is O(batch), never O(corpus).

    Returns one row per batch doc: ``(doc_id, dup_exact,
    near_dup_of, max_jaccard, verdict)`` where ``near_dup_of`` is the
    smallest corpus id among verified near-dups (NULL if none) and
    verdict is 'exact' > 'near' > 'keep'.
    """
    dig_c = corpus.select(F.md5(F.col(text_col)).alias("__dig")).distinct()
    dig_b = batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("__dig"))
    exact = (
        dig_b.join(dig_c, "__dig", "left_semi")
        .select(id_col)
        .withColumn("dup_exact", F.lit(True))
    )

    arr_c = shingle_hash_arrays(corpus, id_col, text_col, shingle_n).persist()
    arr_b = shingle_hash_arrays(batch, id_col, text_col, shingle_n).persist()
    rows = num_hashes // bands
    n_keys = (rows + 1) // 2
    key_cols = ["band"] + [f"k{j}" for j in range(n_keys)]

    def band_frame(arr: DataFrame, out_id: str) -> DataFrame:
        sig = arr.select(F.col(id_col), *rowwise_minhash_cols("sharr", num_hashes))
        return sig.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array(*packed_band_keys(num_hashes, bands))).alias("e"),
        ).select(out_id, "e.band", *[F.col(f"e.k{j}").alias(f"k{j}") for j in range(n_keys)])

    cands = (
        band_frame(arr_c, "id_c")
        .join(band_frame(arr_b, "id_b"), on=key_cols)
        .select("id_c", "id_b")
        .distinct()
    )
    pruned = _length_prune(
        cands, arr_c, arr_b, id_col, "id_c", "id_b", "nc", "nb", threshold
    )
    gc = arr_c.select(F.col(id_col).alias("id_c"), F.col("sharr").alias("gc"))
    gb = arr_b.select(F.col(id_col).alias("id_b"), F.col("sharr").alias("gb"))
    near = (
        pruned.join(gc, "id_c")
        .join(gb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("gc", "gb")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("nc") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("id_b")
        .agg(
            F.min("id_c").alias("near_dup_of"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .withColumnRenamed("id_b", id_col)
    )
    out = (
        batch.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_exact", F.lit(False)).alias("dup_exact"),
            "near_dup_of",
            "max_jaccard",
            F.when(F.coalesce("dup_exact", F.lit(False)), "exact")
            .when(F.col("near_dup_of").isNotNull(), "near")
            .otherwise("keep")
            .alias("verdict"),
        )
    )
    return out


def connected_components(
    pairs: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Connected components of the near-dup PAIR graph — the step that
    turns pairwise verdicts into clusters so survivor selection keeps
    exactly one doc per duplicate GROUP (pair-wise "drop id_b" over-
    drops on chains a–b, b–c).

    Iterative min-label propagation: every node starts labeled with
    itself; each round takes the min of its own and its neighbors'
    labels; fixpoint = min node id reachable = component id.
    Converges in O(component diameter) rounds — near-dup clusters are
    dense (LSH pairs approximate cliques), so a handful. Each round is
    one small equi-join + aggregate on the label frame (persisted,
    previous round unpersisted); the convergence probe is a count on
    the changed rows only. Every 5 rounds the label frame is
    ``localCheckpoint``-ed: the logical plan otherwise grows by one
    join per round, and on a long-diameter graph (or at 100× data,
    where optimizer time scales with plan size) the planning cost of
    round N is O(N) without truncation. Deterministic,
    engine-replayable (the DuckDB oracle computes the same fixpoint
    with a recursive CTE).

    Returns (doc_id, component) for every node that appears in a pair.
    """
    e = pairs.select("id_a", "id_b").unionByName(
        pairs.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
        )
    ).distinct().persist()
    labels = (
        e.select(F.col("id_a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    for rnd in range(max_iter):
        nbr = (
            e.join(
                labels.select(
                    F.col("node").alias("id_b"), F.col("label").alias("nl")
                ),
                "id_b",
            )
            .groupBy("id_a")
            .agg(F.min("nl").alias("min_nbr"))
            .withColumnRenamed("id_a", "node")
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("min_nbr", F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.join(
                labels.select("node", F.col("label").alias("old")), "node"
            )
            .filter("label != old")
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
        if rnd % 5 == 4:  # truncate lineage: plan grows 1 join/round
            # NOTE: checkpoint blocks live at the RDD level, outside
            # the cacheManager — they are reclaimed by the
            # ContextCleaner when the superseded frame's reference
            # drops (next rebind of `labels`), not by unpersist(). At
            # most ~max_iter/5 label-frame copies can be pending GC;
            # the label frame is two int64 columns, orders of
            # magnitude smaller than the pair graph it came from.
            ck = new_labels.localCheckpoint(eager=True)
            new_labels.unpersist()
            labels = ck
    else:
        # a silent non-fixpoint would split clusters (and diverge from
        # the recursive-CTE oracle) — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter — raise it)"
        )
    e.unpersist()
    # NOTE: the returned frame is backed by the final labels cache;
    # long-running callers should unpersist it (or clearCache) when done
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    (Kiveris et al., "Connected Components in MapReduce and Beyond")
    — the O(log n)-round form of :func:`connected_components`:

    - large-star (on the symmetric adjacency): every node attaches
      its strictly-larger neighbors to min(N(u) ∪ {u});
    - small-star (on the resulting child→parent edges): every child
      re-points all its parents (and itself) at its min parent.

    Both steps preserve connectivity and only ever lower labels; the
    fixpoint is a star forest where every node points at its
    component's min id — the SAME output contract (and DuckDB
    oracle) as min-label propagation, reached in O(log n) rounds
    instead of O(component diameter). Per round: two join+aggregate
    passes over the (shrinking) edge frame; convergence = the edge
    set repeats, checked with two anti-join counts on the star
    frame. Use this form when clusters can be long chains (corpus
    near-dup graphs from pair verdicts CAN chain: a-b, b-c, ...);
    the dense-clique case converges in 2-3 rounds either way."""
    nodes = (
        pairs.select(F.col("id_a").alias("n"))
        .unionByName(pairs.select(F.col("id_b").alias("n")))
        .distinct()
    )  # consumed once (final label join) — no persist to leak
    e = (
        pairs.select(F.col("id_a").alias("c"), F.col("id_b").alias("p"))
        .filter(F.col("c") != F.col("p"))
        .distinct()
        .persist()
    )
    for _rnd in range(max_iter):
        # symmetric adjacency for the large-star step
        sym = e.unionByName(
            e.select(F.col("p").alias("c"), F.col("c").alias("p"))
        )
        mins = (
            sym.groupBy("c").agg(F.min("p").alias("mv"))
            .select("c", F.least(F.col("c"), F.col("mv")).alias("m"))
        )
        # large-star: (v, m(u)) for every neighbor v > u. NO distinct
        # here (r15, guide §2.4): duplicate (c, p) rows are harmless
        # to the min-aggregate below and to the ss construction (the
        # trailing ss.distinct() collapses them), so the dedup
        # exchange was a whole AQE query stage per round spent on
        # rows bounded by |sym| anyway. LAZY-checkpointed instead of
        # persisted: the two consumers (g and the join) otherwise
        # duplicate the whole mins subtree in the small-star plan
        # (measured 12 Exchange / 8 BroadcastExchange per round —
        # each one an AQE stage job), and a persist's cache write +
        # InMemoryRelation scan measured slower than the checkpoint
        # (0.90 vs 0.75 s/round warm at sf0.1).
        ls = (
            sym.join(mins, "c")
            .filter(F.col("p") > F.col("c"))
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
            .localCheckpoint(eager=False)
        )
        # small-star over child→parent edges (p < c by construction)
        g = ls.groupBy("c").agg(F.min("p").alias("m"))
        ss = (
            ls.join(g, "c")
            .filter(F.col("p") != F.col("m"))
            .select(F.col("p").alias("c"), F.col("m").alias("p"))
            .unionByName(g.select("c", F.col("m").alias("p")))
            .filter(F.col("c") != F.col("p"))
            .distinct()
        )
        # truncate lineage EVERY round: each round references the
        # previous edge frame ~4x (sym twice, mins once, the
        # convergence check twice), so an un-truncated plan grows
        # EXPONENTIALLY — measured: a 2 GiB plan string by round ~8
        # on a 120-chain. LAZY checkpoint: the convergence action
        # below materializes it (and round 1 without a check is
        # materialized by round 2's action).
        ss = ss.localCheckpoint(eager=False)
        converged = False
        if _rnd > 0:
            # set-equality check as ONE aggregate (r15, guide §2.3):
            # both frames are distinct row sets, so tagging e with +1
            # and ss with -1 and summing per (c, p) leaves a nonzero
            # sum iff the sets differ — one exchange + isEmpty,
            # replacing the two exceptAll scans (each its own
            # shuffle of both frames). Round 1 skips the check: a
            # non-fixpoint input always changes in round 1, and a
            # fixpoint input merely pays one idempotent extra round
            # (large/small-star are stable at the fixpoint), so
            # correctness is unchanged while the common case saves a
            # whole action.
            converged = (
                e.withColumn("__s", F.lit(1))
                .unionByName(ss.withColumn("__s", F.lit(-1)))
                .groupBy("c", "p")
                .agg(F.sum("__s").alias("__d"))
                .filter(F.col("__d") != 0)
                .isEmpty()
            )
        e.unpersist()
        e = ss
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds"
        )
    labels = (
        nodes.join(e.select(F.col("c").alias("n"), "p"), "n", "left")
        .select(
            F.col("n").alias("doc_id"),
            F.coalesce("p", F.col("n")).alias("component"),
        )
    )
    return labels


def update_components(
    labels: DataFrame, new_pairs: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Incremental connected components: fold a NEW batch of duplicate
    pairs into an existing (doc_id, component) labeling without
    re-deriving the original pair graph. Because a labeling IS a star
    forest (node→component edges carry exactly the connectivity of
    the solved graph), re-running star CC on labels-as-edges ∪
    new_pairs yields the same result as a full recompute over
    all-pairs-ever (asserted by the equivalence test) — at
    O(nodes + new pairs) input size, never O(history of pairs).
    Components merge when a new pair bridges them; the surviving
    component id is the min across the merged set, so ids remain
    stable unless a smaller-id component absorbs them."""
    as_pairs = labels.filter(F.col("doc_id") != F.col("component")).select(
        F.col("doc_id").alias("id_a"), F.col("component").alias("id_b")
    )
    singletons = labels.filter(F.col("doc_id") == F.col("component")).select(
        "doc_id", "component"
    )
    merged = connected_components_star(
        as_pairs.unionByName(new_pairs.select("id_a", "id_b")),
        max_iter=max_iter,
    )
    # singletons untouched by any new pair keep their identity row
    untouched = singletons.join(
        merged.select("doc_id"), "doc_id", "left_anti"
    )
    return merged.unionByName(untouched)


def build_dedup_index(
    store,
    schema: str,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Materialize the corpus side of :func:`incremental_minhash_dedup`
    into store tables, so recurring batch screens never recompute the
    corpus pass (the "precomputed once and stored" half of the
    incremental contract):

    - ``<schema>.dedup_digests``  — distinct md5 content digests;
    - ``<schema>.dedup_arrays``   — per-doc shingle-hash arrays + size;
    - ``<schema>.dedup_bands``    — packed band keys per doc.

    Appending NEW accepted docs to the index is itself incremental
    (store.append of their digests/arrays/bands — pure file adds)."""
    store.create_database(schema)
    # record the hash parameters: a probe with mismatched parameters
    # computes band keys from different hash slots and silently
    # matches nothing — the probe asserts against this row
    meta = local_df(
        corpus.sparkSession,
        [(shingle_n, num_hashes, bands)],
        "shingle_n int, num_hashes int, bands int",
    )
    store.write(schema, "dedup_meta", meta)
    digests = corpus.select(F.md5(F.col(text_col)).alias("dig")).distinct()
    store.write(schema, "dedup_digests", digests)
    arr = shingle_hash_arrays(corpus, id_col, text_col, shingle_n)
    store.write(schema, "dedup_arrays", arr)
    sig = store.read(schema, "dedup_arrays").select(
        F.col(id_col), *rowwise_minhash_cols("sharr", num_hashes)
    )
    rows = num_hashes // bands
    n_keys = (rows + 1) // 2
    bandsdf = sig.select(
        F.col(id_col),
        F.explode(F.array(*packed_band_keys(num_hashes, bands))).alias("e"),
    ).select(id_col, "e.band", *[F.col(f"e.k{j}").alias(f"k{j}") for j in range(n_keys)])
    store.write(schema, "dedup_bands", bandsdf)
    # band-load baseline for dedup_index_health_report (r14, same
    # lifecycle idea as the ANN indexes' train_route_err/train_mqe):
    # the screen's join cost concentrates in the heaviest band
    # buckets, so record the build-time load shape to compare
    # against as appends accumulate. One partial-aggregable count
    # pass over the freshly written band table.
    stats = _band_load_stats(
        store.read(schema, "dedup_bands"), _band_key_cols(num_hashes, bands)
    )
    store.write(
        schema,
        "dedup_band_stats",
        local_df(
            corpus.sparkSession,
            [stats],
            "band_rows bigint, band_ndv bigint, max_bucket bigint, "
            "pair_weight bigint",
        ),
    )


def _band_key_cols(num_hashes: int, bands: int) -> list:
    rows = num_hashes // bands
    return ["band"] + [f"k{j}" for j in range((rows + 1) // 2)]


def _band_load_stats(bandsdf: DataFrame, key_cols: list) -> tuple:
    """(rows, distinct band keys, heaviest bucket, Σ cnt² over
    buckets) — all exact bigints. ``pair_weight`` is proportional to
    the candidate pairs the band equi-join materializes, i.e. the
    actual cost driver of the screen at scale."""
    per = bandsdf.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    row = per.agg(
        F.sum("cnt").alias("rows"),
        F.count(F.lit(1)).alias("ndv"),
        F.max("cnt").alias("mx"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("pw"),
    ).first()
    return (
        int(row["rows"] or 0), int(row["ndv"] or 0),
        int(row["mx"] or 0), int(row["pw"] or 0),
    )


# re-salt/rebuild threshold for dedup_index_health_report: uniform
# corpus growth g multiplies every bucket by ~g and the band-join
# pair weight by ~g² — a pair weight more than this factor beyond
# the uniform-growth expectation means load is CONCENTRATING in hot
# buckets (adversarial/templated content), and the screen's
# candidate join will stall on those reducers long before the
# corpus itself is large. Remedy: re-salt the probe's hot bands
# (auto_salt_buckets machinery) or rebuild with more bands.
DEDUP_RESALT_FACTOR = 2.0


def dedup_index_health_report(
    store,
    schema: str,
    resalt_factor: float = DEDUP_RESALT_FACTOR,
) -> dict:
    """Band-load drift metric for a :func:`build_dedup_index` index —
    the MinHash twin of ``similarity.ivf_index_drift_report``
    (MinHash needs no training, but band-bucket LOAD skews as the
    corpus grows). Compares the current band table's pair weight
    (Σ bucket²) against the build-time baseline, normalized by the
    uniform-growth expectation g²; ``resalt`` trips when hot-bucket
    concentration exceeds ``resalt_factor``. Cost: one count pass
    over the band table (the same shuffle key the screen joins on),
    zero reads of arrays/digests. A pre-metric index (no
    ``dedup_band_stats`` table) raises loudly — rebuild to adopt the
    baseline."""
    meta = store.read(schema, "dedup_meta").first()
    try:
        base = store.read(schema, "dedup_band_stats").first()
    except Exception as exc:
        raise ValueError(
            f"{schema}: no dedup_band_stats baseline — the index "
            f"predates the health metric; rebuild with "
            f"build_dedup_index"
        ) from exc
    key_cols = _band_key_cols(meta["num_hashes"], meta["bands"])
    cur = _band_load_stats(store.read(schema, "dedup_bands"), key_cols)
    rows, ndv, mx, pw = cur
    growth = rows / base["band_rows"] if base["band_rows"] else float("inf")
    pair_ratio = (
        pw / base["pair_weight"] if base["pair_weight"] else float("inf")
    )
    expected = growth * growth
    skew_factor = pair_ratio / expected if expected > 0 else float("inf")
    return {
        "build_rows": int(base["band_rows"]),
        "rows": rows,
        "growth": growth,
        "build_max_bucket": int(base["max_bucket"]),
        "max_bucket": mx,
        "build_pair_weight": int(base["pair_weight"]),
        "pair_weight": pw,
        "pair_ratio": pair_ratio,
        "skew_factor": skew_factor,
        "resalt": skew_factor > resalt_factor,
    }


def dedup_index_append(
    store,
    schema: str,
    accepted: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append ACCEPTED batch docs to a :func:`build_dedup_index`
    index — the documented incremental half of the lifecycle as a
    helper: digests/arrays/bands computed for the batch only (hash
    parameters read from the index meta, so they can never drift
    from the build) and appended as pure file adds. O(batch); the
    baseline in ``dedup_band_stats`` intentionally rides — that is
    what :func:`dedup_index_health_report` measures drift against."""
    meta = store.read(schema, "dedup_meta").first()
    shingle_n, num_hashes, bands = (
        meta["shingle_n"], meta["num_hashes"], meta["bands"],
    )
    digests = accepted.select(F.md5(F.col(text_col)).alias("dig")).distinct()
    store.append(schema, "dedup_digests", digests)
    arr = shingle_hash_arrays(accepted, id_col, text_col, shingle_n)
    store.append(schema, "dedup_arrays", arr)
    sig = arr.select(F.col(id_col), *rowwise_minhash_cols("sharr", num_hashes))
    n_keys = (num_hashes // bands + 1) // 2
    bandsdf = sig.select(
        F.col(id_col),
        F.explode(F.array(*packed_band_keys(num_hashes, bands))).alias("e"),
    ).select(
        id_col, "e.band", *[F.col(f"e.k{j}").alias(f"k{j}") for j in range(n_keys)]
    )
    store.append(schema, "dedup_bands", bandsdf)


def incremental_dedup_against_index(
    store,
    schema: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Screen a batch against a :func:`build_dedup_index` index —
    identical output contract to :func:`incremental_minhash_dedup`,
    but the only corpus-side work is reading the (pruned) index
    tables: per-run cost is O(batch) + an index equi-join. Raises if
    the hash parameters don't match the ones the index was built with
    (a mismatch would silently match nothing)."""
    meta = store.read(schema, "dedup_meta").first()
    if (meta["shingle_n"], meta["num_hashes"], meta["bands"]) != (
        shingle_n, num_hashes, bands,
    ):
        raise ValueError(
            f"index {schema} built with shingle_n={meta['shingle_n']}, "
            f"num_hashes={meta['num_hashes']}, bands={meta['bands']}; "
            f"probe called with ({shingle_n}, {num_hashes}, {bands})"
        )
    dig_c = store.read(schema, "dedup_digests")
    dig_b = batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("dig"))
    exact = (
        dig_b.join(dig_c, "dig", "left_semi")
        .select(id_col)
        .withColumn("dup_exact", F.lit(True))
    )
    # the returned frame is backed by this cache (bands + verify both
    # read it); long-running callers unpersist/clearCache between runs
    arr_b = shingle_hash_arrays(batch, id_col, text_col, shingle_n).persist()
    rows = num_hashes // bands
    n_keys = (rows + 1) // 2
    key_cols = ["band"] + [f"k{j}" for j in range(n_keys)]
    sig_b = arr_b.select(F.col(id_col), *rowwise_minhash_cols("sharr", num_hashes))
    bands_b = sig_b.select(
        F.col(id_col).alias("id_b"),
        F.explode(F.array(*packed_band_keys(num_hashes, bands))).alias("e"),
    ).select("id_b", "e.band", *[F.col(f"e.k{j}").alias(f"k{j}") for j in range(n_keys)])
    bands_c = store.read(schema, "dedup_bands").select(
        F.col(id_col).alias("id_c"), *key_cols
    )
    cands = bands_c.join(bands_b, on=key_cols).select("id_c", "id_b").distinct()
    arrs_c = store.read(schema, "dedup_arrays")
    pruned = _length_prune(
        cands, arrs_c, arr_b, id_col, "id_c", "id_b", "nc", "nb", threshold
    )
    gc = arrs_c.select(F.col(id_col).alias("id_c"), F.col("sharr").alias("gc"))
    gb = arr_b.select(F.col(id_col).alias("id_b"), F.col("sharr").alias("gb"))
    near = (
        pruned.join(gc, "id_c")
        .join(gb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("gc", "gb")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("nc") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_c").alias("near_dup_of"), F.max("jaccard").alias("max_jaccard"))
        .withColumnRenamed("id_b", id_col)
    )
    return (
        batch.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            id_col,
            F.coalesce("dup_exact", F.lit(False)).alias("dup_exact"),
            "near_dup_of",
            "max_jaccard",
            F.when(F.coalesce("dup_exact", F.lit(False)), "exact")
            .when(F.col("near_dup_of").isNotNull(), "near")
            .otherwise("keep")
            .alias("verdict"),
        )
    )


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash over whitespace tokens (with multiplicity): bit *b* of
    the signature is the sign of Σ_tokens (2·bit_b(h(token)) − 1).
    All-integer arithmetic; ties (sum = 0) resolve to 0.

    Round-2 shape: ZERO shuffles and zero explodes. Tokens are hashed
    once into an ``array<bigint>`` per row, then each signature bit is
    one ``aggregate`` fold over that array — the whole operator is a
    single narrow projection inside whole-stage codegen (the previous
    form exploded 32 bit-rows per token and ran two groupBys)."""
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    hvs = F.expr(
        f"transform(split(lower({text_col}), ' '),"
        f" t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"
    )
    d = (
        df.filter(F.col(text_col).isNotNull())
        .repartition(par)
        .select(F.col(id_col), hvs.alias("__hvs"))
    )
    sig = None
    for b in range(bits):
        s_b = F.expr(
            f"aggregate(__hvs, 0L,"
            f" (acc, h) -> acc + (case when (h div {1 << b}) % 2 = 1 then 1 else -1 end))"
        )
        term = F.when(s_b > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = term if sig is None else sig + term
    return d.select(F.col(id_col), sig.alias("simhash"))


def rowwise_minhash_cols(
    arr_col: str, num_hashes: int = 16
) -> list:
    """Per-ROW MinHash signature columns over an ``array<bigint>`` of
    hashed grams/shingles — pure expressions, NO explode and NO
    shuffle (the single-pass form of :func:`minhash_signatures`).
    Elements are folded mod 2³² before the universal hash so
    aᵢ·x stays < 2⁶² (no int64 overflow)."""
    cols = []
    for h, (a, b) in enumerate(minhash_coeffs(num_hashes)):
        cols.append(
            F.expr(
                f"array_min(transform({arr_col},"
                f" g -> ({a} * pmod(g, 4294967296) + {b}) % {MINHASH_PRIME}))"
            ).alias(f"mh{h}")
        )
    return cols


def _gram_arrays(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: tuple[str, ...],
    n: int,
) -> DataFrame:
    """One compact array of distinct hashed char n-grams per doc — NO
    gram explode. Grams are hashed to 60-bit ints so the arrays are
    fixed-width and engine-reproducible (md5)."""
    t = F.lower(F.col(text_col))
    # spread the docs across the executor pool up front: a small
    # corpus arrives as one parquet split, which would serialize both
    # the gram-array build and the intersect work onto a single task
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.select(F.col(id_col), *block_cols, t.alias("__t"))
        .filter(F.length("__t") >= n)
        .repartition(par)
    )
    grams = F.expr(
        f"transform(array_distinct(transform(sequence(1, length(__t) - {n} + 1),"
        f" i -> substring(__t, i, {n}))),"
        f" s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"
    )
    return d.select(
        F.col(id_col), *block_cols, grams.alias("grams"), F.size(grams).alias("n")
    )


def _jaccard_on_pairs(
    pairs: DataFrame, arrays: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard via map-side array_intersect over given (id_a,
    id_b) pairs, after the :func:`_length_prune` length filter —
    pruned pairs never shuffle a single array byte."""
    survivors = _length_prune(
        pairs, arrays, arrays, id_col, "id_a", "id_b", "na", "nb", threshold
    )
    a = arrays.select(F.col(id_col).alias("id_a"), F.col("grams").alias("ga"))
    b = arrays.select(F.col(id_col).alias("id_b"), F.col("grams").alias("gb"))
    return (
        survivors.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    n: int = 4,
    max_block: int = 10_000,
    num_hashes: int = 16,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """(candidate pairs, persisted gram arrays) for
    :func:`char_ngram_jaccard_dedup` with
    **block-size routing** (the 100 TB guard): blocks up to
    ``max_block`` docs use the exact all-pairs-within-block join;
    oversized blocks (at web scale, (en, web) ≈ the whole corpus)
    route through banded MinHash-LSH *within the block*, whose
    candidate count grows ~linearly in block size instead of
    quadratically. Exposed separately so the linear-growth property
    is testable."""
    arrays = _gram_arrays(df, id_col, text_col, block_cols, n).persist()
    sizes = arrays.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("__bn"))
    tagged = arrays.join(F.broadcast(sizes), list(block_cols))
    small = tagged.filter(F.col("__bn") <= max_block)
    big = tagged.filter(F.col("__bn") > max_block)

    sa = small.select(F.col(id_col).alias("id_a"), *block_cols)
    sb = small.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in block_cols]
    )
    cond = [sa[c] == sb[f"{c}_b"] for c in block_cols]
    small_pairs = (
        sa.join(sb, cond).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    )

    # oversized blocks: per-row (no-shuffle) MinHash over the gram
    # array, banded buckets; band keys are packed int64 pairs
    # (packed_band_keys — no string build/compare in the widest
    # shuffle; residue-fold collisions only ADD candidates, which the
    # exact verify removes)
    rows = num_hashes // bands
    n_keys = (rows + 1) // 2
    sig = big.select(id_col, *block_cols, *rowwise_minhash_cols("grams", num_hashes))
    bb = sig.select(
        F.col(id_col), *block_cols,
        F.explode(F.array(*packed_band_keys(num_hashes, bands))).alias("e"),
    ).select(
        id_col, *block_cols, "e.band",
        *[F.col(f"e.k{j}").alias(f"k{j}") for j in range(n_keys)],
    )
    kcols = ["band"] + [f"k{j}" for j in range(n_keys)]
    ba = bb.select(F.col(id_col).alias("id_a"), *block_cols, *kcols)
    bbb = bb.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"{c}_b") for c in block_cols],
        *[F.col(k).alias(f"{k}_b") for k in kcols],
    )
    # distinct names on the two sides — a same-lineage self-join on
    # identically-named columns resolves to a trivially-true predicate
    bcond = [ba[c] == bbb[f"{c}_b"] for c in block_cols] + [
        ba[k] == bbb[f"{k}_b"] for k in kcols
    ]
    big_pairs = (
        ba.join(bbb, bcond)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return small_pairs.unionByName(big_pairs), arrays


def char_ngram_jaccard_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple[str, ...] = ("lang", "source"),
    n: int = 4,
    threshold: float = 0.6,
    max_block: int = 10_000,
) -> DataFrame:
    """Character n-gram Jaccard near-dedup with blocking: pairs are
    compared only inside a block (e.g. same lang+source) — the
    classic scalable alternative to LSH when a natural partition key
    exists. Returns (id_a, id_b, jaccard) ≥ threshold.

    Blocks larger than ``max_block`` are NOT cross-joined: they route
    through banded MinHash-LSH within the block (see
    :func:`ngram_candidate_pairs`), bounding the pair space to
    ~linear in block size. Recall on the routed blocks follows the
    LSH S-curve (1−(1−s^r)^b with r=4, b=4: ≥97% at s=0.9, ~43% at
    the 0.6 decision boundary) — the standard trade the exact path
    doesn't make; raise ``bands`` for higher recall."""
    pairs, arrays = ngram_candidate_pairs(
        df, id_col, text_col, block_cols, n, max_block
    )
    return _jaccard_on_pairs(pairs, arrays, id_col, threshold)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination — the training-data hygiene step that
    keeps eval sets out of the corpus: flag every document sharing at
    least ``min_hits`` distinct word ``n``-grams with the benchmark
    corpus (the n-gram-overlap rule used for corpus decontamination in
    LM training pipelines).

    Scale shape: the benchmark side is tiny relative to the corpus
    (eval sets are MBs against TBs), so its distinct n-gram set is
    BROADCAST — the corpus-side scan is one narrow explode + map-side
    broadcast-hash probe + per-doc count, no wide shuffle at all. If a
    benchmark ever outgrows broadcast, drop the hint: the same plan
    becomes a plain shuffled equi-join on the n-gram key.

    Returns one row per scanned doc: (id, n_contaminated_ngrams,
    contaminated). Docs with fewer than ``n`` tokens have no n-grams
    and report 0 / false.
    """
    bench_sh = word_shingles(benchmark, id_col, text_col, n).select("shingle").distinct()
    doc_sh = word_shingles(docs, id_col, text_col, n)  # distinct per doc
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_contaminated_ngrams", F.lit(0).cast("bigint")).alias(
                "n_contaminated_ngrams"
            ),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 60,
    min_shared: int = 5,
    winnow: int = 8,
) -> DataFrame:
    """Exact-substring duplicate detection (the training-data dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", simplified from suffix arrays to window fingerprints)
    with robust winnowing (Schleimer et al., MOSS): hash every
    ``window``-char sliding window per doc, then keep only the MINIMUM
    hash in each run of ``winnow`` consecutive positions. Winnowing is
    position-local and content-defined, so two docs sharing a
    contiguous run select the same minima inside it: recall = 1 for
    shared runs ≥ window + winnow·min_shared − 1 chars (each aligned
    block of ``winnow`` positions inside the run contributes one
    guaranteed-shared fingerprint). ``winnow=1`` recovers the
    every-position form (recall = 1 at window + min_shared − 1) at
    ~``winnow``× the shuffle volume — the fingerprint table shrinks
    from one row per character to ~2/(winnow+1) rows per character,
    which at 100 TB is the difference between shuffling the corpus
    and shuffling ~a quarter of it.

    Precision contract (deliberately weaker than suffix arrays): a
    reported pair is only guaranteed to share ≥ ``min_shared``
    DISTINCT ``window``-char substrings — scattered repeated snippets
    (shared boilerplate) satisfy the filter without a single long
    run. That is usually the desired behavior for training-data dedup
    (boilerplate is exactly what you want flagged); callers needing
    the strict contiguous guarantee should verify the survivors'
    window-hash positions form a run.

    Returns (id_a, id_b, n_shared_windows). Scale shape: one explode,
    one self-equi-join on the 60-bit fingerprint (uniform key — no
    skew), one count aggregate; the fingerprint table is the only
    wide intermediate and is persisted once.
    """
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    t = F.lower(F.col(text_col))
    d = (
        df.select(F.col(id_col), t.alias("__t"))
        .filter(F.length("__t") >= window)
        .repartition(par)
    )
    # positional window-hash sequence (NOT distinct — winnowing is
    # positional), then min-per-winnow-window fingerprint selection
    d = d.withColumn(
        "__hs",
        F.expr(
            f"transform(sequence(1, length(__t) - {window} + 1),"
            f" i -> cast(conv(substring(md5(substring(__t, i, {window})), 1, 15), 16, 10) as bigint))"
        ),
    )
    fingerprints = F.expr(
        f"array_distinct(transform(sequence(1, greatest(1, size(__hs) - {winnow} + 1)),"
        f" j -> array_min(slice(__hs, j, {winnow}))))"
    )
    g = d.select(F.col(id_col), F.explode(fingerprints).alias("h")).persist()
    a = g.select(F.col(id_col).alias("id_a"), "h")
    b = g.select(F.col(id_col).alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
        .filter(F.col("n_shared_windows") >= min_shared)
    )


def exact_dedup_keep_best(
    docs: DataFrame,
    scored: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "quality_score",
) -> DataFrame:
    """Exact dedup with QUALITY-AWARE winner selection — real corpus
    pipelines keep the best duplicate, not the first: per md5(text)
    group, the winner maximizes (score, then LOWEST id as the
    deterministic tie-break). One row per distinct text:
    (text_hash, keep_id, best_score, dup_count).

    Implemented as ``max(struct(score, -id))`` — a partial-aggregable
    single pass, no window over potentially-hot digest groups (the
    same no-window rule as line_dedup)."""
    j = docs.select(
        F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col)
    ).join(
        scored.select(F.col(id_col), F.col(score_col)), id_col, "inner"
    )
    w = j.groupBy("text_hash").agg(
        F.max(
            F.struct(
                F.col(score_col).alias("s"), (-F.col(id_col)).alias("negid")
            )
        ).alias("__w"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return w.select(
        "text_hash",
        (-F.col("__w.negid")).cast("bigint").alias("keep_id"),
        F.col("__w.s").alias("best_score"),
        "dup_count",
    )


def editdistance_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-level near-duplicate pairs at edit distance ≤ 1 via
    DELETION-NEIGHBORHOOD blocking (the FastSS / SymSpell shape):
    each string emits itself plus its |s| single-character-deletion
    variants as block keys; any two strings within one edit
    (substitution, insertion, or deletion) provably share a key —
    the blocking is sound AND complete for d = 1, unlike n-gram or
    minhash candidates. Candidates are verified with exact
    ``levenshtein`` (identical definition both engines), so there
    are no false positives either. Returns (id_a, id_b, dist) with
    id_a < id_b, one row per pair.

    Complements the token-level family (minhash/simhash/Jaccard):
    those catch rearranged documents, this catches typo-class
    variants of SHORT strings (titles, names, codes) where one
    character is the entire difference.

    Scale shape: key fan-out is O(N·L) small rows (L = string
    length — use on short columns); the candidate join is an
    equi-join on the key (shuffle or broadcast, never all-pairs);
    a boilerplate-heavy hot key salts the same way as
    ``_banded_self_pairs``. Verification touches candidates only."""
    s = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    ).filter(F.col("__s").isNotNull())
    # the string itself + every single-deletion variant (guard the
    # empty string: sequence(1, 0) would run DOWNWARD)
    keys = s.select(
        "__id",
        "__s",
        F.explode(
            F.expr(
                "concat(array(__s), CASE WHEN length(__s) = 0 THEN array() "
                "ELSE transform(sequence(1, length(__s)), i -> "
                "concat(substring(__s, 1, i - 1), substring(__s, i + 1))) END)"
            )
        ).alias("__k"),
    ).distinct()
    a = keys.select(
        F.col("__id").alias("id_a"), F.col("__s").alias("s_a"), "__k"
    )
    b = keys.select(
        F.col("__id").alias("id_b"), F.col("__s").alias("s_b"), "__k"
    )
    cand = (
        a.join(b, "__k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "s_a", "id_b", "s_b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )
