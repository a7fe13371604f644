"""Corpus-selection operators: deterministic stratified sampling and
per-group top-k — the two selection primitives a training-data
pipeline applies after cleaning/dedup (down-sample over-represented
strata; keep the best documents per stratum).

Both are pure DataFrame compositions. Sampling is a narrow,
shuffle-free filter (the decision is a hash of the row's own id —
no global ordering, no count pass, reproducible across runs and
engines); top-k shuffles once on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ora_ch_spark.io import local_df

SAMPLE_DENOM = 10_000  # rate resolution: 1/10000


def _hash_bucket(id_col: str, salt: str) -> F.Column:
    """Deterministic per-row bucket in [0, SAMPLE_DENOM): first 8 md5
    hex chars of 'salt:id' as an int. Engine-exact (md5 on both sides
    of the differential gate) and independent of partitioning/order —
    the property Spark's ``df.sample`` does NOT have."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(SAMPLE_DENOM))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling with a DETERMINISTIC hash
    decision: row kept iff md5-bucket(id) < rate(group)·10000.

    The per-group rates arrive as a literal map (broadcast-joined as a
    tiny frame) — the plan is scan → broadcast join → filter, fully
    pushdown-friendly and shuffle-free, so it costs one pass at any
    scale. Groups absent from ``rates`` use ``default_rate``.

    Unlike ``df.sampleBy`` (seeded pseudo-random per partition, not
    stable under repartitioning), the hash decision is a pure function
    of the row id: re-runs, retries, and engine replays select the
    SAME rows — which is what makes sampled corpora reproducible.
    """
    spark = df.sparkSession
    rate_rows = [(g, int(round(r * SAMPLE_DENOM))) for g, r in sorted(rates.items())]
    # explicit schema: an empty rates dict (default_rate-only sampling)
    # must build an empty frame, not fail schema inference
    group_type = dict(df.dtypes).get(group_col, "string")
    rates_df = local_df(
        spark, rate_rows, f"{group_col} {group_type}, __thr int"
    )
    thr = F.coalesce(F.col("__thr"), F.lit(int(round(default_rate * SAMPLE_DENOM))))
    return (
        df.join(F.broadcast(rates_df), group_col, "left")
        .withColumn("__bucket", _hash_bucket(id_col, salt))
        .filter(F.col("__bucket") < thr)
        .drop("__thr", "__bucket")
    )


def sample_fixed_per_group(
    df: DataFrame,
    n: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "resv",
) -> DataFrame:
    """Exactly-n-per-group sampling (a deterministic reservoir): rank
    rows inside each group by md5-hash of their id and keep the first
    ``n``. Hash-ordering makes the selection uniform-ish AND a pure
    function of row ids — re-runs and engine replays pick the same
    rows, and growing a group only ever swaps members at the boundary
    (hash order is stable, unlike random reservoirs). One shuffle on
    the group key. The standard tool for building fixed-size per-slice
    eval sets."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Sequence-packing manifest for LLM training (the concat-and-chunk
    scheme: shard docs, concatenate each shard's token stream, cut it
    into fixed-``budget``-token training sequences). Emits per doc its
    shard, token offset within the shard stream, and the [start_seq,
    end_seq] span of training sequences its tokens land in — the
    bookkeeping a data loader needs to materialize packed batches
    without ever building the concatenated text on the driver.

    Deterministic by construction: shard = md5-bucket of the doc id
    (stable under repartitioning, like all sampling decisions here),
    stream order = doc id ascending within shard. Scale shape: one
    shuffle on the shard key, one within-partition window cumsum —
    shard count is the write parallelism knob, and no shard ever needs
    more than its own token stream in memory.
    """
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(shards))
    toks = F.size(F.split(F.lower(F.col(text_col)), " ")).cast("bigint")
    d = df.select(F.col(id_col), shard.alias("shard"), toks.alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    offset = cum - F.col("n_tokens")
    return d.select(
        id_col,
        "shard",
        "n_tokens",
        offset.alias("tok_offset"),
        F.floor(offset / budget).cast("bigint").alias("start_seq"),
        F.floor((cum - 1) / budget).cast("bigint").alias("end_seq"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixture resampling: build the LARGEST subsample whose
    group proportions hit integer target ``weights`` (e.g. {"en": 5,
    "de": 2, "fr": 2, "zh": 1} → a 5:2:2:1 corpus), selecting members
    deterministically by md5-rank. The core data-mixing step of LLM
    corpus assembly (fix the domain/language mixture before token
    budgeting).

    All sizing arithmetic is INTEGER (exact, engine-replayable):
    with W = Σw, the feasible total is T = min_g ⌊n_g·W / w_g⌋ and
    each group's take is t_g = ⌊T·w_g / W⌋ ≤ n_g. Groups absent from
    ``weights`` are excluded.

    Scale shape: one partial-agg count per group (tiny result), the
    1-row total broadcast-crossed back, then the same md5-rank window
    as :func:`sample_fixed_per_group` — one shuffle on the group key.
    """
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError(f"mixture weights must be positive integers, got {weights}")
    spark = df.sparkSession
    total_w = sum(weights.values())
    group_type = dict(df.dtypes).get(group_col, "string")
    wdf = local_df(
        spark, sorted(weights.items()), f"{group_col} {group_type}, __w bigint"
    )
    in_mix = df.join(F.broadcast(wdf), group_col)
    # counts built FROM THE WEIGHTS SIDE (left join): a weighted group
    # absent from df must surface n=0, forcing T=0 (empty sample) —
    # the contract's T = min_g floor(n_g*W/w_g); an inner join would
    # silently drop the group and return a mixture that violates the
    # requested ratio
    counts = wdf.join(
        df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n")),
        group_col,
        "left",
    ).withColumn("__n", F.coalesce(F.col("__n"), F.lit(0)))
    feasible = counts.agg(
        F.min(F.expr(f"__n * {total_w} div __w")).alias("__T")
    )
    targets = counts.crossJoin(F.broadcast(feasible)).select(
        group_col, F.expr(f"__T * __w div {total_w}").alias("__t")
    )
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        in_mix.drop("__w")
        .join(F.broadcast(targets), group_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__t"))
        .drop("__rn", "__t")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str = "weight",
    id_col: str = "doc_id",
    salt: str = "wt",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (integer
    weights ≥ 1): replicate each row ``weight`` times, hash every
    replica, key the row by its MAX replica hash, keep the global
    top-``n`` keys. Max-of-w-uniforms is the integer-weight form of
    the Efraimidis–Spirakis u^(1/w) reservoir key — selection
    probability grows with weight, and the whole draw is a pure
    function of ids (re-runs and engine replays pick the same rows —
    no transcendentals, so no cross-engine last-ulp risk).

    Scale shape: the explode blows rows up by the MEAN weight (keep
    weights small ints — quality tiers, not raw token counts), the
    max-key reduction is a partial agg, and the top-n is
    TakeOrdered (per-partition heads + driver merge of n) — no global
    sort materializes.
    """
    # weight < 1 means "never draw" — filter BEFORE the sequence:
    # sequence(0, w-1) with w <= 0 silently infers a NEGATIVE step and
    # yields [0, -1, ...] replicas, which would resurrect the row
    reps = (
        df.select(id_col, weight_col)
        .filter(F.col(weight_col) >= 1)
        .withColumn(
            "__i", F.explode(F.sequence(F.lit(0), F.col(weight_col).cast("int") - 1))
        )
    )
    rep_h = F.md5(
        F.concat(
            F.lit(salt + ":"),
            F.col(id_col).cast("string"),
            F.lit(":"),
            F.col("__i").cast("string"),
        )
    )
    keys = reps.withColumn("__h", rep_h).groupBy(id_col, weight_col).agg(
        F.max("__h").alias("sel_key")
    )
    return keys.orderBy(F.desc("sel_key"), F.asc(id_col)).limit(n)


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "quality_score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: float = 0.001,
) -> DataFrame:
    """Greedy token-budget selection: take documents best-score-first
    until ``budget`` tokens are spent — the final sizing step of
    corpus assembly (fix total training tokens, keep the best docs).

    Scale-correct by construction: a naive global sort + running sum
    is a single-partition window. Instead the selection is two-phase:
    (1) score buckets (width ``bucket_width``) aggregate to a TINY
    per-bucket token-total frame whose descending running sum finds
    the threshold bucket; (2) buckets strictly inside the budget take
    ALL their docs (a broadcast-join filter — no ordering needed),
    and only the single threshold bucket runs an exact
    (score desc, id) prefix window, partitioned by the bucket —
    bounded work however large the corpus. The contract is
    bucket-prefix greedy: deterministic and engine-replayable.
    """
    d = df.select(id_col, score_col, tokens_col).withColumn(
        "__bkt", F.floor(F.col(score_col) / F.lit(bucket_width)).cast("bigint")
    )
    per_bucket = d.groupBy("__bkt").agg(F.sum(tokens_col).alias("__btoks"))
    wb = Window.orderBy(F.desc("__bkt")).rowsBetween(Window.unboundedPreceding, 0)
    running = per_bucket.withColumn("__cum", F.sum("__btoks").over(wb))
    full_buckets = running.filter(F.col("__cum") <= budget).select("__bkt")
    thr = running.filter(
        (F.col("__cum") > budget) & (F.col("__cum") - F.col("__btoks") < budget)
    ).select(
        "__bkt",
        (F.lit(budget) - (F.col("__cum") - F.col("__btoks"))).alias("__remain"),
    )
    base_cols = [id_col, score_col, tokens_col]
    sel_full = d.join(F.broadcast(full_buckets), "__bkt").select(*base_cols)
    wt = (
        Window.partitionBy("__bkt")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sel_thr = (
        d.join(F.broadcast(thr), "__bkt")
        .withColumn("__c", F.sum(tokens_col).over(wt))
        .filter(F.col("__c") <= F.col("__remain"))
        .select(*base_cols)
    )
    return sel_full.unionByName(sel_thr)


def topk_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    order_col: str = "quality_score",
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties break on id
    ascending — deterministic). One shuffle on the group key; the
    rank never materializes more than each partition's sort. For
    heavily skewed groups at extreme scale, pre-filter with an
    approximate per-group threshold (percentile_approx) before the
    exact window — the window itself is already partial-agg-free."""
    ordering = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )


def quantile_threshold_filter(
    scored: DataFrame,
    group_col: str = "lang",
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    p: float = 0.5,
) -> DataFrame:
    """Keep each group's top (1-p) fraction by score: threshold = the
    group's DISCRETE p-quantile (type-1: the value at position
    ``ceil(p·n)`` in (score, id) order). Discrete — not interpolated —
    on purpose: interpolation formulas differ in last-ulp evaluation
    order between engines, while "an actual value from the data,
    picked by integer position" is engine-exact and reproducible.

    Returns one row per group: (group, n_docs, threshold, n_kept)
    where n_kept counts docs with score >= threshold (ties at the
    threshold are kept — docs, not positions, define the contract).

    Scale: one shuffle on the group key for the rank window (groups
    are the unit of skew — quality filtering groups by language/source
    whose cardinality is tiny next to the corpus, and each group's
    sort is distributed by the window exec), then a broadcast join of
    per-group thresholds back onto the scored frame. Per-group
    cardinality is bounded by row_number's int32 (a Spark window
    limit); beyond ~2.1B rows per group the threshold pick needs a
    two-pass count-bucket select instead.
    """
    # three consumers (rank window, sizes, kept-count) — persist the
    # narrow projection so the upstream scoring plan runs once (engine
    # convention: operators persist internally, session owner clears)
    scored = scored.select(group_col, score_col, id_col).persist()
    w = Window.partitionBy(group_col).orderBy(F.asc(score_col), F.asc(id_col))
    ranked = scored.withColumn("__rn", F.row_number().over(w))
    sizes = scored.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    thresholds = (
        ranked.join(F.broadcast(sizes), group_col)
        .filter(
            F.col("__rn").cast("bigint")
            == F.ceil(F.lit(p) * F.col("n_docs")).cast("bigint")
        )
        .select(group_col, "n_docs", F.col(score_col).alias("threshold"))
    )
    kept = (
        scored.join(F.broadcast(thresholds.select(group_col, "threshold")), group_col)
        .filter(F.col(score_col) >= F.col("threshold"))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return thresholds.join(kept, group_col).select(
        group_col, "n_docs", "threshold", "n_kept"
    )


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.9), ("val", 0.05), ("test", 0.05),
    ),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a
    pure function of its id (md5 bucket against cumulative weight
    thresholds over 10^6 buckets) — stable across reruns, engines,
    partitionings, and corpus growth (a doc never changes split when
    other docs are added/removed: the property random shuffles lack
    and every training pipeline needs for decontamination audits).
    Map-side only; expected split sizes are weights·n with
    hypergeometric-free independence per doc."""
    total = sum(w for _, w in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1 (got {total})")
    from ora_ch_spark.functions.hashes import md5_long

    bucket = md5_long(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    ) % 1_000_000
    expr = None
    acc = 0.0
    for name, w in weights[:-1]:
        acc += w
        thr = int(round(acc * 1_000_000))
        cond = bucket < thr
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        expr.otherwise(weights[-1][0])
        if expr is not None
        else F.lit(weights[-1][0])
    )
    return df.withColumn("split", expr)


def temperature_mixture_sample(
    df: DataFrame,
    temperature: float = 2.0,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "tmix",
    scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled mixture sampling — the multilingual
    corpus-balancing recipe (XLM/mT5 style): target proportions
    p_g ∝ n_g^(1/T) flatten the natural group distribution (T=1
    keeps it, T→∞ approaches uniform), boosting low-resource groups
    without fully discarding the head.

    Weights quantize to integers — ``w_g = max(1, ⌊scale·n_g^(1/T)⌋)``
    — and feed :func:`mixture_sample`'s exact integer sizing, so the
    selection stays engine-replayable. Determinism note: T=2 uses
    IEEE sqrt (correctly rounded — bit-identical on every engine);
    arbitrary T goes through pow, which may differ in the last ulp
    across engines, so gate entries pin T=2.

    The group-count collect is metadata-sized (one row per group)."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["g"] is not None
    }
    if not counts:
        return df.limit(0)
    import math

    # T=2 routes through math.sqrt explicitly: IEEE sqrt is correctly
    # rounded everywhere, while pow(n, 0.5) is only equal to it on
    # correctly-rounded libm builds
    root = (
        (lambda n: math.sqrt(n))
        if temperature == 2.0
        else (lambda n: n ** (1.0 / temperature))
    )
    weights = {
        g: max(1, math.floor(scale * root(n))) for g, n in counts.items()
    }
    return mixture_sample(
        df, weights, group_col=group_col, id_col=id_col, salt=salt
    )


def dsir_importance(
    docs: DataFrame,
    target_filter: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): hashed-bigram bag-of-words models
    for the TARGET slice (rows matching ``target_filter``) and the
    RAW corpus; each document scores

        score = Σ_b c_doc(b) · (ln p̂_target(b) − ln q̂_raw(b))

    with add-``smoothing`` estimates over ``n_buckets`` md5-hashed
    bigram buckets (md5, not engine hashes — cross-engine identical,
    ``functions/hashes.py``). High scores ≈ target-like documents;
    compose with :func:`weighted_sample` / :func:`token_budget_select`
    for the actual resampling step.

    Scale: one explode + TWO partial-agg shuffles build the bucket
    tables (bounded by n_buckets, broadcast back), one doc-key
    shuffle sums scores — no global sort, no driver loop. Returns
    (id, n_bigrams, score); score 0.0 for docs with < 2 tokens.
    """
    from ora_ch_spark.functions.hashes import md5_long

    # split ONCE into a column before the lambda — element_at over a
    # re-split inside the transform is O(len²) per document (codegen
    # does not CSE the split across lambda elements; measured 3x)
    grams = (
        docs.select(
            F.col(id_col),
            F.split(F.lower(F.col(text_col)), " ").alias("__t"),
        )
        .select(
            F.col(id_col),
            F.explode(
                # IF guard, not greatest(n-1, 0): Spark's
                # sequence(1, 0) DESCENDS instead of yielding []
                F.expr(
                    "IF(size(__t) < 2, array(), "
                    "transform(sequence(1, size(__t) - 1), "
                    "__gi -> concat(element_at(__t, __gi), ' ', "
                    "element_at(__t, __gi + 1))))"
                )
            ).alias("gram"),
        )
        .withColumn("bucket", md5_long(F.col("gram"), 8) % n_buckets)
    )
    # persist: the 15M-row-per-30k-doc gram explode feeds the bucket
    # tables, the totals action AND the scoring join — without the
    # persist each consumer re-runs the explode (measured 9.4 s → 2 s
    # at sf0.1)
    doc_counts = grams.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("c")
    ).persist()
    # Broadcast GATE (not a blind hint): the target slice is bounded
    # only by the user's filter — a permissive filter at 100 TB would
    # OOM executors under a forced broadcast. Count it first (cheap:
    # filter + projection on the id column) and only hint when it is
    # genuinely small; otherwise take a plain left_semi and let AQE
    # pick the strategy (same discipline as op_update's
    # BROADCAST_UPDATES_MAX_ROWS gate, load_ops.py).
    from ora_ch_spark.operators.load_ops import BROADCAST_UPDATES_MAX_ROWS

    is_target = docs.filter(target_filter).select(id_col)
    n_target = is_target.count()
    target_side = (
        F.broadcast(is_target)
        if n_target <= BROADCAST_UPDATES_MAX_ROWS
        else is_target
    )
    t_counts = (
        doc_counts.join(target_side, id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    q_counts = doc_counts.groupBy("bucket").agg(F.sum("c").alias("cq"))
    # ONE driver action for both totals (bucket tables are bounded)
    tot = (
        q_counts.join(t_counts, "bucket", "left")
        .agg(
            F.sum("cq").alias("qt"),
            F.sum(F.coalesce(F.col("ct"), F.lit(0))).alias("tt"),
        )
        .first()
    )
    q_total, t_total = tot["qt"] or 0, tot["tt"] or 0
    s, b = float(smoothing), n_buckets
    ratio = (
        q_counts.join(t_counts, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + F.lit(s))
                    / F.lit(float(t_total) + s * b)
                )
                - F.log(
                    (F.col("cq").cast("double") + F.lit(s))
                    / F.lit(float(q_total) + s * b)
                )
            ).alias("logratio"),
        )
    )
    scored = (
        doc_counts.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c").cast("double") * F.col("logratio")).alias(
                "score"
            ),
        )
    )
    return docs.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0).cast("bigint")).alias(
            "n_bigrams"
        ),
        F.coalesce(F.col("score"), F.lit(0.0)).alias("score"),
    )
