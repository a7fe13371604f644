"""Text-analysis operators over the ``documents`` table: language ID
(stopword-lexicon heuristic), quality scoring, token counting, and
document fingerprinting.

All pure DataFrame/SQL compositions — no UDFs, everything stays in
whole-stage codegen. Every output is derived from exact integer
counts plus single deterministic double expressions, so results are
engine-exact for differential testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lexicons for the n-gram/stopword language
# heuristic. Deliberately small and inline (a production pipeline
# would broadcast a real lexicon table — the plan shape is identical:
# explode tokens → broadcast join lexicon → argmax per doc).
LANG_LEXICON: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "que", "pour"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "men5", "bu4"),
}

STOPWORDS_EN = LANG_LEXICON["en"]


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: predicted language = argmax over
    candidate languages of lexicon token hits (ties break on language
    code ascending — deterministic). Docs with zero hits in every
    lexicon predict 'und' (undetermined).

    r15 (guide §2.4): computed as ONE row-wise projection — per-lang
    hit counts are size(filter(tokens, in lexicon)) and the argmax is
    array_min over (-hits, lang) structs, so the previous explode →
    broadcast-lexicon-join → groupBy → rank-window plan (two
    exchanges per call) is shuffle-free. Value-identical by
    construction: occurrence counts (not distinct), ties to the
    lowest language code, zero total hits → 'und', NULL text → 'und'
    with 0 hits (the old left join). The join form remains the right
    shape for a REAL (unbounded) lexicon table; these inline lexicons
    are literal-sized by design."""
    toks = F.split(F.lower(F.col(text_col)), " ")
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
    return df.select(F.col(id_col), toks.alias("__toks")).select(
        id_col,
        F.when(
            F.col("__toks").isNull() | (best["nh"] == 0), F.lit("und")
        )
        .otherwise(best["lang"])
        .alias("predicted_lang"),
        F.when(F.col("__toks").isNull(), F.lit(0).cast("bigint"))
        .otherwise(-best["nh"])
        .alias("lex_hits"),
    )


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + composite score:

    - n_tokens, n_chars, avg_token_len, stopword_ratio, alpha_ratio
    - score = 0.4·stop_ratio + 0.3·min(avg_len/10, 1) + 0.3·min(n_tokens/100, 1)
    - bucket: high ≥ 0.5 > medium ≥ 0.3 > low

    Integer counts + one fixed double formula → engine-exact.
    ``carry_cols`` ride along on the narrow (per-doc) side of the
    plan — downstream group-wise consumers (e.g. the per-language
    quantile filter) get their key without a second corpus join.
    """
    # r15 (guide §2.4): every aggregate here is a per-document
    # function of the token array — size / filtered size / summed
    # lengths — so the previous explode → groupBy → join-back plan
    # (one exchange + a corpus self-join per call) collapses into a
    # row-wise projection with higher-order functions. Exact parity:
    # integer counts are identical, the score stays one double
    # expression over them, and NULL-text docs disappear exactly as
    # the old inner agg join dropped them (explicit filter).
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.split(F.lower(F.col(text_col)), " ")
    out = (
        df.repartition(par)  # small corpora arrive as one parquet split
        .select(
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
            (
                F.length(F.regexp_replace(F.lower(F.col(text_col)), "[a-z]", ""))
            ).cast("bigint").alias("n_nonalpha"),
            toks.alias("__toks"),
        )
        .filter(F.col("__toks").isNotNull())
        .select(
            "*",
            F.size("__toks").cast("bigint").alias("n_tokens"),
            F.size(F.filter(F.col("__toks"), lambda x: x.isin(*STOPWORDS_EN)))
            .cast("bigint")
            .alias("n_stop"),
            F.aggregate(
                "__toks", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
            ).alias("sum_tok_len"),
        )
    )
    # n_tokens ≥ 1 always (split of "" yields [""]), but n_chars can be 0
    # for empty docs — guard the ratio (ANSI mode makes /0 an error)
    avg_len = F.col("sum_tok_len").cast("double") / F.col("n_tokens").cast("double")
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")
    alpha_ratio = F.when(
        F.col("n_chars") > 0,
        (F.col("n_chars") - F.col("n_nonalpha")).cast("double") / F.col("n_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * F.least(avg_len / F.lit(10.0), F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("n_tokens").cast("double") / F.lit(100.0), F.lit(1.0))
    )
    return out.select(
        id_col,
        *carry_cols,
        "n_tokens",
        "n_chars",
        avg_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality_score"),
        F.when(score >= 0.5, "high").when(score >= 0.3, "medium").otherwise("low").alias("quality_bucket"),
    )


# BPE-ish pre-tokenizer regex (GPT-2-style word/number/punct splits,
# restricted to constructs with identical semantics in Java regex and
# RE2 so the differential oracle replays it)
BPE_REGEX = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, a BPE-ish regex
    pre-tokenizer count (word/number/punct runs with leading-space
    merge, à la GPT-2), a ⌈len/4⌉ subword estimate, and
    distinct-token count. All integers."""
    # r15 (guide §2.4): same row-wise collapse as quality_score — the
    # distinct-token count is size(array_distinct(tokens)), so the
    # explode + groupBy(+count_distinct Expand) + self-join plan is a
    # shuffle-free projection. NULL-text docs drop exactly as the old
    # inner join dropped them.
    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    toks = F.split(F.lower(F.col(text_col)), " ")
    return (
        df.repartition(par)
        .select(F.col(id_col), toks.alias("__toks"), F.col(text_col))
        .filter(F.col("__toks").isNotNull())
        .select(
            id_col,
            F.size("__toks").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("__toks"))
            .cast("bigint")
            .alias("n_distinct_tokens"),
            F.aggregate(
                "__toks",
                F.lit(0).cast("bigint"),
                lambda acc, x: acc
                + F.ceil(F.length(x).cast("double") / F.lit(4.0)).cast("bigint"),
            ).alias("n_subword_est"),
            F.size(
                F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_REGEX}', 0)")
            ).cast("bigint").alias("n_bpe_tokens"),
        )
    )


ROLLING_PRIME = 2147483647  # 2^31 - 1; keeps acc*31 + x inside int64
ROLLING_BASE = 31


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints, two flavors:

    - ``fingerprint``: md5 over the sorted distinct token set
      (order/duplication-insensitive — catches shuffled docs);
    - ``rolling_hash``: polynomial rolling hash over the token stream
      (order-SENSITIVE — left fold acc·B + h(tok) mod P, exact int64
      arithmetic, sequential and engine-reproducible).

    Returns both plus how many docs share the set-fingerprint."""
    canon = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split(F.lower(F.col(text_col)), " "))), " ")
    )
    rolling = F.expr(
        f"aggregate(transform(split(lower({text_col}), ' '),"
        f" t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)),"
        f" 0L, (a, x) -> (a * {ROLLING_BASE} + x % {ROLLING_PRIME}) % {ROLLING_PRIME})"
    )
    fp = df.select(F.col(id_col), canon.alias("fingerprint"), rolling.alias("rolling_hash"))
    counts = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n_docs_sharing"))
    return fp.join(counts, "fingerprint").select(
        id_col, "fingerprint", "rolling_hash", "n_docs_sharing"
    )


# PII patterns restricted to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB) so the differential oracle can
# replay the scrub bit-for-bit. Scrub order matters: emails first
# (their local part may contain digits), then IPs (dotted digit runs),
# then phones (digit runs with one separator).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII redaction for training corpora: replace emails / IPv4
    addresses / phone-shaped digit runs with typed placeholder tokens
    and report per-category match counts.

    Pure ``regexp_replace``/``regexp_count`` projections — one narrow
    pass inside whole-stage codegen, no shuffle at all; the scan
    pushes down to the source. Counts are taken on the ORIGINAL text
    (before any replacement) so categories count independently.

    Returns (id, n_emails, n_ipv4, n_phones, n_pii, scrubbed_md5,
    scrubbed_len). The scrubbed text itself stays an internal column —
    callers wanting it use :data:`PII_PATTERNS` directly; the md5 keeps
    differential verification exact without shipping megabytes."""
    t = F.col(text_col)
    scrubbed = t
    for _name, pat, tok in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, tok)
    n_emails = F.regexp_count(t, F.lit(PII_PATTERNS[0][1])).cast("bigint")
    n_ipv4 = F.regexp_count(t, F.lit(PII_PATTERNS[1][1])).cast("bigint")
    n_phones = F.regexp_count(t, F.lit(PII_PATTERNS[2][1])).cast("bigint")
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        (n_emails + n_ipv4 + n_phones).alias("n_pii"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_bigram_frac: float = 0.10,
    min_distinct_frac: float = 0.30,
) -> DataFrame:
    """Repetition-based quality filtering (the Gopher/MassiveText
    repetition rules, adapted to unstructured token streams): flag
    documents dominated by a repeated token or bigram — boilerplate,
    keyword stuffing, and generation loops all surface here before any
    model ever sees them.

    Per document:
    - ``n_tokens``, ``n_distinct_tokens``, ``distinct_frac``
    - ``top_token`` + ``top_token_frac`` — most frequent token's share
      (ties break lexicographically ascending — deterministic)
    - ``top_bigram`` + ``top_bigram_frac`` — most frequent adjacent
      word pair's share of all bigrams (single-token docs have no
      bigrams: null / 0.0)
    - ``repetitive`` — top_bigram_frac > ``max_top_bigram_frac`` OR
      distinct_frac < ``min_distinct_frac``

    Scale shape (r15, guide §2.4): the frequency table of a SINGLE
    document is a per-row computation, so both explode→groupBy→
    rank-window passes collapse into one row-wise projection — the
    mode (tie → lexicographically lowest) is a linear run-scan over
    the SORTED term array: runs of equal terms are adjacent, a
    strictly-longer run replaces the best (so ties keep the earlier
    = smaller term, exactly the old (c DESC, term ASC) row_number).
    All integer counts plus final double divisions, engine-exact. No
    UDFs; everything stays in whole-stage codegen, zero exchanges
    beyond the fan-out repartition.
    """

    def _mode(arr: str):
        # run-scan over array_sort(arr): (best term, its count)
        run = "IF(a.prev IS NOT NULL AND x = a.prev, a.run + 1L, 1L)"
        return F.expr(
            f"aggregate(array_sort({arr}), "
            f"struct(cast(null as string) as prev, 0L as run, "
            f"cast(null as string) as best, 0L as bestc), "
            f"(a, x) -> named_struct("
            f"'prev', x, "
            f"'run', {run}, "
            f"'best', IF({run} > a.bestc, x, a.best), "
            f"'bestc', greatest({run}, a.bestc)), "
            f"a -> struct(a.best as term, a.bestc as c))"
        )

    par = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        df.repartition(par)
        .select(
            F.col(id_col), F.split(F.lower(F.col(text_col)), " ").alias("__toks")
        )
        .filter(F.col("__toks").isNotNull())
    )
    # IF guard, not greatest(n-1, 0): Spark's sequence(1, 0) DESCENDS
    # instead of yielding [] (same gotcha dsir_importance documents)
    bigrams = F.expr(
        "IF(size(__toks) < 2, array(), "
        "transform(sequence(1, size(__toks) - 1), "
        "i -> concat_ws(' ', slice(__toks, i, 2))))"
    )
    out = (
        d.select(F.col(id_col), F.col("__toks"), bigrams.alias("__bg"))
        .select(
            F.col(id_col),
            F.size("__toks").cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct("__toks"))
            .cast("bigint")
            .alias("n_distinct_tokens"),
            _mode("__toks")["term"].alias("top_token"),
            _mode("__toks")["c"].alias("top_token_c"),
            F.when(
                F.size("__toks") >= 2, (F.size("__toks") - 1).cast("bigint")
            ).alias("n_bigrams"),
            F.when(F.size("__toks") >= 2, _mode("__bg")["term"]).alias(
                "top_bigram"
            ),
            F.when(F.size("__toks") >= 2, _mode("__bg")["c"]).alias(
                "top_bigram_c"
            ),
        )
    )
    distinct_frac = (
        F.col("n_distinct_tokens").cast("double") / F.col("n_tokens").cast("double")
    )
    top_token_frac = F.col("top_token_c").cast("double") / F.col("n_tokens").cast("double")
    top_bigram_frac = F.when(
        F.col("n_bigrams").isNotNull(),
        F.col("top_bigram_c").cast("double") / F.col("n_bigrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        "n_tokens",
        "n_distinct_tokens",
        distinct_frac.alias("distinct_frac"),
        "top_token",
        top_token_frac.alias("top_token_frac"),
        "top_bigram",
        top_bigram_frac.alias("top_bigram_frac"),
        (
            (top_bigram_frac > F.lit(max_top_bigram_frac))
            | (distinct_frac < F.lit(min_distinct_frac))
        ).alias("repetitive"),
    )


def grouped_zscore(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group z-score normalization — the DEFAULT, pure-JVM form:
    one partial-aggregated group pass for exact decimal moments, then
    a broadcast join applying one fixed double formula
    var = (sumsq − sum²/n)/(n−1), z = (v − sum/n)/sqrt(var).

    Everything stays inside whole-stage codegen: the only shuffle is
    the tiny per-group aggregate, and no group ever has to fit in one
    task's memory (the ``applyInPandas`` variant below concentrates
    each group into a single pandas partition — a hot group OOMs at
    scale, which is why it is the exemplar, not the default).

    Determinism contract: moments come from EXACT decimal(18,2) sums
    (order-independent), so an engine replaying the same formula gets
    identical doubles — the DuckDB oracle does exactly that.
    """
    dec = F.col(value_col).cast("decimal(18,2)")
    g = df.groupBy(group_col).agg(
        F.sum(dec).cast("double").alias("_s"),
        F.sum(dec * dec).cast("double").alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    s, sq, n = F.col("_s"), F.col("_sq"), F.col("_n")
    var = (sq - s * s / n) / (n - 1)
    # var NULL (decimal-sum overflow in a non-ANSI session; ANSI — the
    # engine default — raises instead) propagates as NULL, never as a
    # silent fake z=0.0; 0.0 is reserved for genuine var<=0 / n==1
    z = (
        F.when((n > 1) & (var > 0), (F.col(value_col) - s / n) / F.sqrt(var))
        .when((n == 1) | (var <= 0), F.lit(0.0))
    )
    return (
        df.select(id_col, group_col, value_col)
        .join(F.broadcast(g), group_col)
        .select(id_col, group_col, value_col, z.alias("zscore"))
    )


def grouped_zscore_pandas(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Grouped-map ``applyInPandas`` exemplar of the same operator —
    completes the pandas-API triple (mapInPandas in multimodal,
    applyInPandasWithState in streaming, grouped map here). Produces
    bitwise-identical z-scores to :func:`grouped_zscore`; prefer the
    default for production (no one-group-one-partition constraint).

    Determinism contract: mean/variance are computed from EXACT
    decimal sums inside the pandas function (Decimal over the 2-dp
    values — order-independent), then the same fixed double formula.
    """
    import math
    from decimal import Decimal

    import pandas as pd

    schema = f"{id_col} long, {group_col} string, {value_col} double, zscore double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = [Decimal(str(v)).quantize(Decimal("0.0001")) for v in pdf[value_col]]
        n = len(vals)
        s = float(sum(vals))
        sq = float(sum(v * v for v in vals))
        mean = s / n
        if n > 1:
            var = (sq - (s * s) / n) / (n - 1)
            std = math.sqrt(var) if var > 0 else 0.0
        else:
            std = 0.0
        z = [(float(v) - mean) / std if std > 0 else 0.0 for v in vals]
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                group_col: pdf[group_col],
                value_col: pdf[value_col],
                "zscore": z,
            }
        )

    return df.select(id_col, group_col, value_col).groupBy(group_col).applyInPandas(
        per_group, schema=schema
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 500,
    overlap: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking (the RAG / context-window prep
    staple): fixed-size character chunks with ``overlap`` characters
    shared between neighbors. One row per chunk:
    (id, chunk_id, chunk_start, chunk_text, n_chunks).

    stride = chunk_chars − overlap; n_chunks = ceil((len − overlap) /
    stride), minimum 1, so the final chunk always reaches the end of
    the document (it may be shorter than chunk_chars; no padding).
    Pure JVM: sequence → explode → substring — the explode fan-out is
    len/stride rows per doc, the same linear blow-up a tokenizer
    produces, and chunks flow straight into the dedup / packing /
    embedding stages without re-reading the source."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    # NULL text → one empty chunk (not zero rows): length(NULL) would
    # NULL the sequence bound and explode would silently DROP the doc,
    # diverging from engines whose greatest() skips NULLs (ADVICE r04)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n = F.greatest(
        F.lit(1),
        F.ceil((F.length(txt) - F.lit(overlap)) / F.lit(stride)),
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            txt.alias(text_col),
            F.explode(F.sequence(F.lit(0), n - 1)).alias("chunk_id"),
            n.alias("n_chunks"),
        )
        .select(
            id_col,
            "chunk_id",
            (F.col("chunk_id") * stride + 1).alias("chunk_start"),
            F.substring(
                F.col(text_col), F.col("chunk_id") * stride + 1, chunk_chars
            ).alias("chunk_text"),
            "n_chunks",
        )
    )


# deterministic screening lexicon — a stand-in for model-based safety
# classifiers (not shippable in this image); the MECHANISM (lexicon
# broadcast, token-share scoring, threshold flag) is what a corpus
# screen needs, and a real deployment swaps the word list
FLAGGED_TERMS = (
    "damn", "hell", "crap", "idiot", "stupid", "hate",
    "kill", "die", "dumb", "moron",
)


def flagged_term_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: tuple[str, ...] = FLAGGED_TERMS,
    flag_threshold: float = 0.01,
) -> DataFrame:
    """Lexicon screening: per document, the count and token-share of
    flagged terms plus a threshold flag — the shape of every
    blocklist/safety screen in a corpus pipeline. Pure built-ins: one
    tokenize pass, `array_contains`-free (the lexicon is spliced as a
    literal array and probed via `arrays_overlap`-style filter on the
    exploded tokens — map-side only, no join, no UDF)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    lex = F.array(*[F.lit(t) for t in terms])
    flagged = F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))
    n = F.size(toks)
    share = F.when(n > 0, flagged.cast("double") / n.cast("double")).otherwise(0.0)
    return df.select(
        id_col,
        flagged.cast("bigint").alias("n_flagged"),
        n.cast("bigint").alias("n_tokens"),
        share.alias("flagged_share"),
        (share > flag_threshold).alias("flagged"),
    )


# the Gopher rules' required-stopword set (Rae et al. 2021, table A1:
# a document must contain at least 2 of these 8 words)
GOPHER_REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stops: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality filter (the published
    repetition-free subset of Rae et al. 2021's quality rules — the
    repetition rules live in :func:`repetition_stats`):

    1. word count in [min_words, max_words]
    2. mean word length in [min_mean_word_len, max_mean_word_len]
    3. symbol-to-word ratio (``#`` or ``...``) ≤ max_symbol_word_ratio
    4. fraction of lines starting with a bullet ≤ max_bullet_line_frac
    5. fraction of lines ending with an ellipsis ≤ max_ellipsis_line_frac
    6. fraction of words containing an alphabetic char ≥ min_alpha_word_frac
    7. ≥ min_required_stops of the 8 required stop words present

    One map-side pass per document — integer counts + fixed double
    ratios (engine-exact for the differential gate), no shuffle
    beyond the source scan. At 100 TB this is a pure projection:
    predicate-pushdown and column pruning reach the scan untouched.
    """
    words = F.split(F.col(text_col), " ")
    lines = F.split(F.col(text_col), "\n")
    lower = F.lower(F.col(text_col))
    n_words = F.size(words).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    sum_word_len = F.expr(
        f"aggregate(split({text_col}, ' '), 0L, (a, w) -> a + length(w))"
    )
    n_alpha_words = F.expr(
        f"size(filter(split({text_col}, ' '), w -> w rlike '[A-Za-z]'))"
    ).cast("bigint")
    n_symbols = (
        F.size(F.split(F.col(text_col), "#", -1)) - 1
        + F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1
    ).cast("bigint")
    n_bullet_lines = F.expr(
        f"size(filter(split({text_col}, '\\n'), "
        "l -> l rlike '^\\\\s*([-*•]|[0-9]+[.)])\\\\s'))"
    ).cast("bigint")
    n_ellipsis_lines = F.expr(
        f"size(filter(split({text_col}, '\\n'), "
        "l -> l rlike '\\\\.\\\\.\\\\.\\\\s*$'))"
    ).cast("bigint")
    n_req_stops = sum(
        F.when(lower.rlike(rf"(^|[^a-z]){w}([^a-z]|$)"), 1).otherwise(0)
        for w in GOPHER_REQUIRED_STOPS
    ).cast("int")
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        (sum_word_len.cast("double") / n_words.cast("double")).alias(
            "mean_word_len"
        ),
        (n_symbols.cast("double") / n_words.cast("double")).alias(
            "symbol_word_ratio"
        ),
        (n_bullet_lines.cast("double") / n_lines.cast("double")).alias(
            "bullet_line_frac"
        ),
        (n_ellipsis_lines.cast("double") / n_lines.cast("double")).alias(
            "ellipsis_line_frac"
        ),
        (n_alpha_words.cast("double") / n_words.cast("double")).alias(
            "alpha_word_frac"
        ),
        n_req_stops.alias("n_required_stops"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_required_stops") >= min_required_stops)
    )
    return out.withColumn("keep", keep)
