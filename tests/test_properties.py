"""Property-based tests (hypothesis) for the pure layers: dialect
translation and parameter binding must be total and safe on
adversarial inputs — these run on every stored query a user brings,
so they can't assume well-formedness."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ora_ch_spark.functions.dialect import translate_ch_sql
from ora_ch_spark.functions.params import ParamBindError, bind_params
from ora_ch_spark.specs import ParamType, QueryParam

_ident = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True)


@st.composite
def ch_exprs(draw, depth: int = 2):
    """Random nested ClickHouse-ish expressions."""
    if depth == 0:
        return draw(_ident)
    inner = draw(ch_exprs(depth=depth - 1))
    fn = draw(
        st.sampled_from(
            ["toYear", "toString", "toInt32", "parseDateTimeBestEffort", "toFixedString"]
        )
    )
    if fn == "toFixedString":
        return f"{fn}({inner}, {draw(st.integers(1, 1000))})"
    return f"{fn}({inner})"


@given(ch_exprs(depth=3))
@settings(max_examples=200, deadline=None)
def test_dialect_total_and_ch_free(expr):
    """Translation never throws on nested CH calls and leaves no CH
    function name behind."""
    out = translate_ch_sql(f"select {expr} as x from t")
    for fn in ("toYear", "toString", "toInt32", "parseDateTimeBestEffort", "toFixedString"):
        assert not re.search(rf"(?<![A-Za-z0-9_]){fn}\s*\(", out), (expr, out)


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_dialect_idempotent_on_arbitrary_text_without_ch_calls(sql):
    """On text containing no CH function call, translation is the
    identity (modulo nothing — byte-identical)."""
    if re.search(
        r"(?i)(toYear|toYYYYMMDD|parseDateTime|today|toString|toFixedString|"
        r"toInt|toUInt|toFloat|toDecimal|toDate|cityHash64|intDiv)\s*\(",
        sql,
    ) or re.search(r"(?i)\b(final|prewhere|global|any|all)\b", sql) or re.search(
        # r5 session-3 statement rewrites — excluded by their ACTUAL
        # shapes, not bare words, so ordinary LIMIT/format text keeps
        # exercising the identity property
        r"(?is)\blimit\s+\d+.*\bby\b"
        r"|\bwith\s+(fill|totals)\b"
        r"|\bformat\s+[A-Za-z][A-Za-z0-9]*\s*;?\s*$"
        r"|\bsettings\s+[A-Za-z_][A-Za-z0-9_]*\s*="
        r"|\byesterday\s*\(",
        sql,
    ):
        return
    if "[" in sql or "]" in sql or re.search(r"(?i)\bsample\s", sql):
        # r5: array-literal brackets and the SAMPLE clause are CH
        # constructs with translations of their own
        return
    if re.search(r";[\s;]*$", sql):
        # r11: a trailing ';' is the CH statement terminator — it is
        # STRIPPED by design (clause rewrites assume none), so
        # terminator-bearing text is out of the identity scope
        return
    if re.search(r"(?is)\bselect\b.*\bas\b.*\bfrom\b", sql):
        # r10 batch 25: a select-list `AS name` whose name recurs in
        # WHERE/GROUP BY/window forms legitimately inlines (CH alias
        # visibility), so texts shaped like a SELECT with aliases are
        # out of the identity property's scope
        return
    # unbalanced parens inside actual calls can legitimately raise —
    # but with no CH call present, output must equal input
    assert translate_ch_sql(sql) == sql


# ---- round-8 translator fuzz pass (verdict item 8): the masking /
# clause machinery across the WHOLE rewrite stack — no rewrite may
# fire inside a string literal, damage paren balance, or fail to
# reach a fixed point after one application. ----

# payload alphabet deliberately includes every rewrite trigger the
# translator knows, so a literal containing one is maximal bait
_TRIGGER_SNIPPETS = [
    "windowFunnel(10)(ts, a = 1, b = 2)",
    "windowFunnel(10, 'strict_order')(ts, a, b)",
    "sequenceCount('(?1)(?t<5)(?2)')(ts, a, b)",
    "topKWeighted(3)(x, w)",
    "t ARRAY JOIN arr AS v",
    "qualify row_number() over (order by x) = 1",
    "order by k with fill from 1 to 5 interpolate (y as y + 1)",
    "limit 3 by g",
    "group by x with totals",
    "a global not in (select b from u)",
    "position(h, n)",
    "cutQueryString(u)",
    "toStartOfInterval(ts, INTERVAL 15 minute)",
    "dictGet('d', 'x', k)",
    "prewhere x final sample 0.5",
    "with 3 as k select k",
    "[1, 2, 3]",
    "* replace(x + 1 as x)",
    "format('{} {}', a, b)",
    "exponentialMovingAverage(10)(v, t)",
    # r9 triggers
    "dateDiff('month', a, b)",
    "age('quarter', a, b)",
    "toStartOfInterval(ts, INTERVAL 2 month)",
    "toStartOfWeek(d, 1)",
    "arrayMin(x -> x + 1, arr)",
    "JSONExtractInt(j, k)",
    "JSONExtractString(j, 'a', 'b')",
    "sequenceCount('(?1).(?t<5)(?2)')(ts, a, b)",
    "order by k with fill from 0 to 9 step 3 interpolate (y as y + z, z as z)",
    "truncate(x, 2)",
    "bitTestAll(x, 0, 3)",
    "lagInFrame(v, 1, 0) over (order by t rows between unbounded preceding and current row)",
]


@given(
    st.lists(st.sampled_from(_TRIGGER_SNIPPETS), min_size=1, max_size=3),
    st.text(
        alphabet="ab (),'?*->.",  # quote-heavy noise
        max_size=20,
    ),
)
@settings(max_examples=200, deadline=None)
def test_rewrites_never_fire_inside_string_literals(snips, noise):
    """A query whose ONLY trigger text sits inside one string literal
    must come back byte-identical — every rewrite pass operates on
    masked text, so literal contents are untouchable."""
    payload = (" ".join(snips) + noise).replace("'", "''")
    src = f"select '{payload}' as s, col_a from tab_b"
    assert translate_ch_sql(src) == src


@st.composite
def trigger_queries(draw):
    """Small statements combining real clause triggers with random
    identifiers and nesting — the shapes the clause machinery
    actually has to survive."""
    ident = st.from_regex(r"[a-z_][a-z0-9_]{0,6}", fullmatch=True)
    a, b, g = draw(ident), draw(ident), draw(ident)
    body = draw(
        st.sampled_from(
            [
                f"select {a}, count(*) as n from t group by {a} with totals",
                f"select {a} from t order by {a} with fill from 0 to 9 step 2",
                f"select {g}, {a} from t order by {g}, {a} with fill"
                f" interpolate ({b} as {b} + 1)",
                f"select {a}, {b} from t qualify row_number() over"
                f" (order by {a}) = 1",
                f"select {a} from t limit 2 by {g}",
                f"with 3 as {a} select {a}, {b} from t",
                f"select {a} from t where {b} global not in"
                f" (select {g} from u)",
                f"select {g}, windowFunnel(60, 'strict_dedup')({a},"
                f" {b} = 1, {b} = 2) as f from t group by {g}",
                f"select sequenceMatch('(?1)(?t>10)(?2)')({a}, {b} = 1,"
                f" {b} = 2) as m from t",
                f"select {a}, v from (select {a}, arr from s) {b}"
                f" array join arr as v",
                f"select topKWeighted(2)({a}, {b}) as tw from t",
                f"select position({a}, {b}), cutQueryString({g}) from t",
            ]
        )
    )
    if draw(st.booleans()):
        body = f"select * from ({body}) w_{draw(ident)}"
    return body


def _paren_balance_outside_literals(sql: str) -> int:
    from ora_ch_spark.functions.dialect import _mask_strings

    masked, _ = _mask_strings(sql)
    return masked.count("(") - masked.count(")")


@given(trigger_queries())
@settings(max_examples=300, deadline=None)
def test_translation_fixed_point_and_balance(q):
    """One application reaches the fixed point (T∘T = T) and
    translation preserves paren balance outside string literals —
    the two invariants every one of the 3,700 lines of rewrites must
    jointly uphold."""
    once = translate_ch_sql(q)
    assert translate_ch_sql(once) == once, (q, once)
    assert _paren_balance_outside_literals(once) == 0, (q, once)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_mask_unmask_roundtrip(s):
    """_mask_strings/_unmask_strings is the identity on arbitrary
    text — quotes, escapes, half-open literals included."""
    from ora_ch_spark.functions.dialect import _mask_strings, _unmask_strings

    masked, lits = _mask_strings(s)
    assert _unmask_strings(masked, lits) == s


_decl = (
    QueryParam("p_num", ParamType.DECIMAL, 1),
    QueryParam("p_str", ParamType.STRING, 2),
    QueryParam("p_int", ParamType.UINT32, 3),
)


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_string_param_never_escapes_quoting(value):
    """String values can never break out of the SQL literal: the
    spliced literal contains no lone quote."""
    out = bind_params("select {p_str:String} as v", _decl, {"p_str": value})
    m = re.match(r"select '(.*)' as v", out, re.DOTALL)
    assert m is not None
    # every quote inside the literal body must be doubled
    assert re.search(r"(?<!')'(?!')", m.group(1)) is None


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_numeric_params_reject_non_numeric(value):
    """Numeric slots accept only clean numerics — anything else is a
    ParamBindError, never a silent splice."""
    try:
        out = bind_params("where a > {p_num:Decimal(38,6)}", _decl, {"p_num": value})
        # if it spliced, the spliced text must parse back as a decimal
        from decimal import Decimal

        Decimal(out.removeprefix("where a > "))
    except ParamBindError:
        pass  # rejecting is always safe; silent garbage splice is not


# ---- bounded dedup pair spaces (round-2 scale guards) ----

def _synthetic_one_block_corpus(spark, n_docs: int):
    """One giant (lang, source) block where doc 2i+1 is a near-copy
    of doc 2i — the planted-pair corpus for candidate-growth tests.
    Deterministic (md5-derived words, no RNG)."""
    import hashlib

    rows = []
    for i in range(n_docs):
        base = i // 2
        words = [
            hashlib.md5(f"w{base}_{j}".encode()).hexdigest()[:6] for j in range(30)
        ]
        if i % 2 == 1:
            words[-1] += "x"  # near-duplicate of its even partner (s≈0.98)
        rows.append((i, "en", "web", " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, lang string, source string, text string")


def test_ngram_block_routing_candidates_grow_linearly(spark):
    """VERDICT r01 #3: oversized blocks must not cross-join. With the
    LSH route forced (max_block=1), candidate count on a doubled
    planted-pair corpus grows ~2x (linear), nowhere near the ~4x of
    the all-pairs-within-block join."""
    from ora_ch_spark.operators.dedup import ngram_candidate_pairs

    def cands(n_docs):
        df = _synthetic_one_block_corpus(spark, n_docs)
        pairs, arrays = ngram_candidate_pairs(df, max_block=1)
        try:
            return pairs.count()
        finally:
            arrays.unpersist()

    c1, c2 = cands(100), cands(200)
    assert c1 >= 40  # planted pairs are found (50 planted at n=100)
    ratio = c2 / max(c1, 1)
    assert ratio < 3.0, f"candidate growth {ratio:.2f}x looks quadratic"
    # and the routed path still finds the planted near-dups exactly
    from ora_ch_spark.operators.dedup import char_ngram_jaccard_dedup

    hits = char_ngram_jaccard_dedup(
        _synthetic_one_block_corpus(spark, 60), max_block=1, threshold=0.6
    )
    got = {(r.id_a, r.id_b) for r in hits.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(30)}
    # LSH recall at s≈0.98 is 1-(1-s^4)^4 ≈ 0.9998 — allow one miss
    assert len(planted & got) >= len(planted) - 1


def test_ngram_routing_matches_exact_path_on_planted_pairs(spark):
    """Small blocks keep the exact all-pairs result: routing off
    (max_block huge) and on (max_block=1) agree on planted pairs
    above the threshold (LSH recall at s~0.97 is ~1)."""
    from ora_ch_spark.operators.dedup import char_ngram_jaccard_dedup

    df = _synthetic_one_block_corpus(spark, 40)
    exact = {
        (r.id_a, r.id_b)
        for r in char_ngram_jaccard_dedup(df, max_block=10_000).collect()
    }
    routed = {
        (r.id_a, r.id_b) for r in char_ngram_jaccard_dedup(df, max_block=1).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert len(planted & routed) >= len(planted) - 1
    assert routed <= exact  # LSH candidates verified exactly -> no false positives


def test_banded_embedding_lsh_bounds_pair_space(spark, sf_correct):
    """VERDICT r01 #4: banded multi-table LSH must cut the candidate
    pair space far below single-coarse-table blocking while keeping
    (verified) recall: every banded-candidate pair that passes the
    cosine threshold is a true near-dup, and the candidate count obeys
    the b*N^2/2^r bound."""
    from ora_ch_spark.io import load_table
    from ora_ch_spark.operators.similarity import banded_lsh_buckets

    emb = load_table(spark, sf_correct, "embeddings")
    n = emb.count()
    bb = banded_lsh_buckets(emb, n_tables=4, planes_per_table=6).persist()
    from pyspark.sql import functions as F

    cand = (
        bb.selectExpr("vec_id as id_a", "tbl", "bucket")
        .join(bb.selectExpr("vec_id as id_b", "tbl as tbl_b", "bucket as bucket_b"),
              [F.col("tbl") == F.col("tbl_b"), F.col("bucket") == F.col("bucket_b")])
        .filter("id_a < id_b")
        .select("id_a", "id_b")
        .distinct()
        .count()
    )
    bb.unpersist()
    all_pairs = n * (n - 1) // 2
    # 4 tables x 64 buckets: worst-case bound; real data is spread
    assert cand <= 4 * all_pairs // (1 << 6) * 4  # generous constant
    assert cand < all_pairs / 3  # far below quadratic all-pairs


def test_incremental_dedup_cost_scales_with_batch_not_corpus(spark):
    """The incremental screen's pair space is O(batch): holding the
    batch fixed and doubling the CORPUS must not blow up the
    candidate count the way corpus-self-dedup would (corpus-internal
    pairs never form), and every planted batch near-dup of a corpus
    doc is found."""
    from ora_ch_spark.operators.dedup import incremental_minhash_dedup

    def corpus_batch(n_corpus: int):
        corpus = _synthetic_one_block_corpus(spark, n_corpus).filter("doc_id % 2 = 0")
        # batch: near-copies of the first 10 even docs, under new ids
        batch = (
            _synthetic_one_block_corpus(spark, 20)
            .filter("doc_id % 2 = 1")
            .selectExpr("doc_id + 100000 as doc_id", "lang", "source", "text")
        )
        return corpus, batch

    c1, b1 = corpus_batch(100)
    out1 = incremental_minhash_dedup(c1, b1).collect()
    near1 = [r for r in out1 if r.verdict == "near"]
    assert len(near1) >= 9  # 10 planted (LSH recall at s≈0.98 → allow one miss)

    c2, b2 = corpus_batch(200)
    out2 = incremental_minhash_dedup(c2, b2).collect()
    # same batch → same output cardinality regardless of corpus size
    assert len(out2) == len(out1) == 10
    near2 = [r for r in out2 if r.verdict == "near"]
    assert len(near2) >= 9
    # near_dup_of points into the corpus, batch ids never appear there
    assert all(r.near_dup_of is None or r.near_dup_of < 100000 for r in out2)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_zone_map_parser_total_on_arbitrary_text(pred):
    """The zone-map predicate parser runs on every user-supplied
    delete filter: it must never raise — only parse (list) or refuse
    (None), and anything it parses must be a clean conjunction."""
    from ora_ch_spark.store import _parse_simple_conjunction

    out = _parse_simple_conjunction(pred)
    if out is not None:
        assert all(len(c) == 3 and c[1] in (">=", "<=", "=", "<", ">") for c in out)


def test_winnowed_substring_pairs_subset_of_every_position(spark):
    """Winnowed fingerprints are a per-doc subset of the full window-
    hash set, so shared counts can only shrink: every winnowed pair
    must also be found by the exhaustive (winnow=1) form, and planted
    long duplications survive winnowing (the recall contract)."""
    import hashlib

    from ora_ch_spark.operators.dedup import substring_dedup

    shared = " ".join(
        hashlib.md5(f"s{j}".encode()).hexdigest()[:6] for j in range(40)
    )  # ~280 chars — far above window + winnow*min_shared - 1
    rows = []
    for i in range(30):
        own = " ".join(
            hashlib.md5(f"d{i}_{j}".encode()).hexdigest()[:6] for j in range(40)
        )
        text = own + (" " + shared if i < 6 else "")
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    winnowed = {
        (r.id_a, r.id_b) for r in substring_dedup(df, winnow=8).collect()
    }
    full = {(r.id_a, r.id_b) for r in substring_dedup(df, winnow=1).collect()}
    planted = {(a, b) for a in range(6) for b in range(6) if a < b}
    assert winnowed <= full, "winnowing must never invent a pair"
    assert planted <= winnowed, "long planted duplication lost by winnowing"
    assert planted <= full


def test_mixture_sample_hits_exact_ratio_and_is_maximal(spark):
    """The sample's per-group counts follow t_g = floor(T*w_g/W) with
    T the feasible max — and growing T by one group-unit would
    overdraw some group."""
    from ora_ch_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i < 60 else ("b" if i < 160 else "c")) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    weights = {"a": 3, "b": 1, "c": 4}  # a is the binding group: T=160
    out = mixture_sample(df, weights, group_col="grp").groupBy("grp").count()
    got = {r["grp"]: r["count"] for r in out.collect()}
    W = sum(weights.values())
    n = {"a": 60, "b": 100, "c": 240}
    T = min(n[g] * W // w for g, w in weights.items())
    assert got == {g: T * w // W for g, w in weights.items()}
    assert any(
        (T + W) * w // W > n[g] for g, w in weights.items()
    ), "T must be maximal"


def test_weighted_sample_overrepresents_heavy_rows_and_is_deterministic(spark):
    from ora_ch_spark.operators.sampling import weighted_sample

    # 500 rows, half weight 1, half weight 5 → heavy rows should take
    # well over half of a 100-row draw (expected ~83%)
    df = spark.createDataFrame(
        [(i, 5 if i % 2 == 0 else 1) for i in range(500)],
        "doc_id bigint, weight int",
    )
    a = weighted_sample(df, n=100).collect()
    b = weighted_sample(df, n=100).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    heavy = sum(1 for r in a if r["weight"] == 5)
    assert heavy > 65


def test_weighted_sample_excludes_nonpositive_weights(spark):
    """weight < 1 = never draw — and must not trip Spark's
    negative-step sequence inference into replicating the row."""
    from ora_ch_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, 2)], "doc_id bigint, weight int"
    )
    got = weighted_sample(df, n=10).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_mixture_sample_rejects_bad_weights(spark):
    import pytest as _pytest

    from ora_ch_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, grp string")
    for bad in ({}, {"a": 0}, {"a": -1}):
        with _pytest.raises(ValueError):
            mixture_sample(df, bad, group_col="grp")


def test_incremental_view_partitioned_source_full_recomputes(spark, tmp_path):
    """Hive-partitioned sources must take the full-recompute path —
    a delta read via read_files would lose the partition column."""
    from pyspark.sql import functions as F

    from ora_ch_spark.operators.incremental import refresh_agg_view
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "p"), keep_versions=2)
    store.create_database("ch")
    df = spark.range(200).select(
        "id", F.pmod("id", F.lit(3)).alias("k"), (F.col("id") * 1.0).alias("v")
    )
    store.write("ch", "src", df, partition_by=["k"])
    refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    store.append("ch", "src", spark.range(200, 260).select(
        "id", F.pmod("id", F.lit(3)).alias("k"), (F.col("id") * 1.0).alias("v")))
    out = refresh_agg_view(store, ("ch", "src"), ("ch", "agg"), ["k"], "v")
    got = {r["k"]: r["n_rows"] for r in out.collect()}
    assert got == {0: 87, 1: 87, 2: 86}


# ---- pure-python properties of the round-4 primitives ----

from ora_ch_spark.store import (  # noqa: E402
    _bloom_build,
    _bloom_might_contain,
)


@given(
    st.sets(st.text(min_size=0, max_size=30), max_size=200),
    st.text(min_size=1, max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_bloom_no_false_negatives(values, probe):
    """A Bloom filter may lie about presence, NEVER about absence:
    every inserted value must test positive."""
    bloom = _bloom_build(values)
    for v in values:
        assert _bloom_might_contain(bloom, v)
    # absent values are ALLOWED to collide; just exercise the probe
    _bloom_might_contain(bloom, probe)


@given(st.sets(st.text(min_size=1, max_size=20), min_size=50, max_size=300))
@settings(max_examples=50, deadline=None)
def test_bloom_false_positive_rate_sane(values):
    """With ~10 bits/value the FP rate stays far from saturation."""
    bloom = _bloom_build(values)
    fp = sum(
        _bloom_might_contain(bloom, f"__absent_{i}__###") for i in range(200)
    )
    assert fp <= 40  # ≤20% even at the worst draw; design point ~1%


@given(
    st.text(alphabet=st.characters(codec="ascii"), min_size=0, max_size=400),
    st.integers(2, 50),
    st.integers(0, 30),
)
@settings(max_examples=100, deadline=None)
def test_chunk_arithmetic_covers_every_position(text, chunk, overlap):
    """The chunk-count formula must tile the whole document: python
    replay of the SQL arithmetic shows full coverage and correct
    overlap for every (len, chunk, overlap) combination."""
    from hypothesis import assume

    assume(overlap < chunk)
    stride = chunk - overlap
    import math

    n = max(1, math.ceil((len(text) - overlap) / stride))
    spans = [(i * stride, min(i * stride + chunk, len(text))) for i in range(n)]
    # full coverage: last chunk reaches the end; no gaps between spans
    assert spans[-1][1] == len(text) or len(text) == 0
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 <= e1  # no gap (overlap ≥ 0 by construction)


def test_salted_band_self_join_equals_plain(spark):
    """Triangle-blocked band self-join (hot-band salting): with a
    PLANTED hot band — many near-identical boilerplate docs sharing
    every band key — the salted pair set must equal the plain path's
    exactly, and the physical join must carry the block columns so
    the hot band's pairs spread over B(B+1)/2 reducers instead of 1
    (VERDICT r04 item 7)."""
    from pyspark.sql import functions as F

    from ora_ch_spark.operators.dedup import minhash_lsh_dedup

    # 60 copies of the same boilerplate (one pathological band
    # population) + distinct chatter docs
    boiler = [(i, "terms of service apply to all content on this site") for i in range(60)]
    chatter = [(100 + i, f"unique document number {i} about topic {i * 7}") for i in range(20)]
    docs = spark.createDataFrame(boiler + chatter, "doc_id bigint, text string")
    plain = minhash_lsh_dedup(docs)
    salted = minhash_lsh_dedup(docs, salt_buckets=4)
    p = {(r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in plain.collect()}
    s = {(r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in salted.collect()}
    assert p == s and len(p) >= 60 * 59 // 2  # full boiler clique found
    # plan assertion: the candidate join keys include the block pair
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__bi" in plan and "__bj" in plan
    assert "__bi" not in plain._jdf.queryExecution().executedPlan().toString()


def test_auto_salt_trigger_flips_on_hot_band(spark):
    """r6 verdict item 7: ``salt_buckets="auto"`` wires the
    key_skew_report trigger into the LSH dedup — a healthy corpus
    must NOT salt (no replication cost paid), a PLANTED hot band must
    flip the trigger, and the pair set is unchanged either way."""
    from ora_ch_spark.operators.dedup import (
        auto_salt_buckets,
        minhash_lsh_dedup,
        packed_band_keys,
        rowwise_minhash_cols,
        shingle_hash_arrays,
    )
    from pyspark.sql import functions as F

    def band_table(docs):
        arr = shingle_hash_arrays(docs, "doc_id", "text", 3)
        sig = arr.select(F.col("doc_id"), *rowwise_minhash_cols("sharr", 16))
        bb = sig.select(
            "doc_id", F.explode(F.array(*packed_band_keys(16, 4))).alias("e")
        ).select("doc_id", "e.band", "e.k0", "e.k1")
        return bb, ["band", "k0", "k1"]

    chatter = [
        (i, f"unique document number {i} about topic {i * 7} and item {i * 13}")
        for i in range(80)
    ]
    healthy = spark.createDataFrame(chatter, "doc_id bigint, text string")
    bb, keys = band_table(healthy)
    assert auto_salt_buckets(bb, keys) is None
    # plant a hot band: 300 identical boilerplate docs share EVERY
    # band key → cnt=300 ≥ the absolute floor, skew ratio ≫ threshold
    boiler = [
        (1000 + i, "terms of service apply to all content on this site")
        for i in range(300)
    ]
    hot = spark.createDataFrame(boiler + chatter, "doc_id bigint, text string")
    bbh, keysh = band_table(hot)
    b = auto_salt_buckets(bbh, keysh)
    assert b is not None and 2 <= b <= 16
    # end-to-end: auto (salted) ≡ plain — the trigger changes the
    # plan, never the result
    plain = minhash_lsh_dedup(hot)
    auto = minhash_lsh_dedup(hot, salt_buckets="auto")
    p = {(r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in plain.collect()}
    a = {(r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in auto.collect()}
    assert p == a and len(p) >= 300 * 299 // 2
    # the auto path really salted: block columns in the physical plan
    assert "__bi" in auto._jdf.queryExecution().executedPlan().toString()


def test_temperature_mixture_flattens_distribution(spark):
    """T=2 rebalancing: the minority group's share of the sample
    strictly exceeds its natural share (sqrt-proportional targets),
    selection is deterministic, and T<=0 is rejected."""
    import pytest

    from ora_ch_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, "en" if i < 900 else "sw", "web") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, source string")
    got = temperature_mixture_sample(docs, temperature=2.0).collect()
    n_sw = sum(1 for r in got if r["lang"] == "sw")
    assert len(got) > 0
    # natural share of sw is 10%; sqrt weights give 900^.5 : 100^.5 = 3:1 → 25%
    assert n_sw / len(got) > 0.2
    # deterministic across runs
    again = temperature_mixture_sample(docs, temperature=2.0).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    with pytest.raises(ValueError):
        temperature_mixture_sample(docs, temperature=0)


def test_datediff_age_differential_vs_duckdb(spark):
    """r9 boundary-crossing dateDiff + complete-calendar age: 2,000
    deterministic pseudo-random timestamp pairs (second granularity,
    1995-2005, both argument orders) run through translate_ch_sql on
    Spark AND natively on DuckDB (whose date_diff is itself
    boundary-crossing with Monday weeks, and whose datesub-style
    complete-month fold replays age) — every unit, exact equality."""
    import duckdb

    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    gen = """
      SELECT id,
             timestamp '1995-01-01 00:00:00'
               + make_interval(0, 0, 0, 0, 0, 0, (id * 2654435761) % 315360000) AS a,
             timestamp '1995-01-01 00:00:00'
               + make_interval(0, 0, 0, 0, 0, 0, (id * 40503 + 7919) % 315360000) AS b
      FROM range(2000) r(id)
    """
    units = ["second", "minute", "hour", "day", "week",
             "month", "quarter", "year"]
    ch_cols = ", ".join(
        f"dateDiff('{u}', a, b) as dd_{u}" for u in units
    ) + ", " + ", ".join(f"age('{u}', a, b) as age_{u}" for u in units)
    sdf = {r["id"]: r for r in spark.sql(
        T(f"SELECT id, {ch_cols} FROM ({gen.replace('make_interval(0, 0, 0, 0, 0, 0,', 'make_interval(0, 0, 0, 0, 0, 0,')}) s")
    ).collect()}

    con = duckdb.connect()
    dk_gen = """
      SELECT r.range AS id,
             timestamp '1995-01-01 00:00:00'
               + to_seconds(cast((r.range * 2654435761) % 315360000 as bigint)) AS a,
             timestamp '1995-01-01 00:00:00'
               + to_seconds(cast((r.range * 40503 + 7919) % 315360000 as bigint)) AS b
      FROM range(2000) r
    """
    dd_cols = ", ".join(
        f"date_diff('{u}', a, b) as dd_{u}" for u in units
    )
    # age replay: uniform units = epoch-second grid of COMPLETE units;
    # month family = complete calendar months with (day, time) compare
    fm = ("(CASE WHEN a <= b THEN (year(b)-year(a))*12 + month(b)-month(a)"
          " - (CASE WHEN (day(b), b::time) < (day(a), a::time) THEN 1 ELSE 0 END)"
          " ELSE -((year(a)-year(b))*12 + month(a)-month(b)"
          " - (CASE WHEN (day(a), a::time) < (day(b), b::time) THEN 1 ELSE 0 END)) END)")
    secs = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
            "week": 604800}
    age_cols = ", ".join(
        f"cast(trunc((epoch(b) - epoch(a)) / {s}.0) as bigint) as age_{u}"
        for u, s in secs.items()
    ) + (f", {fm} as age_month, cast(trunc({fm} / 3.0) as bigint) as age_quarter,"
         f" cast(trunc({fm} / 12.0) as bigint) as age_year")
    ddf = {r[0]: r for r in con.execute(
        f"SELECT id, {dd_cols}, {age_cols} FROM ({dk_gen}) s"
    ).fetchall()}
    cols = [f"dd_{u}" for u in units] + [f"age_{u}" for u in units]
    for i in sdf:
        srow, drow = sdf[i], ddf[i]
        for j, c in enumerate(cols, start=1):
            assert int(srow[c]) == int(drow[j]), (
                f"id={i} {c}: spark {srow[c]} vs duckdb {drow[j]}"
            )


def test_stored_suite_texts_reach_fixed_point():
    """Every stored CH text in the TPC-H + window suites is
    translation-idempotent (T∘T = T) and paren-balanced after one
    application — the invariant that keeps re-translation of an
    already-translated stored query harmless."""
    import ora_ch_spark.catalog_tpch as M
    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    texts = [v for k, v in vars(M).items()
             if k.startswith("_Q") and isinstance(v, str)]
    assert len(texts) >= 23
    for sql in texts:
        once = T(sql)
        assert T(once) == once
        assert _paren_balance_outside_literals(once) == 0


def test_week_modes_differential_vs_python(spark):
    """r10 batch 22: toWeek/toYearWeek modes 0/1/2 across 40 years of
    year-boundary dates (every Dec 26 – Jan 8) plus a pseudo-random
    mid-year sample, against an independent Python implementation of
    the MySQL WEEK()/YEARWEEK() rules (first-Sunday / ISO-Monday
    anchors, never-week-0 year adjustment). The MySQL doc examples in
    test_units pin absolute truth on the tricky constants; this pins
    the anchor arithmetic everywhere else (leap years, Jan-1-on-Sunday
    years, the previous-year fallback)."""
    import datetime as dt

    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    def fs(y):
        jan1 = dt.date(y, 1, 1)
        return jan1 + dt.timedelta((6 - jan1.weekday()) % 7)

    def m1(y):
        j4 = dt.date(y, 1, 4)
        return j4 - dt.timedelta(j4.weekday())

    def w0(d):
        f = fs(d.year)
        return (d - f).days // 7 + 1 if d >= f else 0

    def w1(d):
        m = m1(d.year)
        return (d - m).days // 7 + 1 if d >= m else 0

    def w2(d):
        f = fs(d.year)
        if d >= f:
            return (d - f).days // 7 + 1
        return (d - fs(d.year - 1)).days // 7 + 1

    def y0(d):
        f = fs(d.year)
        if d >= f:
            return d.year * 100 + (d - f).days // 7 + 1
        return (d.year - 1) * 100 + (d - fs(d.year - 1)).days // 7 + 1

    def y1(d):
        iso = d.isocalendar()
        return iso[0] * 100 + iso[1]

    dates = []
    for y in range(1970, 2010):
        for day in list(range(26, 32)) + list(range(1, 9)):
            m = 12 if day >= 26 else 1
            yy = y if day >= 26 else y + 1
            dates.append(dt.date(yy, m, day))
    for i in range(400):  # deterministic mid-year scatter
        dates.append(dt.date(1970, 1, 1)
                     + dt.timedelta((i * 2654435761) % 25000))
    dates = sorted(set(dates))

    def calc_week(d, mode):
        # independent port of MySQL my-time.cc calc_week() + the
        # week_mode() FIRST_WEEKDAY flip for Sunday-first modes —
        # the actual engine algorithm, vs the translator's
        # anchor-date formulas (r10 batch 26: modes 4-7)
        wb = mode & 7
        if not (wb & 1):
            wb ^= 4
        monday_first = wb & 1
        week_year = bool(wb & 2)
        first_weekday = wb & 4
        daynr = d.toordinal()
        first_daynr = dt.date(d.year, 1, 1).toordinal()
        wd_mon = dt.date(d.year, 1, 1).weekday()
        weekday = wd_mon if monday_first else (wd_mon + 1) % 7
        year = d.year

        def diy(y):
            return 366 if (y % 4 == 0 and (y % 100 or y % 400 == 0)
                           ) else 365

        if d.month == 1 and d.day <= 7 - weekday:
            if not week_year and (
                (first_weekday and weekday != 0)
                or (not first_weekday and weekday >= 4)
            ):
                return year, 0
            week_year = True
            year -= 1
            days = diy(year)
            first_daynr -= days
            weekday = (weekday + 53 * 7 - days) % 7
        if (first_weekday and weekday != 0) or (
            not first_weekday and weekday >= 4
        ):
            days = daynr - (first_daynr + (7 - weekday))
        else:
            days = daynr - (first_daynr - weekday)
        if week_year and days >= 52 * 7:
            weekday = (weekday + diy(year)) % 7
            if (not first_weekday and weekday < 4) or (
                first_weekday and weekday == 0
            ):
                return year + 1, 1
        return year, days // 7 + 1

    def wk(d, mode):
        return calc_week(d, mode)[1]

    def yw(d, mode):
        y, w = calc_week(d, (mode & 7) | 2)
        return y * 100 + w

    def nym(d, monday_first):
        # independent port of ClickHouse DateLUTImpl::
        # toYearWeekOfNewyearMode (modes 8/9; r14 adds the source's
        # year reassignment): week 1 is the week containing Jan 1,
        # and the YEAR is the year of the week's LAST day (yw.first
        # = toYear(d + 7 - toDayOfWeek(d + offset))) — a
        # late-December date whose week holds next Jan 1 is week 1
        # of the next year
        wd = d.weekday()  # Mon=0..Sun=6
        last = d + dt.timedelta((6 - wd) if monday_first else (5 - wd) % 7)
        year = last.year
        jan1 = dt.date(year, 1, 1)
        wd1 = jan1.weekday()
        off = wd1 if monday_first else (wd1 + 1) % 7
        anchor = jan1 - dt.timedelta(off)
        return year, (d - anchor).days // 7 + 1

    rows = [(i, d) for i, d in enumerate(dates)]
    spark.createDataFrame(rows, "i int, d date").createOrReplaceTempView(
        "wk_fuzz"
    )
    got = {r["i"]: r for r in spark.sql(T(
        "select i, toWeek(d) w0, toWeek(d, 1) w1, toWeek(d, 2) w2, "
        "toYearWeek(d) y0, toYearWeek(d, 1) y1, toYearWeek(d, 2) y2, "
        "toWeek(d, 4) w4, toWeek(d, 5) w5, toWeek(d, 6) w6, "
        "toWeek(d, 7) w7, toYearWeek(d, 4) y4, toYearWeek(d, 5) y5, "
        "toYearWeek(d, 6) y6, toYearWeek(d, 7) y7, "
        "toWeek(d, 8) w8, toWeek(d, 9) w9, "
        "toYearWeek(d, 8) y8, toYearWeek(d, 9) y9 "
        "from wk_fuzz"
    )).collect()}
    for i, d in rows:
        r = got[i]
        exp = (w0(d), w1(d), w2(d), y0(d), y1(d), y0(d))
        act = (r["w0"], r["w1"], r["w2"], r["y0"], r["y1"], r["y2"])
        assert act == exp, f"{d}: {act} != {exp}"
        # the anchor-formula refs above double-check calc_week on
        # modes 0-2; calc_week alone is the reference for 4-7
        assert (w0(d), w1(d), w2(d)) == (wk(d, 0), wk(d, 1), wk(d, 2))
        exp47 = (wk(d, 4), wk(d, 5), wk(d, 6), wk(d, 7),
                 yw(d, 4), yw(d, 5), yw(d, 6), yw(d, 7))
        act47 = (r["w4"], r["w5"], r["w6"], r["w7"],
                 r["y4"], r["y5"], r["y6"], r["y7"])
        assert act47 == exp47, f"{d}: {act47} != {exp47}"
        y8, w8 = nym(d, False)
        y9, w9 = nym(d, True)
        act89 = (r["w8"], r["w9"], r["y8"], r["y9"])
        assert act89 == (w8, w9, y8 * 100 + w8, y9 * 100 + w9), (
            f"{d}: {act89}"
        )
        # with the year roll the documented 1-53 range holds: the
        # dates that would hit 54 under a never-rolling anchor
        # (Dec 29-31 of a leap year starting Saturday) are exactly
        # the ones whose week holds next Jan 1 → week 1
        assert 1 <= w8 <= 53 and 1 <= w9 <= 53


def test_byte_string_semantics_differential_vs_python(spark):
    """r10 batch 23: length/position/left/right/pads in BYTES and
    ASCII-only upper/lower, against Python's own UTF-8 byte ops — a
    fully independent oracle. Strings mix 1-, 2-, 3- and 4-byte code
    points; byte cut points are CHOSEN on code-point boundaries (the
    mid-codepoint decode drift is documented, not contract)."""
    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    samples = [
        "hello world", "Привет мир", "aПбРв", "日本語テキスト",
        "mix日ed Тext", "emoji 🎉 tail", "x", "", "ASCII-only-123",
        "ЁёЙй тест", "tab\tand space", "ПРИВЕТ WORLD привет world",
    ]
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    a_upper = lambda s: "".join(
        c.upper() if c in lo else c for c in s)
    a_lower = lambda s: "".join(
        c.lower() if c in up else c for c in s)

    def bpos(s, n, start=1):
        b, nb = s.encode(), n.encode()
        i = b.find(nb, start - 1)
        return 0 if i < 0 else i + 1

    def bleft(s, n):
        b = s.encode()
        keep = n if n >= 0 else max(len(b) + n, 0)
        return b[:keep].decode()

    def bright(s, n):
        b = s.encode()
        return (b[max(len(b) - n, 0):] if n >= 0 else b[-n:]).decode()

    def bpad(s, n, p, left):
        b, pb = s.encode(), p.encode()
        if len(b) >= n:
            return b[:n].decode()
        fill = (pb * n)[: n - len(b)]
        return (fill + b).decode() if left else (b + fill).decode()

    rows, exp = [], []
    for i, s in enumerate(samples):
        blen = len(s.encode())
        # boundary-aligned byte counts: prefix lengths of the string
        cuts = sorted({len(s[:k].encode()) for k in range(len(s) + 1)})
        nl = cuts[len(cuts) // 2]          # a mid boundary
        nr = cuts[max(len(cuts) - 2, 0)]   # near-full boundary
        needle = s[len(s) // 3: len(s) // 3 + 2] or "z"
        rows.append((i, s, needle, nl, nr))
        e = {
            "blen": blen,
            "p1": bpos(s, needle),
            "p2": bpos(s, needle, nl + 1) if nl < blen else 0,
            "up": a_upper(s), "lo": a_lower(s),
            "lf": bleft(s, nl), "lfn": bleft(s, nl - blen),
            "rt": bright(s, blen - nl), "rtn": bright(s, -nl),
        }
        if blen <= 20 or 20 in cuts:
            # pad truncation at byte 20 only asserted when it lands
            # on a code-point boundary (mid-codepoint decode is the
            # DOCUMENTED drift, not contract)
            e["lp"] = bpad(s, 20, "*", True)
            e["rp"] = bpad(s, 20, "*", False)
        exp.append(e)

    spark.createDataFrame(
        rows, "i int, s string, n string, nl int, nr int"
    ).createOrReplaceTempView("bs_fuzz")
    got = {r["i"]: r for r in spark.sql(T(
        "select i, length(s) blen, position(s, n) p1, "
        "if(nl < length(s), position(s, n, nl + 1), 0) p2, "
        "upper(s) up, lower(s) lo, "
        "left(s, nl) lf, left(s, nl - length(s)) lfn, "
        "right(s, length(s) - nl) rt, right(s, -nl) rtn, "
        "leftPad(s, 20, '*') lp, rightPad(s, 20, '*') rp "
        "from bs_fuzz"
    )).collect()}
    for i, s in enumerate(samples):
        r = got[i]
        for k, v in exp[i].items():
            assert r[k] == v, f"{s!r}.{k}: {r[k]!r} != {v!r}"


def test_alias_visibility_differential_vs_duckdb(spark):
    """Batch 25 differential: DuckDB natively resolves SELECT-list
    aliases in WHERE and GROUP BY (when no source column conflicts),
    so on conflict-free names the UNTRANSLATED text runs there while
    Spark needs the inlining pass — both must produce identical rows.
    A bounded grid of alias expressions × clause shapes over a tiny
    integer table; exact value equality."""
    import duckdb

    exprs = [
        "id % 4", "id + 7", "cast(id as double) / 2",
        "abs(id - 9)", "(id * 3) % 5",
    ]
    shapes = [
        # (suffix template, needs_group)
        ("where k > 2", False),
        ("where k > 1 and k < 9", False),
        ("group by k", True),
        ("where k > 0 group by k", True),
    ]
    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    con = duckdb.connect()
    for ex in exprs:
        for suffix, grouped in shapes:
            if grouped:
                sql = (f"select {ex} as k, cast(count(*) as bigint) as n"
                       f" from range(20) {suffix} order by k")
            else:
                sql = (f"select {ex} as k from range(20) {suffix}"
                       f" order by k")
            t = T(sql)
            assert T(t) == t, ("fixed point", sql, t)
            got = [tuple(r) for r in spark.sql(t).collect()]
            want = con.execute(sql.replace(
                "range(20)",
                "(select unnest(range(0, 20)) as id)",
            )).fetchall()
            assert got == want, (sql, t, got[:5], want[:5])


def test_multisearch_differential_vs_python(spark):
    """Batch 28: the 12-form multiSearch position family against a
    Python reference — byte positions on bare forms (UTF-8 encode),
    code-point positions on UTF8 forms, ASCII-only fold on the
    CaseInsensitive forms, full casefold on CaseInsensitiveUTF8.
    Deterministic pseudo-random haystacks mixing 1- and 2-byte code
    points with needle sets that hit, miss, tie and overlap."""
    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    def a_lower(s):
        return "".join(
            (c.lower() if "A" <= c <= "Z" else c) for c in s)

    def char_pos(h, n):
        i = h.find(n)
        return 0 if i < 0 else i + 1

    def byte_pos(h, n):
        i = h.find(n)
        return 0 if i < 0 else len(h[:i].encode()) + 1

    def ref(h, needles, fold, units):
        if fold == "ascii":
            fh, fns = a_lower(h), [a_lower(n) for n in needles]
        elif fold == "utf8":
            fh, fns = h.lower(), [n.lower() for n in needles]
        else:
            fh, fns = h, list(needles)
        pos = byte_pos if units == "byte" else char_pos
        ps = [pos(fh, n) for n in fns]
        nz = [p for p in ps if p > 0]
        first_pos = min(nz) if nz else 0
        first_idx = (ps.index(min(nz)) + 1) if nz else 0
        return ps, first_pos, first_idx

    alphabet = "abcABCпПрР .,x"
    seeds = [(i * 2654435761) % 997 for i in range(12)]
    hays = [
        "".join(alphabet[(s + j * 7) % len(alphabet)] for j in range(24))
        for s in seeds
    ]
    needles = ["ab", "AB", "пр", "ПР", "x", "zz", "c ", "рР"]
    nlist = "[" + ", ".join(f"'{n}'" for n in needles) + "]"
    rows = [(i, h) for i, h in enumerate(hays)]
    spark.createDataFrame(rows, "i int, h string").createOrReplaceTempView(
        "ms_fuzz"
    )
    q = T(
        f"select i, multiSearchAllPositions(h, {nlist}) ap,"
        f" multiSearchAllPositionsUTF8(h, {nlist}) au,"
        f" multiSearchAllPositionsCaseInsensitive(h, {nlist}) ac,"
        f" multiSearchAllPositionsCaseInsensitiveUTF8(h, {nlist}) acu,"
        f" multiSearchFirstPosition(h, {nlist}) fp,"
        f" multiSearchFirstPositionUTF8(h, {nlist}) fu,"
        f" multiSearchFirstPositionCaseInsensitive(h, {nlist}) fc,"
        f" multiSearchFirstIndex(h, {nlist}) xi,"
        f" multiSearchFirstIndexUTF8(h, {nlist}) xu,"
        f" multiSearchFirstIndexCaseInsensitiveUTF8(h, {nlist}) xcu"
        f" from ms_fuzz"
    )
    got = {r["i"]: r for r in spark.sql(q).collect()}
    for i, h in enumerate(hays):
        r = got[i]
        ps_b, fp_b, fi_b = ref(h, needles, None, "byte")
        ps_c, _, fi_c = ref(h, needles, None, "char")
        ps_ab, _, _ = ref(h, needles, "ascii", "byte")
        ps_uc, fp_uc, fi_uc = ref(h, needles, "utf8", "char")
        assert r["ap"] == ps_b, (h, r["ap"], ps_b)
        assert r["au"] == ps_c
        assert r["ac"] == ps_ab
        assert r["acu"] == ps_uc
        assert r["fp"] == fp_b
        assert r["fu"] == ref(h, needles, None, "char")[1]
        assert r["fc"] == ref(h, needles, "ascii", "byte")[1]
        assert (r["xi"], r["xu"], r["xcu"]) == (fi_b, fi_c, fi_uc)


def test_url_codec_differential_vs_urllib(spark):
    """Batch 28 URL codecs against Python's urllib.parse on
    deterministic pseudo-random strings over a hostile alphabet
    (unreserved chars, every patched delta char, unicode, percent
    signs): encodeURLComponent ≡ quote(safe=''),
    encodeURLFormComponent ≡ quote_plus(safe=''),
    decodeURLComponent ≡ unquote ('+' survives),
    decodeURLFormComponent ≡ unquote_plus, and the CH-side
    encode→decode round trip is the identity."""
    import urllib.parse as up

    from ora_ch_spark.functions.dialect import translate_ch_sql as T

    alphabet = "aZ9 +*~%-_.!/?&=#тя"
    strs = [
        "".join(alphabet[(s + j * 11) % len(alphabet)]
                for j in range(1 + (s % 17)))
        for s in [(i * 2654435761) % 991 for i in range(40)]
    ]
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(strs)], "i int, s string"
    ).createOrReplaceTempView("url_fuzz")
    q = T(
        "select i, encodeURLComponent(s) ec, encodeURLFormComponent(s) ef,"
        " decodeURLComponent(encodeURLComponent(s)) rt,"
        " decodeURLFormComponent(encodeURLFormComponent(s)) rtf"
        " from url_fuzz"
    )
    got = {r["i"]: r for r in spark.sql(q).collect()}
    for i, s in enumerate(strs):
        r = got[i]
        assert r["ec"] == up.quote(s, safe=""), (s, r["ec"])
        assert r["ef"] == up.quote_plus(s, safe=""), (s, r["ef"])
        assert r["rt"] == s and r["rtf"] == s, s
    # decode of raw '+' and mixed escapes
    spark.createDataFrame(
        [(0, "a+b%20c%2B+"), (1, "%D1%82est+x")], "i int, s string"
    ).createOrReplaceTempView("url_dec")
    q2 = T("select i, decodeURLComponent(s) dc, decodeURLFormComponent(s)"
           " df from url_dec")
    got2 = {r["i"]: r for r in spark.sql(q2).collect()}
    for i, s in ((0, "a+b%20c%2B+"), (1, "%D1%82est+x")):
        assert got2[i]["dc"] == up.unquote(s), s
        assert got2[i]["df"] == up.unquote_plus(s), s
