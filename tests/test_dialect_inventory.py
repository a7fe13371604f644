"""Dialect-coverage inventory — every function name the sweeps have
adjudicated is pinned to its category, so a regression (a rewrite
accidentally stops firing, or a pass-through silently starts
misfiring) is caught as a category flip:

- ``translated``: translate_ch_sql must CHANGE the call (CH name gone)
- ``native``: must pass through UNCHANGED and resolve in Spark
  natively (case-insensitive function registry)
- ``loud``: must pass through UNCHANGED — no Spark analogue exists /
  semantics cannot be reproduced at text level; Spark then fails
  loudly instead of silently mis-computing
"""

from __future__ import annotations

import re

import pytest

from ora_ch_spark.functions.dialect import translate_ch_sql as T

TRANSLATED = [
    # r9 batch 18/19 + edges
    "toDate32('2020-01-01')", "toDateTime64(x, 3)", "toYearWeek(d, 3)",
    "toStartOfWeek(d)", "toStartOfWeek(d, 1)", "arrayCount(a)",
    "bitTestAny(x, 1, 2)", "bitTestAll(x, 1, 2)", "toTime(t)",
    "negate(x)", "notLike(s, '%a%')", "toInt128(x)", "toUInt256(x)",
    "truncate(x, 2)", "toMillisecond(t)", "YYYYMMDDToDate(x)",
    "YYYYMMDDhhmmssToDateTime(x)", "toDaysSinceYearZero(d)",
    "fromDaysSinceYearZero(x)", "quantileGK(100, 0.5)(x)",
    "quantileInterpolatedWeighted(0.5)(x, w)",
    "positionCaseInsensitiveUTF8(s, 'a')", "toLastDayOfWeek(d)",
    "toLastDayOfWeek(d, 1)", "addQuarters(d, 1)",
    "subtractQuarters(d, 1)", "countDistinctIf(x, c)",
    "anyLastIf(x, c)", "isZeroOrNull(x)", "toBool(x)",
    "arrayZipUnaligned(a, b)", "arrayRandomSample(a, 2)",
    "groupArrayLast(3)(x)", "groupConcat(',')(s)",
    "arrayMin(f -> f + 1, a)", "arraySum(f -> f * 2, a)",
    "dateDiff('month', a, b)", "dateDiff(u, a, b)",
    "age('quarter', a, b)",
    "toStartOfInterval(ts, INTERVAL 2 month)",
    "JSONExtractInt(j, k)", "JSONExtractString(j, 'a', 'b')",
    "quantileBFloat16(0.5)(x)",
    # r10: dynamic NESTED JSON paths (chained per-segment)
    "JSONExtractInt(j, k, 'b')", "JSONExtractString(j, 'a', k)",
    "JSONHas(j, 'a', k)", "JSONHas(j, k, 'b')",
    # long-standing spot checks (one per earlier batch family)
    "toYear(d)", "cityHash64(x)", "sumIf(x, c)", "uniqExact(x)",
    "arrayStringConcat(a, ',')", "positionUTF8(s, 'a')",
    "lagInFrame(x, 1)", "multiIf(c, 1, 2)", "toMonday(d)",
    "covarPop(a, b)", "anyHeavy(x)", "medianExact(x)",
    # r9 batch 20
    "arrayEnumerateDense(a)", "extractTextFromHTML(s)",
    "splitByNonAlpha(s)", "regexpExtract(s, 'p', 1)",
    "hasToken(s, 'tok')", "hasTokenCaseInsensitive(s, 'tok')",
    "countSubstringsCaseInsensitiveUTF8(s, 'a')",
    "arrayFirstOrNull(f -> f > 1, a)", "arrayLastOrNull(f -> f > 1, a)",
    "widthBucket(x, 0, 10, 5)", "firstSignificantSubdomain(u)",
    "cutToFirstSignificantSubdomain(u)",
    # r9 tz-argument forms (used to drop the tz silently)
    "toString(ts, 'Europe/Moscow')", "toDate(ts, 'Europe/Moscow')",
    "toYear(ts, 'Europe/Moscow')", "toStartOfMonth(ts, 'UTC')",
    "toDayOfWeek(d, 1)", "toDayOfWeek(d, 3)",
    "tryBase64Decode(s)", "toUnixTimestamp(s, 'Europe/Moscow')",
    "now('Europe/Moscow')", "toWeek(d, 3, 'UTC')",
    # r10 batch 22: MySQL week modes 0/1/2, constant type defaults,
    # runtime hasToken needles (guard + raise on invalid, CH contract)
    "toWeek(d)", "toWeek(d, 0)", "toWeek(d, 1)", "toWeek(d, 2)",
    "toYearWeek(d)", "toYearWeek(d, 0)", "toYearWeek(d, 1)",
    "toYearWeek(d, 2)",
    # r10 batch 26: MySQL week modes 4-7 (validated against an
    # independent port of MySQL's calc_week in test_properties)
    "toWeek(d, 4)", "toWeek(d, 5)", "toWeek(d, 6)", "toWeek(d, 7)",
    "toWeek(d, 8)", "toWeek(d, 9)", "toYearWeek(d, 8)", "toYearWeek(d, 9)",
    "toYearWeek(d, 4)", "toYearWeek(d, 5)", "toYearWeek(d, 6)",
    "toYearWeek(d, 7)", "defaultValueOfTypeName('Int32')",
    "defaultValueOfTypeName('Nullable(String)')",
    "defaultValueOfTypeName('Decimal(10,2)')",
    "defaultValueOfTypeName('UUID')",
    "hasToken(s, tok_col)", "hasTokenCaseInsensitive(s, tok_col)",
    # r10 batch 23: CH BYTE semantics for bare string functions
    # (length/position/left/right count bytes; upper/lower fold ASCII
    # only — the UTF8-suffixed forms are the character/Unicode ones)
    "length(s)", "position(h, 'n')", "position(h, 'n', 3)",
    "positionCaseInsensitive(h, 'n')", "upper(s)", "lower(s)",
    "left(s, 2)", "right(s, 2)", "leftUTF8(s, -2)", "rightUTF8(s, -2)",
    "multiSearchAnyCaseInsensitive(s, ['a'])",
    "countSubstringsCaseInsensitive(s, 'a')",
    "leftPad(s, 7)", "leftPad(s, 7, '*')", "rightPad(s, 7, '*')",
    "leftPadUTF8(s, 7, '*')", "rightPadUTF8(s, 7)",
    "splitByChar(',', s, 2)", "splitByString('--', s, 2)",
    "splitByRegexp('[0-9]+', s, 2)", "splitByWhitespace(s, 2)",
    "alphaTokens(s, 2)",
    # r10 batch 24: valid-Spark names with different CH semantics
    # (the `position` class — pass-through ran and was wrong)
    "rand()", "rand(1)", "rand64()", "MD5(s)", "SHA1(s)", "SHA224(s)",
    "SHA256(s)", "SHA384(s)", "SHA512(s)", "trunc(1.98)", "trunc(x, 2)",
    "toValidUTF8(s)",
    "addDate(d, INTERVAL 1 MONTH)", "subDate(d, INTERVAL 3 DAY)",
    "timeSlots(t1, 600)", "timeSlots(t1, 600, 299)",
    "arrayUnion(a, b)", "mapContainsKeyLike(m, 'a%')",
    "port(u)", "port(u, 443)", "numbers(10)", "numbers(5, 3)",
    # r10 batch 25: little-endian byte reads (string args; numeric
    # args fail loudly at the emitted cast-to-binary)
    "reinterpretAsUInt64(s)", "reinterpretAsInt64(s)",
    "reinterpretAsUInt32(s)", "reinterpretAsInt8(s)",
    "reinterpretAsUInt16(s)",
    # r10 batch 27 sweep closures
    "positiveModulo(a, b)", "nanIfNull(x)",
    "countMatchesCaseInsensitive(s, 'p')",
    "substringIndexUTF8(s, '.', 2)", "toLowCardinality(x)",
    "isValidUTF8(s)", "UTCTimestamp()", "timeDiff(a, b)",
    "ULIDStringToDateTime(s)", "regexpQuoteMeta(s)", "quoteMeta(s)",
    "murmurHash2_64(x)", "murmurHash3_32(x)", "intHash32(x)",
    "intHash64(x)", "gccMurmurHash(x)",
    # r10 batch 28 sweep wave 2
    "arrayReduce('sum', a)", "arrayReduce('avg', a)",
    "encodeURLComponent(u)", "encodeURLFormComponent(u)",
    "decodeURLFormComponent(u)", "cutWWW(u)",
    "extractURLParameters(u)", "extractURLParameterNames(u)",
    "sigmoid(x)", "toStartOfMicrosecond(t)", "toStartOfNanosecond(t)",
    "medianTiming(x)", "medianTDigest(x)", "currentDatabase()",
    "currentUser()", "multiSearchAllPositions(s, ['a'])",
    "multiSearchFirstPosition(s, ['a'])",
    "multiSearchFirstIndex(s, ['a'])",
    "multiSearchAllPositionsUTF8(s, ['a'])",
    "multiSearchFirstIndexCaseInsensitive(s, ['a'])",
    "encrypt('aes-256-gcm', p, k, iv)",
    "decrypt('aes-128-cbc', c, k, iv)",
    "tryDecrypt('aes-256-gcm', c, k, iv, aad)",
    "encrypt('aes-128-ecb', p, k)",
    # r10 batch 29 sweep wave 3
    "parseDateTimeBestEffort(s, 'UTC')",
    "parseDateTimeBestEffort(s, tz_col)",
    "parseDateTime(s, '%Y-%m-%d', tz_col)",
    "parseDateTimeBestEffortOrNull(s)",
    "parseDateTimeBestEffortOrZero(s)",
    "parseDateTime64BestEffort(s)", "parseDateTimeBestEffortUS(s)",
    "toDate32OrNull(s)", "mapSort(m)", "isNotDistinctFrom(a, b)",
    "arrayLastIndex(f -> f, a)", "any_respect_nulls(x)",
    "first_value_respect_nulls(x)", "addMilliseconds(t1, 5)",
    "subtractMicroseconds(t1, 5)", "makeDateTime64(y, 1, 2, 3, 4, 5)",
    "positionCaseInsensitive(h, 'n', 3)",
    "quantileExactInclusive(0.5)(x)", "quantileExactLow(0.5)(x)",
    "quantileExactHigh(0.5)(x)", "quantileExactExclusive(0.25)(x)",
    # r10 batch 30
    "arraySort(f -> -f, a)", "arrayReverseSort(f -> f, a)",
    "arrayPartialSort(3)(a)", "arrayPartialReverseSort(3)(a)",
    "indexHint(x)",
    "scalarProduct(a, b)", "L1Norm(a)", "L2SquaredNorm(a)",
    "LinfNorm(a)", "LpNorm(a, 3)", "randNormal(0, 1)",
    "randLogNormal(0, 1)", "randExponential(2)", "randBernoulli(0.5)",
    "randomPrintableASCII(10)",
    # count() -> count(*) keeps its own name (pinned by value in
    # test_units instead of the name-gone check here)
    # r11: decode joins the closed-form geohash pair; Date32 zero is
    # the type MIN (1900-01-01)
    "geohashDecode(g)", "toDate32OrZero(s)",
]

NATIVE = [
    "startsWith(s, 'a')", "endsWith(s, 'a')", "ilike(s, '%A%')",
    "isnull(x)", "isNotNull(x)", "floor(x, 2)", "ceil(x, 2)",
    "log(x)", "ln(x)", "log10(x)", "log2(x)", "cbrt(x)", "sign(x)",
    "e()", "pi()", "char_length(s)", "ascii(s)", "repeat(s, 2)",
    "space(3)", "abs(x)", "hex(x)", "unhex(s)", "bin(x)",
    "isNaN(x)", "greatest(a, b)", "least(a, b)", "soundex(s)",
    "initcap(s)", "first_value(x)", "corr(a, b)",
]

LOUD = [
    # block-order-dependent WITHOUT a defining ORDER BY (the ordered
    # forms translate to windows — test_inventory_block_order_family)
    "runningDifference(x)", "neighbor(x, 1)", "runningAccumulate(st)",
    "groupArrayMovingSum(3)(x)", "deltaSum(x)",
    # needs infrastructure absent at text level (byteSwap/
    # reinterpretAsFloat are input-TYPE-width-dependent, unknowable
    # from text; the [U]IntN reads on strings translate — batch 25)
    "byteSwap(x)", "bitSlice(s, 1, 4)",
    "reinterpretAsFloat64(x)", "reinterpretAsUInt128(x)",
    "tupleConcat(t1, t2)",
    # unsupported parameter shapes (supported shapes translate;
    # week modes 8/9 closed r13 — see TRANSLATED)
    "toYearWeek(d, 10)", "toWeek(d, mode_col)", "JSONExtractInt(j, k, 0)",
    "age('fortnight', a, b)",
    "defaultValueOfTypeName('Array(Int32)')",
    "defaultValueOfTypeName(type_col)",
    "hasToken(s, 'has space')",
    "arrayReduce('medianExact', a)", "arrayReduce(agg_col, a)",
    "encrypt('aes-128-ctr', p, k, iv)", "encrypt(mode_col, p, k)",
    "aes_encrypt_mysql('aes-128-ecb', p, k)",
    "addNanoseconds(t1, 5)", "quantileExactExclusive(p)(x)",
    # r12: parseDateTimeBestEffort(s, tz_col) moved to TRANSLATED —
    # dynamic per-row timezones now emit; the 64 spelling stays loud
    # (its 2nd arg is a precision, not a tz)
    "parseDateTime64BestEffort(s, p)",
    "randPoisson(10)", "L2Normalize(t1)", "LpNorm(a, p)",
    "randomString(10)",
    # extra args on arity-strict rewrites (r9): loud, never dropped
    "toYear(ts, tz_col)", "toSecond(t1, 9)", "toMonday(d, x)",
    "toInt32(x, 'oops')", "toDayOfWeek(d, 9)",
]


@pytest.mark.parametrize("call", TRANSLATED)
def test_inventory_translated(call):
    src = f"select {call} from t"
    out = T(src)
    assert out != src, f"rewrite stopped firing: {call}"
    name = re.match(r"[A-Za-z_][A-Za-z0-9_]*", call).group(0)
    assert not re.search(rf"(?<![\w.]){re.escape(name)}\s*\(", out), (
        f"CH name survived translation: {call} -> {out}"
    )


@pytest.mark.parametrize("call", NATIVE)
def test_inventory_native_passthrough(call, spark):
    src = f"select {call} from t"
    assert T(src) == src, f"native name was rewritten: {call}"
    # and Spark genuinely resolves it (literal-only calls run; column
    # refs only need the function to EXIST — resolve via a probe)
    name = re.match(r"[A-Za-z_][A-Za-z0-9_]*", call).group(0)
    fns = spark.sql(
        f"SHOW FUNCTIONS LIKE '{name.lower()}'"
    ).count()
    assert fns >= 1, f"not a Spark function after all: {name}"


@pytest.mark.parametrize("call", LOUD)
def test_inventory_loud_passthrough(call):
    src = f"select {call} from t"
    assert T(src) == src, f"documented-loud form was rewritten: {call}"


def test_inventory_translated_output_parses(spark):
    """Every translated emission must be SYNTACTICALLY valid Spark
    SQL — parsed with the session's parser (no resolution, so missing
    tables/columns don't matter). Catches malformed rewrite output
    (unbalanced parens, stray keywords, bad literals) across the
    whole pinned surface in one pass."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    for call in TRANSLATED:
        out = T(f"select {call} from t")
        parser.parsePlan(out)  # raises ParseException on bad syntax


ORDERED_TRANSLATED = [
    # (call template under a defining ORDER BY, fragment the window
    # rewrite must emit)
    ("select k, runningDifference(x) from t order by k", "lag(x, 1, x)"),
    ("select k, runningDifference(x) from (select k, x from t order by k)",
     "lag(x, 1, x)"),
    ("select k, neighbor(x, 1) from t order by k", "lead(x, 1)"),
    ("select k, neighbor(x, -2, 0) from t order by k", "lag(x, 2, 0)"),
    ("select k, runningAccumulate(sumState(x)) from t order by k",
     "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"),
    ("select k, runningAccumulate(countState(), g) from t order by k",
     "PARTITION BY g"),
    ("select g, groupArrayMovingSum(3)(x) from"
     " (select g, k, x from t order by k) group by g", "array_sort"),
    ("select g, groupArrayMovingAvg(x) from"
     " (select g, k, x from t order by k) group by g", "array_sort"),
    ("select deltaSum(v) from (select k, v from t order by k)",
     "zip_with"),
]

ORDERED_STILL_LOUD = [
    # unsupported shapes stay loud even WITH an order
    "select k, neighbor(x, w) from t order by k",          # non-const offset
    "select k, runningAccumulate(uniqState(x)) from t order by k",
    # aggregates need the INNER-subquery order (the only one CH
    # guarantees); a same-level ORDER BY does not define group order
    "select g, groupArrayMovingSum(3)(x) from t group by g order by g",
    # positional order keys cannot enter a window spec
    "select runningDifference(x) from t order by 1",
]


@pytest.mark.parametrize("src,frag", ORDERED_TRANSLATED)
def test_inventory_block_order_family(src, frag):
    """r10 verdict item 3: the block-order family translates to window
    equivalents when a defining ORDER BY exists (inner subquery first,
    then the same SELECT's own)."""
    out = T(src)
    assert out != src, f"ordered form did not translate: {src}"
    assert frag in out, f"expected {frag!r} in {out}"


@pytest.mark.parametrize("src", ORDERED_STILL_LOUD)
def test_inventory_block_order_still_loud(src):
    # the block-order CALL must survive untranslated (loud); the
    # ORDER BY itself may legally gain the CH NULLS-LAST default (r10)
    out = T(src)
    name = re.search(
        r"(runningDifference|runningAccumulate|neighbor|"
        r"groupArrayMovingSum|groupArrayMovingAvg|deltaSum)", src
    ).group(0)
    assert re.search(rf"(?<![\w.]){name}\s*\(", out), (
        f"unsupported ordered shape was rewritten: {src} -> {out}"
    )
    assert out.replace(" NULLS LAST", "") == src, (
        f"unexpected rewrite beyond the NULLS default: {src} -> {out}"
    )
