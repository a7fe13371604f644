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
    ) or re.search(r"(?i)\b(final|prewhere|global|any|all)\b", sql):
        # statement-level CH keywords are rewritten too — exclude them
        # from the identity property
        return
    # unbalanced parens inside actual calls can legitimately raise —
    # but with no CH call present, output must equal input
    assert translate_ch_sql(sql) == sql


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
