"""Typed parameter binding for stored calc queries (C1).

The reference binds ``{name:Type}`` placeholders by folding over the
query's declared params sorted by ``ord`` and string-replacing each
with a typed literal (``clickhouse/jdbsChSession.scala:712-743``):

- ``Decimal(38,6)`` → numeric splice (``:726``)
- ``String``        → quoted splice
- ``UInt32``        → numeric splice
- unknown param name → the literal ``"*****"`` (``:726-730``)

We reproduce exactly that contract (placeholder syntax
``{name:Type}``), with validation the reference lacks: numeric params
must parse as numbers (no SQL injection through a numeric slot).
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

from ora_ch_spark.specs import ParamType, QueryParam

UNKNOWN_PARAM_SENTINEL = "*****"  # jdbsChSession.scala:726-730

_PLACEHOLDER = re.compile(r"\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([A-Za-z0-9()\s,]+?)\s*\}")


class ParamBindError(ValueError):
    pass


def _literal(ch_type: str, value: str) -> str:
    t = ch_type.replace(" ", "")
    if t.lower().startswith("decimal"):
        try:
            return str(Decimal(value))
        except InvalidOperation as e:
            raise ParamBindError(f"non-numeric value {value!r} for {ch_type}") from e
    if t in ("UInt32", "UInt64", "Int32", "Int64"):
        try:
            return str(int(value))
        except ValueError as e:
            raise ParamBindError(f"non-integer value {value!r} for {ch_type}") from e
    if t == "String":
        return "'" + value.replace("'", "''") + "'"
    raise ParamBindError(f"unsupported param type {ch_type!r}")


def bind_params(
    sql: str,
    declared: tuple[QueryParam, ...] | list[QueryParam],
    values: dict[str, str],
) -> str:
    """Replace every ``{name:Type}`` placeholder with a typed literal.

    Params are processed sorted by ``ord`` for parity with the
    reference's fold; names present in the text but not declared (or
    declared but missing a value) bind to ``"*****"`` exactly as the
    reference does.
    """
    by_name = {p.name: p for p in sorted(declared, key=lambda p: p.ord)}

    def repl(m: re.Match) -> str:
        name, ch_type = m.group(1), m.group(2)
        p = by_name.get(name)
        if p is None or name not in values:
            return UNKNOWN_PARAM_SENTINEL
        declared_type = p.ch_type.value if isinstance(p.ch_type, ParamType) else str(p.ch_type)
        # the placeholder's inline type wins for splice format, but must
        # agree with the declared type family
        return _literal(declared_type if declared_type else ch_type, values[name])

    return _PLACEHOLDER.sub(repl, sql)
