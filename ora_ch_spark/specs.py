"""Task / table / calc specifications.

Mirrors the reference's request model and its validation rules:

- ``Table`` fields — reference ``table/Table.scala:9-29``
  (``where_filter``, ``sync_by_column_max``, ``sync_by_columns``,
  ``update_fields``, ``order_by_ora_data``, ``src_table_full_name``,
  ``only_columns``, ``clr_ora_table_aft_upd``).
- Operation enum + JSON names — ``request/OperType.scala:11-56``.
- Mutual-exclusion validation — ``request/ReqNewTask.scala:28-61``
  (e.g. ``append_where`` requires ``where_filter``; ``append_bymax``
  requires ``sync_by_column_max``; ``append_notin`` requires
  ``sync_by_columns``; ``update`` requires ``update_fields``).
- Parallel degree bounds 2..12 — ``request/ReqNewTask.scala:82-86``.
- Calc request — ``calc/ReqCalcSrc.scala:14-24``; query metadata —
  ``calc/ViewQueryMeta.scala:9-17``; typed params —
  ``calc/ViewQueryMeta.scala:3-7`` + ``clickhouse/jdbsChSession.scala:723-731``.

Deviations (documented upgrades over the reference):
- ``sync_by_columns`` is an arbitrary-length list of any key type —
  the reference limits it to 1..3 integer columns
  (``jdbsChSession.scala:130-157``) only because it splices literal
  ``NOT IN`` tuples; our anti-join implementation has no such limit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class SpecError(ValueError):
    """Invalid spec combination (reference: IllegalArgumentException
    raised from the request case-class constructors)."""


class Operation(str, Enum):
    RECREATE = "recreate"
    APPEND_WHERE = "append_where"
    APPEND_BY_MAX = "append_bymax"
    APPEND_NOT_IN = "append_notin"
    UPDATE = "update"


@dataclass(frozen=True)
class TableSpec:
    """One unit of copy work (reference ``table/Table.scala:9-29``)."""

    schema: str
    name: str
    operation: Operation
    # filter pushed into the source scan (O1/O2/O3)
    where_filter: str | None = None
    # O3: monotonically-increasing watermark column
    sync_by_column_max: str | None = None
    # O4: key columns for insert-if-absent (anti-join)
    sync_by_columns: tuple[str, ...] | None = None
    # O5: non-key fields to update
    update_fields: tuple[str, ...] | None = None
    # O5 optional: watermark column for changed-row detection
    sync_update_by_column_max: str | None = None
    # optional ORDER BY of source read (CH insert-locality hint; we map
    # it to sortWithinPartitions — optional, not required for parity)
    order_by_ora_data: str | None = None
    # read from an alternate source table
    src_table_full_name: str | None = None
    # column subset projection
    only_columns: tuple[str, ...] | None = None
    # O5: clean the source staging table after a successful update
    clr_ora_table_aft_upd: bool = False
    # columns forced NOT NULL in the target schema
    notnull_columns: tuple[str, ...] = ()
    # ClickHouse-parity mode: clamp timestamps to the CH DateTime
    # UInt32 range on copy (jdbsChSession.scala:630-644)
    ch_datetime_clamp: bool = False

    def __post_init__(self) -> None:
        op = self.operation
        # validation rules per request/ReqNewTask.scala:28-61
        if op is Operation.APPEND_WHERE and not self.where_filter:
            raise SpecError("append_where requires where_filter")
        if op is Operation.APPEND_BY_MAX and not self.sync_by_column_max:
            raise SpecError("append_bymax requires sync_by_column_max")
        if op is Operation.APPEND_NOT_IN and not self.sync_by_columns:
            raise SpecError("append_notin requires sync_by_columns")
        if op is Operation.UPDATE and not self.update_fields:
            raise SpecError("update requires update_fields")
        if self.sync_by_column_max and self.sync_by_columns:
            raise SpecError("sync_by_column_max and sync_by_columns are mutually exclusive")
        if op not in (Operation.UPDATE,) and self.update_fields:
            raise SpecError("update_fields is only valid for operation=update")
        if op is Operation.RECREATE and (self.sync_by_column_max or self.sync_by_columns):
            raise SpecError("recreate does not take sync columns")

    @property
    def full_name(self) -> str:
        return f"{self.schema}.{self.name}"

    @property
    def source_name(self) -> str:
        return self.src_table_full_name or self.full_name


@dataclass(frozen=True)
class TaskSpec:
    """A batch of tables + parallelism (reference
    ``request/ReqNewTask.scala:72-87`` / ``task/WsTask.scala:8-16``)."""

    tables: tuple[TableSpec, ...]
    degree: int = 2

    def __post_init__(self) -> None:
        if not 2 <= self.degree <= 12:
            # reference: request/ReqNewTask.scala:82-86
            raise SpecError("parallel degree must be within [2, 12]")
        if not self.tables:
            raise SpecError("task must declare at least one table")

    @property
    def effective_parallelism(self) -> int:
        """degree-1 workers when degree > 3, else sequential
        (reference ``task/TaskLogic.scala:350-363``)."""
        return self.degree - 1 if self.degree > 3 else 1


class ParamType(str, Enum):
    """The three calc parameter types
    (``clickhouse/jdbsChSession.scala:723-731``)."""

    DECIMAL = "Decimal(38,6)"
    STRING = "String"
    UINT32 = "UInt32"


@dataclass(frozen=True)
class QueryParam:
    """``calc/ViewQueryMeta.scala:3-7`` — VQParams(name, chType, ord)."""

    name: str
    ch_type: ParamType
    ord: int = 0


@dataclass(frozen=True)
class QueryMeta:
    """Stored-query metadata (``calc/ViewQueryMeta.scala:9-17``)."""

    query_id: int
    ch_table: str
    ora_table: str
    query: str
    params: tuple[QueryParam, ...] = ()
    ch_schema: str = "default"
    ora_schema: str = "default"
    # explicit column list for the CH→Oracle copy (copyChOraColumns)
    copy_ch_ora_columns: tuple[str, ...] | None = None
    # key columns for the local-cache promotion's keyed delete
    # (reference: the (datecalc_cache, date_cache) pair,
    # jdbsChSession.scala:452-464); None → whole-table replace
    local_cache_keys: tuple[str, ...] | None = None
    # opt-in CH byte-string semantics for this stored query's bare
    # substring/substr/reverse surface (r11 —
    # translate_ch_sql(byte_strings=True)); default keeps the
    # ASCII-coincident character reading
    byte_strings: bool = False


@dataclass(frozen=True)
class CalcQuery:
    """One query of a calc request (``calc/ReqCalcSrc.scala:14-24``)."""

    query_id: int
    order_by: int = 0
    copy_to_local_cache: bool = False
    copy_by_parts_key: str | None = None
    copy_by_parts_cnt: int | None = None
    params: dict[str, str] = field(default_factory=dict)
