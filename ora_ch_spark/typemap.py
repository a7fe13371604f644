"""Oracle → Spark type mapping.

Reproduces the reference's documented Oracle→ClickHouse column map
(``column/OraChColumn.scala:47-58``) with Spark types as target, plus
the nullability rule (``OraChColumn.scala:35-45``) and the optional
ClickHouse-``DateTime``-range clamp the dead writer applied
(``clickhouse/jdbsChSession.scala:630-644``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# sentinel matching the reference's behavior for unmapped types
# (OraChColumn.scala:57)
UNDEFINED_COL_TYPE = "UNDEFINED_COL_TYPE"

# ClickHouse DateTime is a UInt32 epoch; the reference clamped
# out-of-range values to these bounds (jdbsChSession.scala:630-644).
CH_DATETIME_MIN = "1971-01-01 00:00:00"
CH_DATETIME_MAX = "2106-01-01 00:00:00"


class UnsupportedOracleType(TypeError):
    pass


def oracle_to_spark_type(
    type_name: str,
    data_scale: int | None = None,
    strict: bool = True,
) -> T.DataType:
    """Map an Oracle JDBC metadata type to the Spark type the engine
    stores (parity with ``OraChColumn.scala:47-58``):

    - NUMBER scale=0 → LongType (reference: Int64)
    - NUMBER scale≠0 → DecimalType(38, 6) (reference: Decimal128(6))
    - VARCHAR2/CHAR/CLOB → StringType
    - DATE / TIMESTAMP → TimestampType (Oracle DATE has seconds)
    """
    t = type_name.strip().upper()
    if t in ("NUMBER", "INTEGER", "INT", "NUMERIC"):
        if not data_scale:  # None or 0
            return T.LongType()
        return T.DecimalType(38, 6)
    if t in ("VARCHAR2", "VARCHAR", "CHAR", "NVARCHAR2", "CLOB", "NCLOB"):
        return T.StringType()
    if t == "DATE" or t.startswith("TIMESTAMP"):
        return T.TimestampType()
    if t in ("FLOAT", "BINARY_DOUBLE", "BINARY_FLOAT"):
        return T.DoubleType()
    if t in ("RAW", "BLOB"):
        return T.BinaryType()
    if strict:
        raise UnsupportedOracleType(f"{UNDEFINED_COL_TYPE}: {type_name}")
    return T.StringType()


def column_nullable(
    jdbc_nullable: bool,
    name: str,
    notnull_columns: tuple[str, ...] = (),
) -> bool:
    """Nullability per ``OraChColumn.scala:35-45``: a column is
    Nullable unless JDBC says NOT NULL, or it is listed in
    ``notnull_columns``, or it is named ``rn``."""
    if name.lower() == "rn":
        return False
    if name.lower() in {c.lower() for c in notnull_columns}:
        return False
    return jdbc_nullable


def map_struct(
    cols: list[tuple[str, str, int | None, bool]],
    notnull_columns: tuple[str, ...] = (),
) -> T.StructType:
    """Build a StructType from (name, oracle_type, scale, nullable)."""
    return T.StructType(
        [
            T.StructField(
                name,
                oracle_to_spark_type(otype, scale),
                column_nullable(nullable, name, notnull_columns),
            )
            for name, otype, scale, nullable in cols
        ]
    )


def clamp_ch_datetime(col: Column) -> Column:
    """Optional ClickHouse-parity transform: clamp timestamps to the
    CH ``DateTime`` UInt32 range (``jdbsChSession.scala:630-644``).
    Native Spark TimestampType needs no clamp — apply only when
    emulating CH storage semantics."""
    lo = F.to_timestamp(F.lit(CH_DATETIME_MIN))
    hi = F.to_timestamp(F.lit(CH_DATETIME_MAX))
    return (
        F.when(col < lo, lo).when(col >= hi, hi).otherwise(col)
    )
