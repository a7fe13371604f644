"""File-format sources beyond parquet: CSV and JSON-lines readers
with the same ``source_loader`` contract the TaskScheduler consumes
(`plans/scheduler.py`), so every load operation (recreate /
append_where / append_bymax / append_notin / update) runs unchanged
over text-format landing zones — the common shape of a crawl dump or
an exported transactional feed.

Scale posture (differs by format, and the differences are the point):

- **Explicit schema required.** ``inferSchema``/sampled JSON schema
  inference reads the data TWICE (or a large sample) before the real
  scan — at 100 TB that is a full extra pass. Callers pass a DDL
  schema string or a ``StructType``; the helper ``ddl_of`` derives one
  from an existing table when migrating.
- **CSV** scans ARE splittable (uncompressed / bzip2), and Spark
  pushes column pruning into the text parser (it skips tokenizing
  unprojected trailing columns), but there is no predicate pushdown
  and no row-group skipping — filters run post-parse. PERMISSIVE mode
  with a ``_corrupt_record`` column is the default here: a 100 TB load
  must quarantine bad rows, not die on row 3 billion.
- **JSON lines** likewise splittable-but-full-parse. Favor it only as
  a landing format; both loaders are expected to feed a columnar
  TableStore write (O1-O5) immediately — the engine's working format
  stays parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ora_ch_spark.specs import TableSpec

CORRUPT_COL = "_corrupt_record"


def ddl_of(df: DataFrame) -> str:
    """DDL schema string of an existing frame (migration helper: read
    the parquet table once, reuse its schema for the text source)."""
    return df.schema.simpleString()[len("struct<") : -1].replace(":", " ")


def _with_corrupt(schema: str | StructType) -> StructType:
    # copy the fields list — StructType(other.fields) would SHARE it,
    # and .add() would then mutate the caller's schema in place
    st = (
        StructType.fromDDL(schema)
        if isinstance(schema, str)
        else StructType(list(schema.fields))
    )
    if CORRUPT_COL not in st.fieldNames():
        from pyspark.sql.types import StringType, StructField

        st = st.add(StructField(CORRUPT_COL, StringType(), True))
    return st


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    header: bool = True,
    delimiter: str = ",",
    quarantine: bool = True,
) -> DataFrame:
    """CSV reader with explicit schema and PERMISSIVE quarantine:
    malformed rows land in ``_corrupt_record`` instead of failing the
    job (or silently nulling, which is worse). Returns the full frame
    including the quarantine column — callers split it with
    :func:`split_quarantine`."""
    reader = (
        spark.read.format("csv")
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.schema(_with_corrupt(schema) if quarantine else schema).load(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    quarantine: bool = True,
) -> DataFrame:
    """JSON-lines reader (one object per line — the splittable form;
    multiLine JSON is NOT splittable and is deliberately not offered
    here). Same quarantine contract as :func:`read_csv`."""
    reader = (
        spark.read.format("json")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.schema(_with_corrupt(schema) if quarantine else schema).load(path)


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_quarantine_col, corrupt_rows). Spark
    requires a cache/materialization boundary before filtering on the
    corrupt column (SPARK-21610) — the filter references a column the
    parser only fills during the same scan. The cache is held by both
    returned frames' lineage and follows the engine-wide convention
    (operators persist internally; the session owner releases with
    ``spark.catalog.clearCache()`` between workloads) — text-source
    loads are one-shot landings into the columnar store, so the cache
    lives only until the load op's write completes."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return clean, bad


def csv_source(
    spark: SparkSession,
    base_dir: str,
    schemas: dict[str, str | StructType],
    header: bool = True,
    delimiter: str = ",",
):
    """``source_loader`` for TaskScheduler over a directory of
    ``<table>.csv`` files (corrupt rows dropped — the load-op contract
    is clean rows in, same as the JDBC source's resultset)."""

    def load(spec: TableSpec) -> DataFrame:
        name = (spec.src_table_full_name or spec.name).split(".")[-1]
        raw = read_csv(
            spark, f"{base_dir}/{name}.csv", schemas[name], header, delimiter
        )
        clean, _ = split_quarantine(raw)
        return clean

    return load


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader. Unlike the text formats above, ORC is columnar and
    self-describing: no explicit schema needed, no quarantine column
    (malformed files fail fast, per-row corruption cannot exist), and
    — the scale property — predicate pushdown + column pruning reach
    the stripe/row-group level exactly as with parquet, so ORC landing
    zones do NOT pay the text formats' full-parse tax."""
    return spark.read.orc(path)


def orc_source(spark: SparkSession, base_dir: str):
    """``source_loader`` for TaskScheduler over ``<table>.orc``
    file/directory layouts — the second columnar interchange format
    next to the engine's native parquet."""

    def load(spec: TableSpec) -> DataFrame:
        name = (spec.src_table_full_name or spec.name).split(".")[-1]
        return read_orc(spark, f"{base_dir}/{name}.orc")

    return load


def jsonl_source(
    spark: SparkSession, base_dir: str, schemas: dict[str, str | StructType]
):
    """``source_loader`` over ``<table>.jsonl`` files."""

    def load(spec: TableSpec) -> DataFrame:
        name = (spec.src_table_full_name or spec.name).split(".")[-1]
        raw = read_jsonl(spark, f"{base_dir}/{name}.jsonl", schemas[name])
        clean, _ = split_quarantine(raw)
        return clean

    return load
