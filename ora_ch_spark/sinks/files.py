"""File-format sinks: CSV and JSON-lines exports — the interchange
side of ``sources/files.py`` (S5's shape pointed at a file landing
zone instead of a JDBC target).

Scale posture:
- Output parallelism is the file count: ``num_files`` repartitions
  before the write (each task writes one file). The default (None)
  keeps the frame's own partitioning — the right choice for big
  exports; small dimension exports pass ``num_files=1`` for a single
  interchange file.
- Writes go to a fresh directory per export (Spark's committer makes
  the directory appear atomically on success); ``overwrite`` maps to
  ``mode("overwrite")`` — the same semantic as the JDBC sink's
  truncate-before (``ora/jdbcSession.scala:131-140``).
- CSV quotes/escapes embedded delimiters and newlines by default, and
  writes a header so the matching ``sources/files.read_csv`` with
  ``ddl_of`` round-trips schema-faithfully (timestamps in ISO-8601,
  session-UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _shape(df: DataFrame, num_files: int | None) -> DataFrame:
    return df.repartition(num_files) if num_files else df


def write_csv(
    df: DataFrame,
    path: str,
    num_files: int | None = None,
    header: bool = True,
    delimiter: str = ",",
    overwrite: bool = True,
) -> None:
    (
        _shape(df, num_files)
        .write.mode("overwrite" if overwrite else "error")
        .option("header", header)
        .option("sep", delimiter)
        .csv(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    num_files: int | None = None,
    overwrite: bool = True,
) -> None:
    (
        _shape(df, num_files)
        .write.mode("overwrite" if overwrite else "error")
        .json(path)
    )


def write_orc(
    df: DataFrame,
    path: str,
    num_files: int | None = None,
    overwrite: bool = True,
    compression: str = "zstd",
) -> None:
    """Columnar interchange export: keeps types exactly (no text
    round-trip loss), stripe-level stats enable pushdown on re-read.
    zstd default — the modern size/speed point for cold landing
    zones."""
    (
        _shape(df, num_files)
        .write.mode("overwrite" if overwrite else "error")
        .option("compression", compression)
        .orc(path)
    )
