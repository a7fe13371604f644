"""Test-data table loading + view registration.

The driver materializes a TPC-H-ish star schema plus ``events``,
``documents`` and ``embeddings`` under ``/root/testdata/sf*/`` — one
parquet file per table (TESTDATA.md). In production these would be
JDBC reads from Oracle (sources/jdbc.py); parquet is the stand-in
columnar source and exercises the same pushdown/pruning paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small driver-side row set as a single-task DataFrame.

    r15 (guide §4 — eliminate the Python boundary): Arrow
    ``createDataFrame(pandas)`` builds a pure-JVM **LocalRelation**
    (plans as ``LocalTableScan``), so downstream jobs never spawn a
    Python worker to re-unpickle the rows — the previous
    ``parallelize(rows, 1)`` form paid that round trip on EVERY
    action touching the frame (measured 0.175 → 0.056 s per noop on
    an 8-row frame; ~10 operators consume such frames 1-3× each).
    Broadcasts of a LocalRelation build driver-side without a
    separate job. ``dtype=object`` keeps ``None`` out of pandas'
    NaN-coercion for numeric columns; ``coalesce(1)`` pins writes to
    one task / one file (the JVM-only coalesce is free — the ~5 s
    coalesce pathology documented in earlier rounds was specific to
    coalescing a *Python-RDD-backed* relation). Arrow fallback is
    DISABLED for the conversion so anything Arrow can't convert
    raises and lands in the explicit one-slice parallelize fallback
    (the silent non-Arrow pandas path would re-slice
    defaultParallelism ways). Use for bounded tables only (centroid
    sets, quantizer codebooks, report rows).

    Classic-deployment note (r14 advice): the fallback path touches
    ``spark.sparkContext``, which Spark Connect does not expose — on
    Connect the Arrow path (session-level API only) is the one that
    runs; the fallback would raise. Fine for the current classic
    deployment; a Connect port would swap the fallback for
    ``createDataFrame(rows, schema)`` and accept the slicing."""
    try:
        import pandas as pd

        if hasattr(schema, "fieldNames"):
            names = schema.fieldNames()
        else:
            from pyspark.sql.types import _parse_datatype_string

            names = [f.name for f in _parse_datatype_string(schema).fields]
        pdf = pd.DataFrame(list(rows), columns=names, dtype=object)
        fb_key = "spark.sql.execution.arrow.pyspark.fallback.enabled"
        prev = spark.conf.get(fb_key, None)
        spark.conf.set(fb_key, "false")
        try:
            return spark.createDataFrame(pdf, schema).coalesce(1)
        finally:
            if prev is None:
                spark.conf.unset(fb_key)
            else:
                spark.conf.set(fb_key, prev)
    except Exception:  # noqa: BLE001 — any conversion gap
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema
        )


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to plain TIMESTAMP regardless of
    how the parquet writer encoded it. The testdata has shipped `ts` as
    both TIMESTAMP(NANOS) (reads as bigint under nanosAsLong) and
    timestamp[us] without UTC adjustment (reads as TIMESTAMP_NTZ in
    Spark 4). With the session pinned to UTC, both conversions preserve
    wall-clock values and match the DuckDB oracle's naive TIMESTAMP."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # legacy nanos-as-long: floor ns → µs
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif dt == "timestamp_ntz":
        # NTZ → TZ interprets the wall clock in the SESSION timezone —
        # pin UTC here (same documented side effect as load_table) so
        # the conversion is wall-clock-stable even when a caller feeds
        # a raw frame into an operator without going through load_table
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table.

    DELIBERATE session-conf side effects (documented contract): pins
    ``spark.sql.session.timeZone=UTC`` (year()/date_trunc()/timestamp
    literals must match the UTC-naive DuckDB oracle on whatever
    session the driver brings), and — for ``events`` — leaves
    ``nanosAsLong`` enabled session-wide (any later nanos-timestamp
    parquet reads in the same session surface as bigint; acceptable
    here because the engine funnels every read through this loader)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as long nanos and floor-convert to a
        # microsecond timestamp (matching DuckDB's ns→µs truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return normalize_ts(spark.read.parquet(path))
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# last (session, sf_dir) the table views were registered for —
# dozens of catalog entries call register_views per invocation, and
# the schema-inference + re-registration round trip costs ~0.8 s each
# time for identical results. The session is held by OBJECT (identity
# compared with ``is``), not by id(): a stopped session's id can be
# reused by CPython for the next one, which would turn a fresh
# session into a false cache hit with views registered nowhere.
_REGISTER_STATE: dict[str, object | None] = {
    "spark": None, "sf_dir": None, "dfs": None,
}


def register_views(
    spark: SparkSession, sf_dir: str, force: bool = False
) -> dict[str, DataFrame]:
    """Register every test table as a temp view (for the SQL
    surface). Memoized per (session, sf_dir) — nothing in the engine
    overwrites these view names, so re-registration is pure waste;
    ``force=True`` re-registers (e.g. after an external view drop).
    A memo hit still re-pins load_table's documented session confs
    (UTC timeZone, nanosAsLong) so the per-call contract holds even
    when a driver mutated the session between catalog queries."""
    if (
        not force
        and _REGISTER_STATE["spark"] is spark
        and _REGISTER_STATE["sf_dir"] == sf_dir
    ):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return _REGISTER_STATE["dfs"]
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    _REGISTER_STATE["spark"] = spark
    _REGISTER_STATE["sf_dir"] = sf_dir
    _REGISTER_STATE["dfs"] = dfs
    return dfs
