"""DuckDB differential parity — the local replica of the driver's
correctness gate (CORRECTNESS_r{N}.json): for every catalog entry,
the Spark result and the DuckDB oracle must agree on row count,
column names, and exact values (rows and columns order-insensitive).

This generalizes the reference's own validation method: a golden
aggregate computed on two systems and compared
(``v_cache_for_calc_6184_4626.txt:2-4``).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from ora_ch_spark.catalog import all_queries
from ora_ch_spark.io import TABLES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    # dtype-KIND parity before any normalization: the driver's value
    # hash is dtype-sensitive, so an oracle column arriving as float64
    # where Spark emits int64 hash-mismatches even when every value is
    # equal. Root cause seen in r4: DuckDB sum(BIGINT) returns HUGEINT
    # → pandas float64 — always cast such sums in oracle SQL.
    for c in spark_pdf.columns:
        ka = spark_pdf[c].dtype.kind
        kb = duck_pdf[c].dtype.kind
        ka = "i" if ka == "u" else ka
        kb = "i" if kb == "u" else kb
        assert ka == kb, (
            f"{name}.{c}: dtype kind {spark_pdf[c].dtype} (spark) vs "
            f"{duck_pdf[c].dtype} (oracle) — cast both sides to the same "
            f"type (HUGEINT sums need cast(... as bigint))"
        )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        col_a, col_b = a[c], b[c]
        if pd.api.types.is_float_dtype(col_a):
            mism = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(col_a, col_b))
                if not (
                    (isinstance(x, float) and isinstance(y, float) and math.isnan(x) and math.isnan(y))
                    or x == y
                )
            ]
        else:
            mism = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(col_a, col_b))
                if not ((pd.isna(x) and pd.isna(y)) or x == y)
            ]
        assert not mism, f"{name}.{c}: {len(mism)} mismatches, first: {mism[:3]}"


@pytest.mark.parametrize(
    "qdef", [q for q in all_queries() if q.oracle], ids=lambda q: q.name
)
def test_query_matches_duckdb_oracle(spark, sf_correct, qdef):
    # entries persist intermediates internally (bench.py does the same
    # between entries): drop the previous entry's leftovers so ~90
    # queries' caches don't accumulate across the session
    spark.catalog.clearCache()
    sdf = qdef.spark(spark, sf_correct)
    spark_pdf = sdf.toPandas()
    con = _duck(sf_correct)
    duck_pdf = con.execute(qdef.oracle).fetchdf()
    con.close()
    _compare(qdef.name, spark_pdf, duck_pdf)


@pytest.mark.parametrize(
    "qdef", [q for q in all_queries() if q.oracle is None], ids=lambda q: q.name
)
def test_rows_only_queries_run(spark, sf_correct, qdef):
    assert qdef.spark(spark, sf_correct).count() >= 0
