"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full catalog
(ora_ch_spark/catalog.py) for the DuckDB differential gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ora_ch_spark.catalog import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ora_ch_spark.catalog import flagship_star

    return flagship_star(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark for q in all_queries()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries() if q.oracle is not None}
