"""ora_ch_spark — a PySpark-native rebuild of the capabilities of
AlexGruPerm/ora_ch (an Oracle→ClickHouse batch-ETL + analytic
materialization orchestrator).

The reference (see SURVEY.md) exposes two capabilities:

1. ``POST /task`` — declarative bulk table sync with five load
   operations (recreate / append_where / append_bymax / append_notin /
   update) — reference ``task/TaskLogic.scala:243-373``.
2. ``POST /calc`` — parameterized analytic SQL materialization +
   export — reference ``calc/CalcLogic.scala:185-201``.

This package re-expresses both Spark-first: DataFrame/SQL logical
plans, Catalyst optimization, JDBC/parquet sources and sinks, plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) the reference lacks.
"""

from ora_ch_spark.session import get_spark
from ora_ch_spark.io import TABLES, load_table, load_tables, register_views
from ora_ch_spark.specs import (
    CalcQuery,
    Operation,
    QueryMeta,
    QueryParam,
    TableSpec,
    TaskSpec,
)
from ora_ch_spark.store import TableStore

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "register_views",
    "TABLES",
    "TableSpec",
    "TaskSpec",
    "Operation",
    "CalcQuery",
    "QueryMeta",
    "QueryParam",
    "TableStore",
]

__version__ = "0.1.0"
