"""Run-log state machine — operational metadata parity.

The reference persists task / table / query state to Oracle log
tables (``ora_to_ch_tasks``, ``ora_to_ch_tasks_tables``,
``ora_to_ch_query_log`` — SURVEY.md §1.4, ``ora/jdbcSession.scala``).
State strings follow ``common/State.scala:5-24`` and the per-table
final status ``finished_<oper>`` (``table/Table.scala:94-95``).

Here the log is an in-memory registry backed by a JSONL write-ahead
sink — every transition appends the FULL row, so the registry can be
rebuilt from the file (``RunLog.restore``) and GET /state served from
persisted rows after a restart. ``flush_to_store`` materializes the
three reference log tables (``ora_to_ch_tasks``,
``ora_to_ch_tasks_tables``, ``ora_to_ch_query_log``) as queryable
store tables with the reference's column names; pointing the same
frames at ``sinks.jdbc.jdbc_export`` ships them to a live RDBMS when
a JDBC URL is configured. Lifecycle:

    task:   Ready → Executing → finished | error
    table:  copying → finished_<oper> | error
    query:  calculation → copying → finished | error

Error messages are truncated to 4000 chars exactly as the reference
does (``ora/jdbcSession.scala:472``).
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict, dataclass, field
from enum import Enum


class State(str, Enum):
    # common/State.scala:5-24
    READY = "Ready"
    EXECUTING = "Executing"
    WAIT = "Wait"
    CALCULATION = "Calculation"
    COPYING = "Copying"
    FINISHED = "Finished"
    ERROR = "Error"


ERROR_MSG_LIMIT = 4000  # ora/jdbcSession.scala:472


@dataclass
class TableRun:
    task_id: int
    schema: str
    table: str
    operation: str
    row_id: int = 0  # replay identity for the JSONL WAL
    state: str = "none"
    begin_ts: float | None = None
    end_ts: float | None = None
    copied_records_count: int = 0
    # target row count before the operation — progress deltas are
    # measured against this (reference pre-copy counts,
    # jdbsChSession.scala:299-308)
    base_count: int = 0
    speed_rows_sec: float | None = None
    error_msg: str | None = None


@dataclass
class TaskRun:
    task_id: int
    state: State = State.READY
    begin_ts: float = field(default_factory=time.time)
    end_ts: float | None = None
    error_msg: str | None = None


@dataclass
class QueryRun:
    query_id: int
    state: str = "calculation"
    begin_calc: float | None = None
    end_calc: float | None = None
    begin_copy: float | None = None
    end_copy: float | None = None
    begin_local_copy: float | None = None
    end_local_copy: float | None = None
    copied_rows: int = 0
    par_degree: int | None = None
    error_msg: str | None = None


class RunLog:
    """Thread-safe registry with an optional JSONL audit sink."""

    def __init__(self, path: str | None = None):
        self._lock = threading.Lock()
        self._sink_lock = threading.Lock()
        self._next_id = 1
        self._next_row_id = 1
        self.tasks: dict[int, TaskRun] = {}
        self.tables: list[TableRun] = []
        self.queries: dict[int, QueryRun] = {}
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    @classmethod
    def restore(cls, path: str) -> "RunLog":
        """Rebuild the registry from the JSONL write-ahead sink
        (restart semantics: the reference re-reads its Oracle log
        tables; we replay full-row events, last event per entity
        wins). The restored log continues appending to the same
        file."""
        log = cls(path=None)  # don't re-emit while replaying
        tables: dict[int, TableRun] = {}
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail write — ignore
                    kind = ev.pop("kind", None)
                    ev.pop("ts", None)
                    try:
                        if kind == "task":
                            ev["state"] = State(ev["state"])
                            run = TaskRun(**ev)
                            log.tasks[run.task_id] = run
                        elif kind == "table":
                            run = TableRun(**ev)
                            tables[run.row_id] = run
                        elif kind == "query":
                            run = QueryRun(**ev)
                            log.queries[run.query_id] = run
                    except (TypeError, ValueError, KeyError):
                        continue  # foreign/older event shape — skip, like torn JSON
        log.tables = [tables[k] for k in sorted(tables)]
        log._next_id = max(log.tasks, default=0) + 1
        log._next_row_id = max((t.row_id for t in log.tables), default=0) + 1
        log.path = path
        return log

    def flush_to_store(self, store, schema: str = "orach") -> None:
        """Materialize the three reference log tables (§1.4) as
        queryable store tables with the reference's table/column
        names: ``ora_to_ch_tasks``, ``ora_to_ch_tasks_tables``
        (``ora/jdbcSession.scala:713-728``, ``:429-446``),
        ``ora_to_ch_query_log`` (``:40-66``). The same frames write
        to a live RDBMS via ``sinks.jdbc.jdbc_export`` when a JDBC
        URL is configured."""
        tasks, tables, queries = self.snapshot()
        spark = store.spark
        store.create_database(schema)
        task_rows = [
            (t.task_id, t.state.value if isinstance(t.state, State) else str(t.state),
             t.begin_ts, t.end_ts, t.error_msg)
            for t in tasks.values()
        ]
        from ora_ch_spark.io import local_df

        store.write(
            schema, "ora_to_ch_tasks",
            local_df(
                spark, task_rows,
                "id long, state string, begin_datetime double, "
                "end_datetime double, error_msg string",
            ),
        )
        table_rows = [
            (r.row_id, r.task_id, r.schema, r.table, r.operation, r.state,
             r.begin_ts, r.end_ts, r.copied_records_count,
             None if r.speed_rows_sec is None else float(r.speed_rows_sec),
             r.error_msg)
            for r in tables
        ]
        store.write(
            schema, "ora_to_ch_tasks_tables",
            local_df(
                spark, table_rows,
                "id long, id_task long, schema_name string, table_name string, "
                "operation string, state string, begin_datetime double, "
                "end_datetime double, copied_records_count long, "
                "speed_rows_sec double, error_msg string",
            ),
        )
        query_rows = [
            (q.query_id, q.state, q.begin_calc, q.end_calc, q.begin_copy,
             q.end_copy, q.begin_local_copy, q.end_local_copy, q.copied_rows,
             q.par_degree, q.error_msg)
            for q in queries.values()
        ]
        store.write(
            schema, "ora_to_ch_query_log",
            local_df(
                spark, query_rows,
                "id_query long, state string, begin_calc double, end_calc double, "
                "begin_copy double, end_copy double, begin_local_copy double, "
                "end_local_copy double, copied_rows long, par_degree int, "
                "error_msg string",
            ),
        )

    def _emit(self, kind: str, row) -> None:
        """Append the FULL current row to the JSONL write-ahead sink
        (the reference writes one SQL row per transition,
        ora/jdbcSession.scala:429-446 etc.; full-row events make the
        file replayable)."""
        if not self.path:
            return
        # snapshot under the registry lock: a concurrent transition on
        # the same row must not be observed half-applied (a torn event
        # would replay as the row's final state on restore)
        with self._lock:
            d = asdict(row)
        if isinstance(d.get("state"), State):
            d["state"] = d["state"].value
        with self._sink_lock, open(self.path, "a") as f:
            f.write(json.dumps({"kind": kind, "ts": time.time(), **d}) + "\n")

    # ---- thread-safe snapshots (for concurrent HTTP readers) -------
    def task_ids(self) -> set[int]:
        with self._lock:
            return set(self.tasks.keys())

    def snapshot(self) -> tuple[dict[int, TaskRun], list[TableRun], dict[int, QueryRun]]:
        with self._lock:
            return dict(self.tasks), list(self.tables), dict(self.queries)

    # ---- task lifecycle (ora_to_ch_tasks) --------------------------
    def create_task(self) -> int:
        with self._lock:
            task_id = self._next_id
            self._next_id += 1
            self.tasks[task_id] = TaskRun(task_id=task_id)
        self._emit("task", self.tasks[task_id])
        return task_id

    def set_task_state(self, task_id: int, state: State) -> None:
        with self._lock:
            self.tasks[task_id].state = state
        self._emit("task", self.tasks[task_id])

    def finish_task(self, task_id: int) -> None:
        with self._lock:
            t = self.tasks[task_id]
            t.state, t.end_ts = State.FINISHED, time.time()
        self._emit("task", self.tasks[task_id])

    def task_error(self, task_id: int, msg: str) -> None:
        with self._lock:
            t = self.tasks[task_id]
            t.state, t.end_ts = State.ERROR, time.time()
            t.error_msg = msg[:ERROR_MSG_LIMIT]
        self._emit("task", self.tasks[task_id])

    # ---- per-table lifecycle (ora_to_ch_tasks_tables) --------------
    def begin_table(self, task_id: int, schema: str, table: str, operation: str) -> TableRun:
        run = TableRun(task_id, schema, table, operation, state="copying", begin_ts=time.time())
        with self._lock:
            run.row_id = self._next_row_id
            self._next_row_id += 1
            self.tables.append(run)
        self._emit("table", run)
        return run

    def table_progress(self, run: TableRun, copied: int) -> None:
        """Progress + speed_rows_sec (ora/jdbcSession.scala:552-579)."""
        with self._lock:
            run.copied_records_count = copied
            elapsed = max(time.time() - (run.begin_ts or time.time()), 1e-9)
            run.speed_rows_sec = round(copied / elapsed)
        self._emit("table", run)

    def finish_table(self, run: TableRun, copied: int) -> None:
        with self._lock:
            run.end_ts = time.time()
            run.copied_records_count = copied
            elapsed = max(run.end_ts - (run.begin_ts or run.end_ts), 1e-9)
            run.speed_rows_sec = round(copied / elapsed)
            # final status string per table/Table.scala:94-95
            run.state = f"finished_{run.operation}"
        self._emit("table", run)

    def table_error(self, run: TableRun, msg: str) -> None:
        with self._lock:
            run.state, run.end_ts = "error", time.time()
            run.error_msg = msg[:ERROR_MSG_LIMIT]
        self._emit("table", run)

    # ---- calc lifecycle (ora_to_ch_query_log) ----------------------
    def begin_query(self, query_id: int, par_degree: int | None = None) -> QueryRun:
        run = QueryRun(query_id=query_id, begin_calc=time.time(), par_degree=par_degree)
        with self._lock:
            self.queries[query_id] = run
        self._emit("query", run)
        return run

    def query_stage(self, run: QueryRun, stage: str) -> None:
        now = time.time()
        with self._lock:
            run.state = stage
            if stage == "copying":
                run.end_calc, run.begin_copy = now, now
            elif stage == "finished":
                run.end_copy = run.end_copy or now
        self._emit("query", run)

    def query_error(self, run: QueryRun, msg: str) -> None:
        with self._lock:
            run.state = "error"
            run.error_msg = msg[:ERROR_MSG_LIMIT]
        self._emit("query", run)
