"""Run-log state machine — operational metadata parity.

The reference persists task / table / query state to Oracle log
tables (``ora_to_ch_tasks``, ``ora_to_ch_tasks_tables``,
``ora_to_ch_query_log`` — SURVEY.md §1.4, ``ora/jdbcSession.scala``).
State strings follow ``common/State.scala:5-24`` and the per-table
final status ``finished_<oper>`` (``table/Table.scala:94-95``).

Here the log is an in-memory registry + JSONL sink (swappable for a
JDBC writer); the same rows, the same lifecycle:

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
from dataclasses import dataclass, field
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
        self._next_id = 1
        self.tasks: dict[int, TaskRun] = {}
        self.tables: list[TableRun] = []
        self.queries: dict[int, QueryRun] = {}
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _emit(self, kind: str, row: dict) -> None:
        if not self.path:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps({"kind": kind, "ts": time.time(), **row}) + "\n")

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
        self._emit("task", {"task_id": task_id, "state": State.READY.value})
        return task_id

    def set_task_state(self, task_id: int, state: State) -> None:
        with self._lock:
            self.tasks[task_id].state = state
        self._emit("task", {"task_id": task_id, "state": state.value})

    def finish_task(self, task_id: int) -> None:
        with self._lock:
            t = self.tasks[task_id]
            t.state, t.end_ts = State.FINISHED, time.time()
        self._emit("task", {"task_id": task_id, "state": State.FINISHED.value})

    def task_error(self, task_id: int, msg: str) -> None:
        with self._lock:
            t = self.tasks[task_id]
            t.state, t.end_ts = State.ERROR, time.time()
            t.error_msg = msg[:ERROR_MSG_LIMIT]
        self._emit("task", {"task_id": task_id, "state": "error", "error_msg": msg[:200]})

    # ---- per-table lifecycle (ora_to_ch_tasks_tables) --------------
    def begin_table(self, task_id: int, schema: str, table: str, operation: str) -> TableRun:
        run = TableRun(task_id, schema, table, operation, state="copying", begin_ts=time.time())
        with self._lock:
            self.tables.append(run)
        self._emit("table", {"task_id": task_id, "table": f"{schema}.{table}", "state": "copying"})
        return run

    def table_progress(self, run: TableRun, copied: int) -> None:
        """Progress + speed_rows_sec (ora/jdbcSession.scala:552-579)."""
        with self._lock:
            run.copied_records_count = copied
            elapsed = max(time.time() - (run.begin_ts or time.time()), 1e-9)
            run.speed_rows_sec = round(copied / elapsed)

    def finish_table(self, run: TableRun, copied: int) -> None:
        with self._lock:
            run.end_ts = time.time()
            run.copied_records_count = copied
            elapsed = max(run.end_ts - (run.begin_ts or run.end_ts), 1e-9)
            run.speed_rows_sec = round(copied / elapsed)
            # final status string per table/Table.scala:94-95
            run.state = f"finished_{run.operation}"
        self._emit(
            "table",
            {
                "task_id": run.task_id,
                "table": f"{run.schema}.{run.table}",
                "state": run.state,
                "copied_records_count": copied,
                "speed_rows_sec": run.speed_rows_sec,
            },
        )

    def table_error(self, run: TableRun, msg: str) -> None:
        with self._lock:
            run.state, run.end_ts = "error", time.time()
            run.error_msg = msg[:ERROR_MSG_LIMIT]
        self._emit("table", {"task_id": run.task_id, "table": f"{run.schema}.{run.table}", "state": "error"})

    # ---- calc lifecycle (ora_to_ch_query_log) ----------------------
    def begin_query(self, query_id: int, par_degree: int | None = None) -> QueryRun:
        run = QueryRun(query_id=query_id, begin_calc=time.time(), par_degree=par_degree)
        with self._lock:
            self.queries[query_id] = run
        self._emit("query", {"query_id": query_id, "state": "calculation"})
        return run

    def query_stage(self, run: QueryRun, stage: str) -> None:
        now = time.time()
        with self._lock:
            run.state = stage
            if stage == "copying":
                run.end_calc, run.begin_copy = now, now
            elif stage == "finished":
                run.end_copy = run.end_copy or now
        self._emit("query", {"query_id": run.query_id, "state": stage})

    def query_error(self, run: QueryRun, msg: str) -> None:
        with self._lock:
            run.state = "error"
            run.error_msg = msg[:ERROR_MSG_LIMIT]
        self._emit("query", {"query_id": run.query_id, "state": "error"})
