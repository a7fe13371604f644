"""HTTP façade — the reference's service surface, Spark-backed.

The reference exposes exactly two endpoints
(``server/WServer.scala:146-154``):

- ``POST /task`` — JSON task spec → bulk table sync (§3.1);
- ``POST /calc`` — JSON calc spec → materialize + export (§3.2);

with: single-flight guard (busy → error text naming the log tables,
``WServer.scala:38-52``), the task forked as a daemon and the HTTP
response waiting for the generated taskId (poll every 250 ms up to 60
s — ``WServer.scala:105-120``), and errors captured into the run log
(``:58-76``).

JSON field names mirror ``request/ReqNewTask.scala`` /
``calc/ReqCalcSrc.scala``:

    {"parallel": {"degree": 4},
     "schemas": [{"schema": "msk_arm_lead",
                  "tables": [{"name": "lineitem",
                              "operation": "append_notin",
                              "sync_by_columns": "l_orderkey,l_linenumber"}]}]}

    {"queries": [{"query_id": 6184, "order_by": 0,
                  "copy_by_parts_key": "code", "copy_by_parts_cnt": 4,
                  "params": [{"name": "seg", "value": "BUILDING"}]}]}

Implemented on stdlib ``http.server`` (no web framework in the
image); one ``ThreadingHTTPServer``, jobs on daemon threads — the
Spark session is shared and thread-safe (each job runs independent
actions, interleaved by the scheduler / FAIR pools).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ora_ch_spark.plans.calc import CalcEngine
from ora_ch_spark.plans.scheduler import TaskAlreadyRunning, TaskScheduler
from ora_ch_spark.runlog import RunLog
from ora_ch_spark.specs import CalcQuery, Operation, SpecError, TableSpec, TaskSpec

TASKID_POLL_SEC = 0.25  # WServer.scala:106
TASKID_WAIT_SEC = 60.0  # app/MainApp.scala:28
BUSY_MSG = (
    "Server is busy, look at tables: ora_to_ch_tasks, "
    "ora_to_ch_tasks_tables"  # WServer.scala:48 wording
)


def _split(v: str | list[str] | None) -> tuple[str, ...] | None:
    if v is None:
        return None
    if isinstance(v, list):
        return tuple(v)
    return tuple(s.strip() for s in str(v).split(",") if s.strip())


def table_spec_from_json(schema: str, d: dict) -> TableSpec:
    """Decode one table dict (field names per ``request/ReqNewTask.scala``)."""
    return TableSpec(
        schema=schema,
        name=d["name"],
        operation=Operation(d["operation"]),
        where_filter=d.get("where_filter"),
        sync_by_column_max=d.get("sync_by_column_max"),
        sync_by_columns=_split(d.get("sync_by_columns")),
        update_fields=_split(d.get("update_fields")),
        sync_update_by_column_max=d.get("sync_update_by_column_max"),
        order_by_ora_data=d.get("order_by_ora_data"),
        src_table_full_name=d.get("src_table_full_name"),
        only_columns=_split(d.get("only_columns")),
        clr_ora_table_aft_upd=bool(d.get("clr_ora_table_aft_upd", 0)),
        notnull_columns=_split(d.get("notnull_columns")) or (),
        ch_datetime_clamp=bool(d.get("ch_datetime_clamp", 0)),
    )


def task_spec_from_json(d: dict) -> TaskSpec:
    tables = tuple(
        table_spec_from_json(s["schema"], t)
        for s in d["schemas"]
        for t in s["tables"]
    )
    return TaskSpec(tables=tables, degree=int(d.get("parallel", {}).get("degree", 2)))


def calc_queries_from_json(d: dict) -> list[CalcQuery]:
    return [
        CalcQuery(
            query_id=int(q["query_id"]),
            order_by=int(q.get("order_by", 0)),
            copy_to_local_cache=bool(q.get("copy_to_local_cache", 0)),
            copy_by_parts_key=q.get("copy_by_parts_key"),
            copy_by_parts_cnt=(
                int(q["copy_by_parts_cnt"]) if q.get("copy_by_parts_cnt") else None
            ),
            params={p["name"]: str(p["value"]) for p in q.get("params", [])},
        )
        for q in d["queries"]
    ]


class OraChSparkService:
    """Wires scheduler + calc engine behind the two endpoints."""

    def __init__(
        self,
        scheduler: TaskScheduler,
        calc_engine: CalcEngine | None = None,
        runlog: RunLog | None = None,
        key_columns: dict[str, list[str]] | None = None,
    ):
        self.scheduler = scheduler
        self.calc = calc_engine
        self.runlog = runlog or scheduler.runlog
        self.key_columns = key_columns or {}
        self._calc_busy = threading.Lock()

    # ---- POST /task ------------------------------------------------
    def start_task(self, body: dict) -> dict:
        task = task_spec_from_json(body)  # SpecError → 400 upstream
        before_ids = self.runlog.task_ids()
        result_holder: dict = {}

        def run() -> None:
            try:
                result_holder["results"] = self.scheduler.run_task(
                    task, key_columns=self.key_columns
                )
            except TaskAlreadyRunning:
                result_holder["busy"] = True
            except Exception as e:  # captured in runlog by scheduler
                result_holder["error"] = repr(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        # taskId handshake: poll the repo for the new task id
        # (reference: 250 ms × up to 60 s)
        deadline = time.monotonic() + TASKID_WAIT_SEC
        while time.monotonic() < deadline:
            if result_holder.get("busy"):
                raise TaskAlreadyRunning(BUSY_MSG)
            new_ids = self.runlog.task_ids() - before_ids
            if new_ids:
                return {"taskid": min(new_ids)}
            if result_holder.get("error"):
                return {"error": result_holder["error"]}
            time.sleep(TASKID_POLL_SEC)
        return {"error": "timeout waiting for taskid"}

    # ---- POST /calc ------------------------------------------------
    def start_calc(self, body: dict) -> dict:
        if self.calc is None:
            return {"error": "calc engine not configured"}
        queries = calc_queries_from_json(body)
        if not self._calc_busy.acquire(blocking=False):
            raise TaskAlreadyRunning(BUSY_MSG)

        def run() -> None:
            try:
                self.calc.run(queries)
            except Exception:
                pass  # captured in runlog by CalcEngine
            finally:
                self._calc_busy.release()

        threading.Thread(target=run, daemon=True).start()
        return {"queries": [q.query_id for q in queries], "state": "executing"}

    # ---- GET /state ------------------------------------------------
    def state(self) -> dict:
        tasks, tables, queries = self.runlog.snapshot()
        return {
            "tasks": {
                tid: {"state": t.state.value, "error": t.error_msg}
                for tid, t in tasks.items()
            },
            "tables": [
                {
                    "task_id": r.task_id,
                    "table": f"{r.schema}.{r.table}",
                    "operation": r.operation,
                    "state": r.state,
                    "copied_records_count": r.copied_records_count,
                    "speed_rows_sec": r.speed_rows_sec,
                }
                for r in tables
            ],
            "queries": {
                qid: {"state": q.state, "copied_rows": q.copied_rows}
                for qid, q in queries.items()
            },
        }


def make_server(service: OraChSparkService, host: str = "127.0.0.1", port: int = 8081) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self) -> None:  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/task":
                    self._send(200, service.start_task(body))
                elif self.path == "/calc":
                    self._send(200, service.start_calc(body))
                else:
                    self._send(404, {"error": f"no such endpoint {self.path}"})
            except TaskAlreadyRunning as e:
                self._send(409, {"error": str(e)})
            except (SpecError, KeyError, ValueError) as e:
                self._send(400, {"error": repr(e)})
            except Exception as e:
                self._send(500, {"error": repr(e)})

        def do_GET(self) -> None:  # noqa: N802
            if self.path == "/state":
                self._send(200, service.state())
            else:
                self._send(404, {"error": f"no such endpoint {self.path}"})

        def log_message(self, fmt: str, *args) -> None:  # quiet
            pass

    return ThreadingHTTPServer((host, port), Handler)
