"""End-to-end service tests: real HTTP requests against the live
server driving real Spark jobs (the reference's §3.1/§3.2 lifecycle)."""

from __future__ import annotations

import http.client
import json
import tempfile
import threading
import time

import pytest

from ora_ch_spark.api import OraChSparkService, make_server
from ora_ch_spark.plans.calc import CalcEngine
from ora_ch_spark.plans.scheduler import TaskScheduler
from ora_ch_spark.sources.parquet import parquet_source
from ora_ch_spark.specs import ParamType, QueryMeta, QueryParam
from ora_ch_spark.store import TableStore


@pytest.fixture(scope="module")
def service(spark, sf_smoke):
    store = TableStore(spark, tempfile.mkdtemp(prefix="api_store_"))
    sched = TaskScheduler(
        spark, store, source_loader=parquet_source(spark, sf_smoke)
    )
    from ora_ch_spark.io import register_views

    register_views(spark, sf_smoke)
    meta = QueryMeta(
        query_id=1,
        ch_table="ch_rev",
        ora_table="rev",
        query=(
            "select o_orderstatus, count(*) as n, "
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total "
            "from orders where o_totalprice > {thr:Decimal(38,6)} "
            "group by o_orderstatus"
        ),
        params=(QueryParam("thr", ParamType.DECIMAL, 1),),
        ch_schema="ch",
        ora_schema="ora",
    )
    calc = CalcEngine(spark, store, {1: meta}, runlog=sched.runlog)
    svc = OraChSparkService(sched, calc, key_columns={"lineitem": ["l_orderkey", "l_linenumber"]})
    server = make_server(svc, port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield svc, server, store
    server.shutdown()


def _req(server, method: str, path: str, body: dict | None = None) -> tuple[int, dict]:
    host, port = server.server_address
    conn = http.client.HTTPConnection(host, port, timeout=120)
    conn.request(
        method, path, body=json.dumps(body) if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def _wait_tasks_done(svc, timeout: float = 120.0) -> None:
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        states = {t.state.value for t in svc.runlog.tasks.values()}
        if states <= {"Finished", "Error"}:
            return
        time.sleep(0.2)
    raise TimeoutError("tasks did not finish")


def test_post_task_end_to_end(service):
    svc, server, store = service
    status, out = _req(server, "POST", "/task", {
        "parallel": {"degree": 4},
        "schemas": [{
            "schema": "ch",
            "tables": [
                {"name": "region", "operation": "recreate"},
                {"name": "nation", "operation": "recreate"},
                {"name": "orders", "operation": "recreate",
                 "where_filter": "o_totalprice > 100000",
                 "only_columns": "o_orderkey,o_custkey,o_totalprice"},
            ],
        }],
    })
    assert status == 200 and "taskid" in out, out
    _wait_tasks_done(svc)
    assert store.table_exists("ch", "region")
    assert store.row_count("ch", "region") == 5
    assert store.columns("ch", "orders") == ["o_orderkey", "o_custkey", "o_totalprice"]
    status, state = _req(server, "GET", "/state")
    assert status == 200
    by_table = {t["table"]: t for t in state["tables"]}
    assert by_table["ch.region"]["state"] == "finished_recreate"
    assert by_table["ch.orders"]["copied_records_count"] > 0


def test_post_task_validation_error(service):
    svc, server, _ = service
    status, out = _req(server, "POST", "/task", {
        "schemas": [{"schema": "ch", "tables": [
            {"name": "region", "operation": "append_where"},  # missing where_filter
        ]}],
    })
    assert status == 400 and "where_filter" in out["error"]


def test_post_calc_end_to_end(service):
    svc, server, store = service
    status, out = _req(server, "POST", "/calc", {
        "queries": [{
            "query_id": 1,
            "params": [{"name": "thr", "value": "50000"}],
        }],
    })
    assert status == 200 and out["queries"] == [1]
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        q = svc.runlog.queries.get(1)
        if q and q.state in ("finished", "error"):
            break
        time.sleep(0.2)
    assert svc.runlog.queries[1].state == "finished"
    assert store.table_exists("ch", "ch_rev")
    assert store.table_exists("ora", "rev")
    assert store.row_count("ora", "rev") == store.row_count("ch", "ch_rev")


def test_unknown_endpoint_404(service):
    _, server, _ = service
    status, _ = _req(server, "GET", "/nope")
    assert status == 404


def test_post_calc_with_local_cache_and_parts(service, spark):
    """/calc with copy_to_local_cache + hash-sliced export through the
    live server: keyed local-cache promotion via QueryMeta.local_cache_keys."""
    svc, server, store = service
    from ora_ch_spark.specs import ParamType, QueryMeta, QueryParam

    meta = QueryMeta(
        query_id=2,
        ch_table="ch_seg",
        ora_table="seg",
        query=(
            "select c_mktsegment as seg, count(*) as n, "
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total "
            "from orders join customer on o_custkey = c_custkey "
            "where o_totalprice > {thr:Decimal(38,6)} group by c_mktsegment"
        ),
        params=(QueryParam("thr", ParamType.DECIMAL, 1),),
        ch_schema="ch",
        ora_schema="ora",
        local_cache_keys=("seg",),
    )
    svc.calc.catalog[2] = meta
    # pre-seed the local cache with a stale row that must be replaced
    # (key overlap) and one that must survive (no overlap)
    stale = spark.createDataFrame(
        [("BUILDING", -1, -1.0), ("GHOST_SEGMENT", 7, 7.0)], ["seg", "n", "total"]
    )
    store.create_database("ch")
    store.write("ch", "seg", stale)

    status, out = _req(server, "POST", "/calc", {
        "queries": [{
            "query_id": 2,
            "copy_to_local_cache": 1,
            "copy_by_parts_key": "seg",
            "copy_by_parts_cnt": 3,
            "params": [{"name": "thr", "value": "100000"}],
        }],
    })
    assert status == 200
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        q = svc.runlog.queries.get(2)
        if q and q.state in ("finished", "error"):
            break
        time.sleep(0.2)
    assert svc.runlog.queries[2].state == "finished"
    local = {r.seg: (r.n, r.total) for r in spark.createDataFrame(
        store.read("ch", "seg").collect(), store.read("ch", "seg").schema).collect()}
    assert local["GHOST_SEGMENT"] == (7, 7.0), "non-overlapping cached row must survive"
    assert local["BUILDING"][0] > 0, "overlapping key must be replaced with fresh data"
    assert store.row_count("ora", "seg") == store.row_count("ch", "ch_seg")


def test_runlog_restores_from_wal_and_serves_state(spark, sf_smoke):
    """§1.4 parity (VERDICT r01 #5): the run log persists every
    transition; a restarted process rebuilds the registry from the
    sink and serves GET /state from persisted rows; flush_to_store
    materializes the reference's three queryable log tables."""
    import os

    from ora_ch_spark.runlog import RunLog, State
    from ora_ch_spark.specs import Operation, TableSpec, TaskSpec

    wal = os.path.join(tempfile.mkdtemp(prefix="runlog_wal_"), "runlog.jsonl")
    store = TableStore(spark, tempfile.mkdtemp(prefix="runlog_store_"))
    sched = TaskScheduler(
        spark, store, source_loader=parquet_source(spark, sf_smoke),
        runlog=RunLog(path=wal),
    )
    task = TaskSpec(tables=(
        TableSpec(schema="ch", name="region", operation=Operation.RECREATE),
        TableSpec(schema="ch", name="nation", operation=Operation.RECREATE),
    ), degree=2)
    sched.run_task(task)

    # ---- "restart": rebuild purely from the WAL file ----
    restored = RunLog.restore(wal)
    assert {t.state for t in restored.tasks.values()} == {State.FINISHED}
    by_table = {r.table: r for r in restored.tables}
    assert by_table["region"].state == "finished_recreate"
    assert by_table["region"].copied_records_count == 5
    assert by_table["nation"].copied_records_count == 25
    assert by_table["nation"].speed_rows_sec is not None

    # GET /state serves from the restored registry
    restored_sched = TaskScheduler(
        spark, store, source_loader=parquet_source(spark, sf_smoke), runlog=restored
    )
    svc = OraChSparkService(restored_sched)
    state = svc.state()
    assert state["tables"] and all(
        t["state"].startswith("finished_") for t in state["tables"]
    )

    # ---- queryable log tables with the reference's names ----
    restored.flush_to_store(store)
    tasks_df = store.read("orach", "ora_to_ch_tasks")
    tt_df = store.read("orach", "ora_to_ch_tasks_tables")
    assert tasks_df.filter("state = 'Finished'").count() == len(restored.tasks)
    got = {
        (r["table_name"], r["state"], r["copied_records_count"])
        for r in tt_df.collect()
    }
    assert ("region", "finished_recreate", 5) in got
    assert ("nation", "finished_recreate", 25) in got
    # restored log keeps appending to the same WAL
    restored.create_task()
    assert RunLog.restore(wal).tasks  # replay still parses
