"""CLI: ``python -m ora_ch_spark <command>``.

Commands:

- ``serve [--port 8081] [--data DIR] [--warehouse DIR]`` — start the
  HTTP service (POST /task, POST /calc, GET /state), parquet-backed.
- ``run-task SPEC.json [--data DIR] [--warehouse DIR]`` — run one
  task spec (same JSON shape as POST /task) and print the results.
- ``bench`` — run the benchmark (same as ``python bench.py``).
- ``optimize SCHEMA.TABLE [--cluster-by a,b] [--files N]`` — OPTIMIZE
  FINAL: fold append groups into few large files; with
  ``--cluster-by``, Z-order the rewrite so zone-map pruning holds.
- ``refresh-view SCHEMA.TABLE --view SCHEMA.TABLE --group-by k
  --value v`` — incremental materialized-aggregate refresh
  (manifest-delta IVM).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ora_ch_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_serve = sub.add_parser("serve", help="start the HTTP service")
    p_serve.add_argument("--port", type=int, default=8081)
    p_serve.add_argument("--data", default="/root/testdata/sf0.01")
    p_serve.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")

    p_task = sub.add_parser("run-task", help="run a task spec JSON file")
    p_task.add_argument("spec")
    p_task.add_argument("--data", default="/root/testdata/sf0.01")
    p_task.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")
    p_task.add_argument("--validate", action="store_true",
                        help="golden count/sum reconciliation after full copies")

    sub.add_parser("bench", help="run the benchmark")

    sub.add_parser("catalog", help="list catalog queries (name + description)")

    p_exp = sub.add_parser("explain", help="print a catalog query's physical plan")
    p_exp.add_argument("query", help="catalog entry name (see `catalog`)")
    p_exp.add_argument("--data", default="/root/testdata/sf0.01")
    p_exp.add_argument("--mode", default="formatted",
                       choices=["simple", "extended", "formatted", "cost"])

    p_opt = sub.add_parser("optimize", help="compact a store table (OPTIMIZE FINAL)")
    p_opt.add_argument("table", help="SCHEMA.TABLE")
    p_opt.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")
    p_opt.add_argument("--cluster-by", default=None,
                       help="comma-separated columns: Z-order the rewrite")
    p_opt.add_argument("--files", type=int, default=None)

    p_ttl = sub.add_parser("ttl", help="expire rows older than a cutoff (TTL DELETE)")
    p_ttl.add_argument("table", help="SCHEMA.TABLE")
    p_ttl.add_argument("--ts-col", required=True)
    p_ttl.add_argument("--older-than", required=True,
                       help="ISO timestamp cutoff, e.g. 2024-01-11T00:00:00")
    p_ttl.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")

    p_vac = sub.add_parser(
        "vacuum",
        help="reclaim crash orphans (unreferenced data groups / "
             "manifest shards) of a store table",
    )
    p_vac.add_argument("table", help="SCHEMA.TABLE")
    p_vac.add_argument("--older-than-sec", type=float, default=None,
                       help="age floor for unreferenced debris "
                            "(default: the store retention window)")
    p_vac.add_argument("--force", action="store_true",
                       help="allow --older-than-sec below 60: writers in "
                            "OTHER processes are only mtime-protected, so "
                            "a tiny grace can delete their in-flight groups")
    p_vac.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")

    p_dd = sub.add_parser("deduplicate",
                          help="OPTIMIZE DEDUPLICATE: drop duplicate rows")
    p_dd.add_argument("table", help="SCHEMA.TABLE")
    p_dd.add_argument("--by", default=None, help="comma-separated key columns")
    p_dd.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")

    p_ivm = sub.add_parser("refresh-view",
                           help="incremental materialized-aggregate refresh")
    p_ivm.add_argument("table", help="source SCHEMA.TABLE")
    p_ivm.add_argument("--view", required=True, help="view SCHEMA.TABLE")
    p_ivm.add_argument("--group-by", required=True,
                       help="comma-separated group columns")
    p_ivm.add_argument("--value", required=True, help="summed value column")
    p_ivm.add_argument("--warehouse", default="/tmp/ora_ch_spark_warehouse")

    args = ap.parse_args(argv)

    if args.cmd == "catalog":
        from ora_ch_spark.catalog import all_queries

        for i, q in enumerate(all_queries()):
            gate = "gate" if i < 50 else "tail"
            print(f"{i:3d} [{gate}] {q.name:28s} {q.description}")
        return 0

    if args.cmd == "explain":
        from ora_ch_spark.catalog import all_queries
        from ora_ch_spark.session import get_spark as _gs

        qd = {q.name: q for q in all_queries()}.get(args.query)
        if qd is None:
            print(f"unknown catalog query: {args.query}", file=sys.stderr)
            return 2
        spark = _gs(app_name="ora_ch_spark_explain")
        qd.spark(spark, args.data).explain(args.mode)
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from ora_ch_spark.session import get_spark
    from ora_ch_spark.store import TableStore

    spark = get_spark(app_name=f"ora_ch_spark_{args.cmd}")
    store = TableStore(spark, args.warehouse)

    if args.cmd == "optimize":
        schema, table = args.table.split(".", 1)
        cluster = args.cluster_by.split(",") if args.cluster_by else None
        store.compact(schema, table, target_partitions=args.files,
                      cluster_by=cluster)
        m = store._manifest(schema, table)
        print(json.dumps({"table": args.table, "files": len(m["files"]),
                          "rows": m["rows"], "clustered_by": cluster}))
        return 0

    if args.cmd == "vacuum":
        schema, table = args.table.split(".", 1)
        if (args.older_than_sec is not None and args.older_than_sec < 60
                and not args.force):
            # the in-flight registry protects only THIS process's
            # writers; cross-process in-flight groups have nothing but
            # the mtime grace, which a near-zero floor disables
            print("vacuum: --older-than-sec below 60 can delete another "
                  "process's in-flight write (only the mtime grace "
                  "protects cross-process writers); pass --force to "
                  "proceed", file=sys.stderr)
            return 2
        removed = store.vacuum(schema, table,
                               older_than_sec=args.older_than_sec)
        print(json.dumps({"table": args.table, "removed": removed}))
        return 0

    if args.cmd == "ttl":
        import datetime as _dt

        schema, table = args.table.split(".", 1)
        store.apply_ttl(schema, table, args.ts_col,
                        _dt.datetime.fromisoformat(args.older_than))
        m = store._manifest(schema, table)
        print(json.dumps({"table": args.table, "rows": m["rows"]}))
        return 0

    if args.cmd == "deduplicate":
        schema, table = args.table.split(".", 1)
        store.deduplicate(schema, table,
                          by=args.by.split(",") if args.by else None)
        m = store._manifest(schema, table)
        print(json.dumps({"table": args.table, "rows": m["rows"]}))
        return 0

    if args.cmd == "refresh-view":
        from ora_ch_spark.operators.incremental import refresh_agg_view

        schema, table = args.table.split(".", 1)
        vschema, vtable = args.view.split(".", 1)
        v = refresh_agg_view(store, (schema, table), (vschema, vtable),
                             args.group_by.split(","), args.value)
        print(json.dumps({"view": args.view, "rows": v.count()}))
        return 0

    from ora_ch_spark.plans.scheduler import TaskScheduler
    from ora_ch_spark.sources.parquet import parquet_source

    sched = TaskScheduler(spark, store, source_loader=parquet_source(spark, args.data))

    if args.cmd == "run-task":
        from ora_ch_spark.api import task_spec_from_json

        with open(args.spec) as f:
            body = json.load(f)
        results = sched.run_task(
            task_spec_from_json(body), validate_golden=args.validate
        )
        print(json.dumps({"results": results}))
        return 0

    if args.cmd == "serve":
        from ora_ch_spark.api import OraChSparkService, make_server

        service = OraChSparkService(sched)
        server = make_server(service, port=args.port)
        print(f"ora_ch_spark service on http://127.0.0.1:{server.server_address[1]}")
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
