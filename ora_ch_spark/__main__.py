"""CLI: ``python -m ora_ch_spark <command>``.

Commands:

- ``serve [--port 8081] [--data DIR] [--warehouse DIR]`` — start the
  HTTP service (POST /task, POST /calc, GET /state), parquet-backed.
- ``run-task SPEC.json [--data DIR] [--warehouse DIR]`` — run one
  task spec (same JSON shape as POST /task) and print the results.
- ``bench`` — run the benchmark (same as ``python bench.py``).
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

    args = ap.parse_args(argv)

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from ora_ch_spark.plans.scheduler import TaskScheduler
    from ora_ch_spark.session import get_spark
    from ora_ch_spark.sources.parquet import parquet_source
    from ora_ch_spark.store import TableStore

    spark = get_spark(app_name=f"ora_ch_spark_{args.cmd}")
    store = TableStore(spark, args.warehouse)
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
