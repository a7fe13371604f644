#!/usr/bin/env python
"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full physical
execution, no driver-side collect). Per-query wall time is the
reference's own metric family (wall ms per operation,
``clickhouse/jdbsChSession.scala:310-313``).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ora_ch_spark.catalog import all_queries  # noqa: E402
from ora_ch_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0
    spark = get_spark(app_name="ora_ch_spark_bench")
    # warm up the JVM + parquet reader so startup cost isn't billed to
    # the first query
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # min of 2 passes per query: single-pass numbers on a shared box
    # swing ±30%, which is noise against the 2x regression bar — the
    # min is the steady-state cost of the plan
    timings: dict[str, float] = {}
    pass_vectors: dict[str, list[float]] = {}
    contended: list[str] = []
    errors: dict[str, str] = {}
    for q in all_queries():
        # operators persist intermediates internally; drop the PREVIOUS
        # entry's leftovers so 40+ queries' caches don't evict each
        # other mid-measurement (each entry measured on its own plan,
        # warm within its two passes)
        spark.catalog.clearCache()
        try:
            passes: list[float] = []
            for _ in range(2):
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                passes.append(time.perf_counter() - t0)
            # r7 post-mortem: three text_* entries read 3-6x high in
            # the driver's bench with the operator untouched — min-of-2
            # is blind to SUSTAINED contention spanning both passes.
            # When the two passes disagree by >1.5x, the entry was
            # measured under interference: take extra passes (up to 2)
            # until two samples agree, and report the min.
            tries = 0
            while tries < 2 and sorted(passes)[1] > 1.5 * min(passes):
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                passes.append(time.perf_counter() - t0)
                tries += 1
            timings[q.name] = round(min(passes), 3)
            # r8 post-mortem: min-of-N is blind to UNIFORM slowdowns
            # (every pass contended → min is still inflated, and the
            # re-sample guard never fires). Record the full pass
            # vector so a cross-round drift on untouched code is
            # diagnosable post-hoc (tight vector + inflated min =
            # machine contention, not a plan change), and flag
            # entries where the re-sample loop exhausted without two
            # agreeing samples.
            pass_vectors[q.name] = [round(p, 3) for p in passes]
            if sorted(passes)[1] > 1.5 * min(passes):
                contended.append(q.name)
        except Exception as exc:  # one broken query must not kill the run
            errors[q.name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {q.name} FAILED: {errors[q.name]}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # the reference's own throughput metric (speed_rows_sec =
    # rows/elapsed, ora/jdbcSession.scala:556-560): total fact-table
    # rows pushed through the five load operations / their wall time.
    # Honesty rules for partial runs: a failed query removes its cost
    # from the total, so `partial` marks the total as a lower bound,
    # and speed_rows_sec is NULLED if any load op failed (a shrunken
    # op_secs would otherwise INFLATE the throughput number).
    op_names = [
        "op_recreate", "op_append_where", "op_append_bymax",
        "op_append_notin", "op_update",
    ]
    op_secs = sum(timings.get(n, 0.0) for n in op_names)
    ops_complete = all(n in timings for n in op_names)
    fact_rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count() * 4
        + spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    )
    result = {
        # the long per-query dict goes FIRST: the driver artifact
        # truncates long lines head-first (r4's line lost its head),
        # so the scalar summary fields must sit at the TAIL to survive
        "queries": timings,
        "passes": pass_vectors,
        "contended": contended,
        "errors": errors,
        "partial": bool(errors),
        "sf": sf,
        "speed_rows_sec": (
            round(fact_rows / op_secs) if op_secs and ops_complete else None
        ),
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
    }
    # durable copy: per-query history must survive even if the stdout
    # line is truncated in the driver artifact
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"),
            "w",
        ) as fh:
            json.dump(result, fh, indent=1)
    except OSError as exc:
        print(f"bench: BENCH.json not written: {exc}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
