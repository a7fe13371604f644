#!/usr/bin/env python
"""Time a subset of catalog entries with bench.py's methodology
(noop sink, full physical execution, per-entry clearCache) — for
before/after evidence on targeted optimizations without re-running
the whole suite.

Usage: python tools/time_entries.py name1 name2 ...
Prints one JSON line: {"queries": {name: sec}, "sf": ...}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ora_ch_spark.catalog import all_queries  # noqa: E402
from ora_ch_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark()
    qdefs = {q.name: q for q in all_queries()}
    missing = [n for n in names if n not in qdefs]
    if missing:
        print(f"unknown entries: {missing}", file=sys.stderr)
        sys.exit(2)
    # warm the JVM + parquet footer caches the same way bench.py's
    # warm-up does, so single-entry numbers compare to in-suite ones
    from ora_ch_spark.io import register_views

    register_views(spark, sf_dir)
    # two passes, min per entry — bench.py's methodology (first pass
    # pays JIT tier-up / footer-cache warm-up for the early entries)
    out: dict[str, float] = {}
    for _ in range(2):
        for n in names:
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(f"time_entries:{n}")
            t0 = time.perf_counter()
            df = qdefs[n].spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sec = round(time.perf_counter() - t0, 3)
            out[n] = min(out.get(n, sec), sec)
            print(f"{n}: {sec}", file=sys.stderr)
    print(json.dumps({"queries": out, "sf": sf}))


if __name__ == "__main__":
    main()
