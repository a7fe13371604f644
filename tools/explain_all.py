#!/usr/bin/env python
"""Capture .explain("formatted") for catalog entries (guide §1 /
§7.2) and a one-line plan-shape summary per entry (Exchange count,
join strategies, Python-boundary nodes, pushed filters).

Usage:
    python tools/explain_all.py                 # all entries, summary only
    python tools/explain_all.py --write SUFFIX name1 name2 ...
        # writes plans/r14/<name>_<SUFFIX>.txt for the named entries

Plans are captured lazily (no execution) at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ora_ch_spark.catalog import all_queries  # noqa: E402
from ora_ch_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def plan_text(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def summarize(txt: str) -> str:
    counts = {}
    for pat, label in [
        (r"\bExchange\b", "Exchange"),
        (r"\bBroadcastExchange\b", "BroadcastExchange"),
        (r"\bSortMergeJoin\b", "SMJ"),
        (r"\bBroadcastHashJoin\b", "BHJ"),
        (r"\bShuffledHashJoin\b", "SHJ"),
        (r"\bBroadcastNestedLoopJoin\b", "BNLJ"),
        (r"\bCartesianProduct\b", "CARTESIAN"),
        (r"\bBatchEvalPython\b", "BatchEvalPython"),
        (r"\bArrowEvalPython\b", "ArrowEvalPython"),
        (r"\bMapInPandas\b|\bMapInArrow\b|\bPythonMapInArrow\b", "MapInArrow/Pandas"),
        (r"\bFlatMapGroupsInPandas\b", "FlatMapGroupsInPandas"),
        (r"\bWindow\b", "Window"),
        (r"\bScan parquet\b", "ParquetScan"),
        (r"\bRowToColumnar\b|\bColumnarToRow\b", "col<->row"),
    ]:
        n = len(re.findall(pat, txt))
        if n:
            counts[label] = n
    # Exchange includes BroadcastExchange in the regex count; separate
    ex = counts.get("Exchange", 0) - counts.get("BroadcastExchange", 0)
    if "Exchange" in counts:
        counts["Exchange"] = ex
    return ", ".join(f"{k}={v}" for k, v in counts.items())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    write_suffix = None
    names = None
    if args and args[0] == "--write":
        write_suffix = args[1]
        names = set(args[2:])
    spark = get_spark(app_name="ora_ch_explain")
    outdir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(outdir, exist_ok=True)
    for q in all_queries():
        if names is not None and q.name not in names:
            continue
        try:
            df = q.spark(spark, sf_dir)
            txt = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{q.name}: ERROR {type(exc).__name__}: {exc}"[:300])
            continue
        print(f"{q.name}: {summarize(txt)}")
        if write_suffix:
            with open(
                os.path.join(outdir, f"{q.name}_{write_suffix}.txt"), "w"
            ) as fh:
                fh.write(txt)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
