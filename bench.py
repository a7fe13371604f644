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


def bench_queries() -> list:
    """Measurement order (r14 instrument fix, documented in
    OPTIMIZATION_r14.md): DECLARATION order, not the gate-rotation
    order ``all_queries()`` returns. The rotation front-loads entries
    whose implementing files changed since their last driver proof —
    after a round that edits similarity/dedup/pipeline modules, every
    heavy ANN/store entry lands in the suite's first ~50 positions,
    inside the JVM's JIT tier-up and ContextCleaner ramp, and measures
    1.7-2x its quiet cost (r14 baseline probe trace: positions 25-100
    at ratio 1.7-2.0, positions 125+ at 0.5-1.1 on one run). Pinning
    the measurement to declaration order makes per-entry numbers
    comparable across rounds regardless of what the rotation is doing;
    the rotation keeps governing ONLY the driver's correctness
    sampling (all_queries() itself is unchanged)."""
    from ora_ch_spark.catalog import CORE_QUERIES
    from ora_ch_spark.catalog_ext import EXT_QUERIES

    return list(CORE_QUERIES) + list(EXT_QUERIES)


# Canary normalization (r9 verdict item 2, hardened r13): NINE plan-
# diverse, code-stable entries whose quiet-box pass times are PINNED
# below. After each run the canary factor = TRIMMED median
# (highest+lowest ratio dropped once the set is >=5) of current/pinned
# over the canaries; cross-round drift on any entry should be graded
# on canary-normalized numbers (raw_sec / canary_factor) — a factor
# well above 1.0 says the HOST was slow, not the plan. A canary
# measured >3x its pin is RE-RUN once before it enters the median
# (2 of the old 5 canaries were 19-30x contended in the r12 driver
# run — one bad scheduling decision away from a corrupted factor);
# BENCH.json records per-canary accepted/retried so a bad factor is
# diagnosable post-hoc. RE-PINNED r15 (verdict item 4): all nine from
# the r15 quiet-host baseline run (2026-08-17, warmed JVM,
# declaration-order loop, zero contended entries — BENCH.json at the
# re-pin commit). The old r10/r12 pins predate the warmed
# declaration-order loop and sat 1.2-1.8x below quiet-host cost,
# inflating every factor; none of the nine canaries' code changed.
CANARY_BASELINE: dict[float, dict[str, float]] = {
    0.1: {
        "q1_pricing_summary": 1.183,   # scan + wide agg
        "grouped_zscore": 0.498,       # window functions
        "sim_lsh_bucket": 0.257,       # hash project + light shuffle
        "text_fingerprint": 0.896,     # scan-bound text kernel
        "dedup_simhash": 0.744,        # bit-kernel + groupBy
        "string_functions": 0.209,     # expression-only projection
        "events_hourly": 0.340,        # timestamp bucketing agg
        "q6_revenue_change": 0.332,    # pushed-filter scan + scalar agg
        "qw4_rank_topk": 0.436,        # rank window + filter
    },
    0.01: {
        "q1_pricing_summary": 0.304,
        "grouped_zscore": 0.239,
        "sim_lsh_bucket": 0.201,
        "text_fingerprint": 0.285,
        "dedup_simhash": 0.555,
        "string_functions": 0.202,
        "events_hourly": 0.180,
        "q6_revenue_change": 0.218,
        "qw4_rank_topk": 0.432,
    },
}

# re-run a canary whose suite measurement exceeds its pin by this
# factor before letting it vote — a single contended canary must not
# drag the median
CANARY_RETRY_RATIO = 3.0


def _median(vals: list[float]) -> float:
    vals = sorted(vals)
    mid = len(vals) // 2
    return vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2


def canary_factor(
    canary_secs: dict[str, float], sf: float
) -> float | None:
    """Trimmed-median current/pinned ratio over the canary set (None
    when the sf has no pinned baseline or no canary ran). With >=5
    canaries the single highest and lowest ratios are dropped, so one
    contended (or one suspiciously fast) canary never moves the
    factor at all."""
    base = CANARY_BASELINE.get(sf)
    if not base:
        return None
    ratios = sorted(
        canary_secs[n] / p for n, p in base.items()
        if n in canary_secs and p > 0
    )
    if not ratios:
        return None
    if len(ratios) >= 5:
        ratios = ratios[1:-1]
    return round(_median(ratios), 3)


def resolve_canaries(
    spark, sf_dir: str, timings: dict[str, float], sf: float
) -> tuple[float | None, dict[str, dict]]:
    """Per-canary acceptance (r12 verdict item 2): a canary whose
    suite measurement exceeds CANARY_RETRY_RATIO x its pin is re-run
    once — dedicated min-of-2, right now, outside the suite's
    scheduling storm — and the better (min) measurement votes. The
    returned detail records suite_sec / used_sec / pin / ratio /
    status per canary, so a corrupted factor is diagnosable from
    BENCH.json alone."""
    base = CANARY_BASELINE.get(sf) or {}
    by_name = {q.name: q for q in bench_queries()}
    detail: dict[str, dict] = {}
    secs: dict[str, float] = {}
    for name, pin in sorted(base.items()):
        if name not in timings:
            continue
        suite_sec = timings[name]
        used, status = suite_sec, "accepted"
        if pin > 0 and suite_sec > CANARY_RETRY_RATIO * pin and name in by_name:
            redo, _, _, _err, _ = measure(spark, sf_dir, [by_name[name]])
            if name in redo:
                used = min(suite_sec, redo[name])
                status = "retried"
        secs[name] = used
        detail[name] = {
            "suite_sec": suite_sec,
            "used_sec": used,
            "pin": pin,
            "ratio": round(used / pin, 3) if pin > 0 else None,
            "status": status,
        }
    return canary_factor(secs, sf), detail


def warm_jvm(spark, sf_dir: str) -> None:
    """Tier up the JVM before measuring (r13): the first ~25 entries
    of an unwarmed suite measured 1.7x their steady state with TIGHT
    pass vectors — both passes ran on C1/interpreted whole-stage
    codegen, so min-of-N couldn't see it. Three plan-diverse throwaway
    executions (scan+agg, window, shuffle join) cost ~4 s and take the
    JIT penalty off whichever entries the gate ordering happens to
    put first."""
    import contextlib

    li = f"{sf_dir}/lineitem.parquet"
    od = f"{sf_dir}/orders.parquet"
    with contextlib.suppress(Exception):
        for sql in (
            f"select l_returnflag, count(*) n, sum(l_extendedprice) s "
            f"from parquet.`{li}` group by 1",
            f"select l_orderkey, row_number() over (partition by "
            f"l_returnflag order by l_extendedprice) rn from parquet.`{li}`",
            f"select o.o_orderstatus, count(*) n from parquet.`{li}` l "
            f"join parquet.`{od}` o on l.l_orderkey = o.o_orderkey "
            f"group by 1",
        ):
            spark.sql(sql).write.format("noop").mode("overwrite").save()


# every N entries the in-suite loop re-measures one canary as a
# dedicated single-pass PROBE (round-robin, excluded from totals):
# the canary ENTRIES cluster wherever gate ordering puts them
# (positions 11-103 in the r13 order), so the factor alone cannot see
# a drag that builds over the suite — the probe trace makes
# position-dependent host/residue inflation diagnosable post-hoc
PROBE_EVERY = 25


def measure(
    spark, sf_dir: str, qdefs, probe_base: dict | None = None,
    prev_snapshot: dict | None = None,
) -> tuple[dict, dict, list, dict, list]:
    """Measurement loop over ``qdefs`` (min-of-2 with contention
    re-sampling — see inline history notes). ``probe_base`` (the
    sf's canary pins) enables the interleaved probe trace (fifth
    return value; empty list without it). ``prev_snapshot`` (the
    committed BENCH.json per-query dict) enables the r15 per-entry
    variance guard (verdict item 5): an entry whose min-of-passes
    exceeds 1.5x its committed value is re-measured (up to 2 extra
    passes) before being recorded — min-of-2 is blind to SUSTAINED
    contention spanning both passes (r14's sim_topk_ivf_kmeans
    recorded [12.808, 12.422], a 7.7x phantom vs the same code's
    1.77 s on a quiet host). Entries still above the bar after the
    re-measure are listed in ``contended`` so a real plan regression
    stays visible rather than silently retried away."""
    # min of 2 passes per query: single-pass numbers on a shared box
    # swing ±30%, which is noise against the 2x regression bar — the
    # min is the steady-state cost of the plan
    timings: dict[str, float] = {}
    pass_vectors: dict[str, list[float]] = {}
    contended: list[str] = []
    errors: dict[str, str] = {}
    probes: list[dict] = []
    probe_defs = (
        [q for q in qdefs if q.name in probe_base] if probe_base else []
    )
    import gc

    for i, q in enumerate(qdefs):
        # operators persist intermediates internally; drop the PREVIOUS
        # entry's leftovers so 40+ queries' caches don't evict each
        # other mid-measurement (each entry measured on its own plan,
        # warm within its two passes). gc.collect() releases lingering
        # DataFrame refs so the ContextCleaner can reclaim their
        # broadcast / localCheckpoint blocks — 200 entries of residue
        # in one JVM otherwise drags the tail of the suite (r13)
        spark.catalog.clearCache()
        gc.collect()
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
            # r15 variance guard (verdict item 5): min-of-N vs the
            # COMMITTED snapshot — >1.5x the committed value with a
            # tight pass vector means both passes ran under sustained
            # interference; re-measure up to 2 extra passes before
            # recording. (A real plan regression reproduces across
            # the extra passes and stays >1.5x — and is then ALSO
            # flagged in `contended` below for post-hoc triage.)
            prev_val = (prev_snapshot or {}).get(q.name)
            vtries = 0
            while (
                prev_val and vtries < 2 and min(passes) > 1.5 * prev_val
            ):
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                passes.append(time.perf_counter() - t0)
                vtries += 1
            if prev_val and min(passes) > 1.5 * prev_val:
                contended.append(q.name)
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
            if (
                sorted(passes)[1] > 1.5 * min(passes)
                and q.name not in contended
            ):
                contended.append(q.name)
        except Exception as exc:  # one broken query must not kill the run
            errors[q.name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {q.name} FAILED: {errors[q.name]}", file=sys.stderr)
        if probe_defs and (i + 1) % PROBE_EVERY == 0:
            # interleaved canary probe: one dedicated pass of one
            # canary (round-robin), EXCLUDED from totals — the
            # position-tagged ratio trace shows where in the suite
            # host/residue drag builds up
            pq = probe_defs[((i + 1) // PROBE_EVERY - 1) % len(probe_defs)]
            try:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                pq.spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                sec = round(time.perf_counter() - t0, 3)
                pin = probe_base[pq.name]
                probes.append({
                    "pos": i + 1,
                    "name": pq.name,
                    "sec": sec,
                    # from the ROUNDED sec, so the artifact's two
                    # numbers are mutually consistent
                    "ratio": round(sec / pin, 3) if pin > 0 else None,
                })
            except Exception:  # noqa: BLE001 — diagnostics must not kill
                pass
    return timings, pass_vectors, contended, errors, probes


def _run_fresh(sf_dir: str, group_size: int) -> tuple[dict, dict, list, dict]:
    """--fresh mode (r10 verdict item 5): run the catalog in GROUPS,
    each in a freshly-forked JVM/driver process, so suite-position
    effects (JIT state, shuffle-dir residue, block-manager memory of
    180+ earlier entries) stop contaminating in-suite numbers —
    dedup_ngram_jaccard measured 1.46 s standalone vs 2.6 s in-suite
    on identical code (PLANS.md r10). Each child prints one
    'BENCH_SLICE <json>' line; the parent merges and summarizes."""
    import subprocess

    n = len(bench_queries())
    timings: dict = {}
    passes: dict = {}
    contended: list = []
    errors: dict = {}
    for lo in range(0, n, group_size):
        hi = min(n, lo + group_size)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--slice", f"{lo}:{hi}"],
            capture_output=True,
            text=True,
            env=dict(os.environ),
        )
        got = None
        for line in proc.stdout.splitlines():
            if line.startswith("BENCH_SLICE "):
                got = json.loads(line[len("BENCH_SLICE "):])
        if got is None:
            errors[f"slice_{lo}_{hi}"] = (
                f"child exited {proc.returncode}: {proc.stderr[-300:]}"
            )
            print(
                f"bench: slice {lo}:{hi} produced no result", file=sys.stderr
            )
            continue
        timings.update(got["queries"])
        passes.update(got["passes"])
        contended.extend(got["contended"])
        errors.update(got["errors"])
    return timings, passes, contended, errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0
    args = sys.argv[1:]

    if "--slice" in args:  # child of --fresh: measure one group
        lo, hi = map(int, args[args.index("--slice") + 1].split(":"))
        spark = get_spark(app_name=f"ora_ch_spark_bench_slice_{lo}")
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        warm_jvm(spark, sf_dir)
        t, pv, c, e, _ = measure(spark, sf_dir, bench_queries()[lo:hi])
        print(
            "BENCH_SLICE "
            + json.dumps(
                {"queries": t, "passes": pv, "contended": c, "errors": e}
            )
        )
        return

    fresh = "--fresh" in args
    if fresh:
        group_size = 24
        fi = args.index("--fresh")
        if fi + 1 < len(args) and args[fi + 1].isdigit():
            group_size = int(args[fi + 1])
        timings, pass_vectors, contended, errors = _run_fresh(
            sf_dir, group_size
        )
        # fresh mode restarts the JVM per group, so there is no
        # accumulated residue for a probe trace to expose
        probe_trace = []
        # canary/throughput probes need a local session too
        spark = get_spark(app_name="ora_ch_spark_bench_fresh")
    else:
        spark = get_spark(app_name="ora_ch_spark_bench")
        # warm up the JVM + parquet reader so startup cost isn't billed
        # to the first query
        spark.read.parquet(f"{sf_dir}/region.parquet").count()
        warm_jvm(spark, sf_dir)
        # previous committed snapshot (read BEFORE this run overwrites
        # it) feeds the per-entry variance guard; only same-sf
        # snapshots compare meaningfully
        prev_snapshot = None
        if sf == 0.1:
            try:
                with open(
                    os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "BENCH.json",
                    )
                ) as fh:
                    _prev = json.load(fh)
                if _prev.get("sf") == sf:
                    prev_snapshot = _prev.get("queries")
            except (OSError, ValueError):
                pass
        timings, pass_vectors, contended, errors, probe_trace = measure(
            spark, sf_dir, bench_queries(), probe_base=CANARY_BASELINE.get(sf),
            prev_snapshot=prev_snapshot,
        )

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
    factor, canary_detail = resolve_canaries(spark, sf_dir, timings, sf)
    result = {
        "mode": "fresh_jvm" if fresh else "in_suite",
        # the long per-query dict goes FIRST: the driver artifact
        # truncates long lines head-first (r4's line lost its head),
        # so the scalar summary fields must sit at the TAIL to survive
        "queries": timings,
        "passes": pass_vectors,
        "contended": contended,
        "errors": errors,
        "partial": bool(errors),
        "sf": sf,
        # host-speed normalization: grade cross-round drift on
        # raw_sec / canary_factor (see CANARY_BASELINE; trimmed
        # median over 9 canaries, >3x-of-pin outliers re-run once)
        "canary_factor": factor,
        "canary": canary_detail,
        # position-tagged single-pass canary ratios taken every
        # PROBE_EVERY entries — diagnostics only, excluded from totals
        "canary_probes": probe_trace,
        "value_canary_normalized": (
            round(total / factor, 3) if factor else None
        ),
        "speed_rows_sec": (
            round(fact_rows / op_secs) if op_secs and ops_complete else None
        ),
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
    }
    # durable copy: per-query history must survive even if the stdout
    # line is truncated in the driver artifact (--fresh snapshots go
    # to their own file; the driver's in-suite contract is unchanged).
    # Smoke runs at other scale factors land in BENCH_SMOKE.json —
    # an sf0.01 iteration loop must never clobber the committed sf0.1
    # snapshot (this exact accident happened in r12 and r13)
    if sf == 0.1:
        durable = "BENCH_FRESH.json" if fresh else "BENCH.json"
    else:
        durable = "BENCH_SMOKE.json"
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), durable),
            "w",
        ) as fh:
            json.dump(result, fh, indent=1)
    except OSError as exc:
        print(f"bench: BENCH.json not written: {exc}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
