"""Cross-PROCESS safety of the TableStore commit protocol (r13).

The per-root RLock only serializes threads; at multi-job scale two
drivers append to the same table concurrently, and before r13 the
second pointer swap silently discarded the first's delta (both
manifests stayed on disk — the rows just vanished from the current
snapshot). These tests spawn real subprocesses (bare Python — the
commit protocol deliberately needs no SparkSession, see
``TableStore._commit_delta``) and prove:

- concurrent appenders from separate processes ALL land (no lost
  update), serialized by the per-table ``fcntl.flock``;
- the flock actually excludes across processes (LOCK_NB from a second
  process fails while the first holds the publish lock);
- a commit built from a stale snapshot view fails loudly with
  ``StoreConflict`` instead of silently discarding interleaved rows;
- a second process's time-travel reader survives a vacuum in the
  first, as long as its snapshot is retained (verdict r12 item 6).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import pytest

from ora_ch_spark.io import load_table
from ora_ch_spark.store import StoreConflict, TableStore

pytestmark = pytest.mark.skipif(
    not hasattr(os, "fork"), reason="POSIX-only cross-process tests"
)

_ENV = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}


def _run(script: str, *args: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", script, *args],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=_ENV,
    )


# each subprocess lands K delta groups: write a parquet file with
# pyarrow (no Spark), register nothing in-process, then run the real
# append commit protocol (_commit_delta → _publish_lock → _commit)
_APPENDER = """
import os, sys, time
import pyarrow as pa
import pyarrow.parquet as pq
from ora_ch_spark.store import TableStore, _file_entry

root, tag, k, rows = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
store = TableStore(None, root)
go = os.path.join(root, "_go")
while not os.path.exists(go):
    time.sleep(0.005)
tdir = store._tdir("s", "t")
for j in range(k):
    rel = f"data/g-{tag}-{j}"
    gdir = os.path.join(tdir, rel)
    os.makedirs(gdir, exist_ok=True)
    fp = os.path.join(gdir, "part-0.parquet")
    base = (hash(tag) % 1000) * 1000000 + j * rows
    pq.write_table(
        pa.table({"k": list(range(base, base + rows)), "who": [tag] * rows}),
        fp,
    )
    entry = _file_entry(fp, os.path.relpath(fp, tdir))
    store._commit_delta("s", "t", rel, [entry])
print("done", tag)
"""


def test_crossprocess_concurrent_appends_no_lost_update(spark):
    """The r12 verdict's lost-update scenario, for real: three
    PROCESSES each commit 6 append deltas to one table, started
    simultaneously off a sentinel barrier. Every delta must land —
    under the pre-r13 in-process-lock-only protocol the interleaved
    pointer swaps silently dropped most of them."""
    root = tempfile.mkdtemp(prefix="store_mp_append_")
    store = TableStore(spark, root)
    store.create_database("s")
    seed = spark.range(0, 10).selectExpr("id as k", "'seed' as who")
    store.write("s", "t", seed)

    k, rows = 6, 50
    procs = [_run(_APPENDER, root, tag, str(k), str(rows)) for tag in ("a", "b", "c")]
    with open(os.path.join(root, "_go"), "w") as f:
        f.write("go")
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, (out, err)

    # zero lost updates: every process's every delta is in the snapshot
    assert store.row_count("s", "t") == 10 + 3 * k * rows
    df = store.read("s", "t")
    counts = {r["who"]: r["n"] for r in df.groupBy("who").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"seed": 10, "a": k * rows, "b": k * rows, "c": k * rows}
    # and the manifest references all 18 delta groups
    m = store._manifest("s", "t")
    assert sum(1 for g in m["groups"] if g.startswith("data/g-")) >= 3 * k


_NB_PROBE = """
import fcntl, os, sys
path = sys.argv[1]
fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
try:
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    print("ACQUIRED")
except BlockingIOError:
    print("BLOCKED")
"""


def test_crossprocess_publish_lock_excludes(spark):
    """The per-table flock is visible across processes: while this
    process holds ``_publish_lock``, a subprocess's non-blocking
    attempt fails; after release, it succeeds."""
    root = tempfile.mkdtemp(prefix="store_mp_lock_")
    store = TableStore(spark, root)
    store.create_database("s")
    store.write("s", "t", spark.range(3).selectExpr("id as k"))
    lock_path = os.path.join(root, "s", ".locks", "t.lock")

    with store._publish_lock("s", "t"):
        assert os.path.exists(lock_path)
        p = _run(_NB_PROBE, lock_path)
        out, _ = p.communicate(timeout=30)
        assert out.strip() == "BLOCKED"
    p = _run(_NB_PROBE, lock_path)
    out, _ = p.communicate(timeout=30)
    assert out.strip() == "ACQUIRED"


def test_stale_snapshot_commit_fails_loudly(spark):
    """_commit's compare-and-swap: committing a manifest view taken
    BEFORE an interleaved commit raises StoreConflict — the silent
    lost update is structurally impossible even for a caller that
    skips the under-lock re-read."""
    root = tempfile.mkdtemp(prefix="store_mp_cas_")
    store = TableStore(spark, root)
    store.create_database("s")
    store.write("s", "t", spark.range(5).selectExpr("id as k"))
    stale = store._manifest("s", "t")  # view of snapshot v1
    store.append("s", "t", spark.range(5, 8).selectExpr("id as k"))  # v2
    stale["meta"] = {"overwrite": True}
    with pytest.raises(StoreConflict, match="concurrent commit"):
        store._commit("s", "t", stale)
    # the interleaved append's rows are intact
    assert store.row_count("s", "t") == 8


_READER = """
import json, os, sys, time
import pyarrow.parquet as pq
from ora_ch_spark.store import TableStore

root, name = sys.argv[1], sys.argv[2]
store = TableStore(None, root)
mdir = os.path.join(store._tdir("s", "t"), "manifests")
m = store._snapshot_view(mdir, name)
files = list(m["files"])
open(os.path.join(root, "_reader_ready"), "w").write("r")
while not os.path.exists(os.path.join(root, "_reader_go")):
    time.sleep(0.005)
total = 0
for fe in files:
    total += pq.read_table(os.path.join(store._tdir("s", "t"), fe["path"])).num_rows
print(json.dumps({"rows": total, "files": len(files)}))
"""


def test_crossprocess_timetravel_reader_survives_vacuum(spark):
    """Verdict r12 item 6: a SECOND process resolves an old snapshot's
    file list, then this process overwrites the table twice and runs a
    0-grace vacuum. The old snapshot is inside the retention window
    (keep_versions=3), so the reader's files must all still be
    readable — while the vacuum demonstrably collected genuine debris
    (an old orphaned group)."""
    root = tempfile.mkdtemp(prefix="store_mp_vac_")
    store = TableStore(spark, root, keep_versions=3, retention_sec=300)
    store.create_database("s")
    store.write("s", "t", spark.range(0, 1000).selectExpr("id as k"))
    v1 = store.snapshots("s", "t")[-1]["name"]

    p = _run(_READER, root, v1)
    deadline = time.time() + 60
    while not os.path.exists(os.path.join(root, "_reader_ready")):
        assert time.time() < deadline, p.communicate()
        time.sleep(0.01)

    store.write("s", "t", spark.range(0, 10).selectExpr("id as k"))
    store.write("s", "t", spark.range(0, 20).selectExpr("id as k"))
    # plant collectable debris AFTER the writes (their commit-time GC
    # would have swept it already): an orphaned group, old mtime
    ddir = os.path.join(store._tdir("s", "t"), "data", "g-orphan")
    os.makedirs(ddir)
    with open(os.path.join(ddir, "junk"), "w") as f:
        f.write("x")
    old = time.time() - 3600
    os.utime(ddir, (old, old))
    removed = store.vacuum("s", "t", older_than_sec=0)
    assert removed["groups"] >= 1  # the planted orphan was collected

    with open(os.path.join(root, "_reader_go"), "w") as f:
        f.write("go")
    out, err = p.communicate(timeout=60)
    assert p.returncode == 0, (out, err)
    result = json.loads(out.strip().splitlines()[-1])
    assert result["rows"] == 1000, result


def test_concurrent_mixed_mutation_conservation_fuzz(spark):
    """Row conservation under a concurrent mixed workload (r13): three
    writer threads each run a deterministic-random schedule of appends
    and keyed deletes over their OWN key range while a maintenance
    thread runs compact_small / compact / deduplicate / vacuum,
    retrying on StoreConflict (the contract for full rewrites losing a
    race). Invariant: the final table holds EXACTLY the union of every
    writer's ledger — no lost updates, no resurrected rows, no
    duplicates — regardless of interleaving."""
    import random
    import threading

    from ora_ch_spark.store import StoreConflict

    root = tempfile.mkdtemp(prefix="store_fuzz_")
    store = TableStore(spark, root, retention_sec=300)
    store.create_database("s")
    store.write("s", "t", spark.range(0).selectExpr("id as k", "'seed' as who"))

    ledgers: dict[str, set[int]] = {}
    errors: list = []

    def writer(wid: int):
        tag = f"w{wid}"
        base = wid * 1_000_000
        rng = random.Random(1300 + wid)
        mine: set[int] = set()
        try:
            batches = []
            for b in range(5):
                keys = list(range(base + b * 100, base + b * 100 + 40))
                df = spark.createDataFrame(
                    [(k, tag) for k in keys], "k bigint, who string"
                )
                store.append("s", "t", df)
                mine.update(keys)
                batches.append(keys)
                if batches and rng.random() < 0.5:
                    victim = rng.choice(batches)
                    doomed = victim[: rng.randrange(1, len(victim))]
                    kdf = spark.createDataFrame(
                        [(k,) for k in doomed], "k bigint"
                    )
                    for _ in range(6):  # retry full-rewrite conflicts
                        try:
                            store.delete_by_keys("s", "t", kdf, ["k"])
                            mine.difference_update(doomed)
                            break
                        except StoreConflict:
                            continue
                    else:
                        raise AssertionError("delete retries exhausted")
            ledgers[tag] = mine
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def maintenance():
        rng = random.Random(7)
        try:
            for _ in range(8):
                op = rng.choice(["small", "compact", "dedup", "vacuum"])
                try:
                    if op == "small":
                        store.compact_small("s", "t")
                    elif op == "compact":
                        store.compact("s", "t")
                    elif op == "dedup":
                        store.deduplicate("s", "t")
                    else:
                        store.vacuum("s", "t")
                except StoreConflict:
                    pass  # lost the race to a writer — correct outcome
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    threads.append(threading.Thread(target=maintenance))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    got: dict[str, set[int]] = {}
    rows = store.read("s", "t").collect()
    assert len(rows) == len({(r["k"], r["who"]) for r in rows}), "duplicates"
    for r in rows:
        got.setdefault(r["who"], set()).add(r["k"])
    want = {tag: keys for tag, keys in ledgers.items() if keys}
    assert got == want, {
        t: (len(got.get(t, set())), len(want.get(t, set()))) for t in set(got) | set(want)
    }
    # and a final maintenance pass converges cleanly
    store.deduplicate("s", "t")
    store.compact("s", "t")
    assert store.row_count("s", "t") == sum(len(v) for v in want.values())


def test_publish_lock_excludes_aliased_root_threads(tmp_path):
    """ADVICE r14: flock reentrancy is keyed by OWNING THREAD, not
    just lock-file realpath. Two threads whose TableStore roots alias
    the same directory but (by construction here) hold DIFFERENT
    per-root RLocks must still exclude each other in the commit
    critical section — the second thread blocks on the OS flock
    instead of riding the depth counter in. Also pins the realpath
    RLock keying: symlink spellings of one root share the RLock."""
    import threading

    from ora_ch_spark import store as st

    real = tmp_path / "wh"
    real.mkdir()
    alias = tmp_path / "alias"
    alias.symlink_to(real)
    assert st._root_lock(str(real)) is st._root_lock(str(alias))

    a = st.TableStore(None, str(real))
    b = st.TableStore(None, str(alias))
    # simulate an alias realpath cannot unify (bind mount, hardlinked
    # dir): give b a private RLock so only the flock layer stands
    # between the threads
    b._lock = threading.RLock()
    order: list[str] = []
    inside = threading.Event()
    release = threading.Event()
    got = threading.Event()

    def hold():
        with a._publish_lock("ch", "t"):
            order.append("a_in")
            inside.set()
            release.wait(10)
            order.append("a_out")

    def contend():
        with b._publish_lock("ch", "t"):
            order.append("b_in")
            got.set()

    t1 = threading.Thread(target=hold)
    t1.start()
    assert inside.wait(10)
    t2 = threading.Thread(target=contend)
    t2.start()
    # b must NOT be admitted as a re-entry of a's flock
    assert not got.wait(1.0), "second thread entered a held critical section"
    release.set()
    assert got.wait(10)
    t1.join(10)
    t2.join(10)
    assert order == ["a_in", "a_out", "b_in"]
