"""Manifest-store scale guarantees (round-2 substrate).

The store models ClickHouse MergeTree *parts*: a snapshot is a
manifest of immutable files, so incremental operations cost O(delta),
never O(table). These tests pin the guarantees down:

- append adds files without rewriting (or even touching) existing ones;
- row_count / max_value / columns are metadata reads — ZERO Spark jobs;
- delete_where and keyed update rewrite only the files that contain
  affected rows;
- retention GC never deletes a snapshot a reader may still hold.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import DataFrame

from ora_ch_spark.io import load_table
from ora_ch_spark.operators.load_ops import op_append_where, op_update
from ora_ch_spark.specs import Operation, TableSpec
from ora_ch_spark.store import TableStore


def _data_files(store: TableStore, schema: str, table: str) -> dict[str, tuple]:
    """{relpath: (inode, mtime_ns, size)} for every live data file."""
    out = {}
    tdir = store._tdir(schema, table)
    for fe in store._manifest(schema, table)["files"]:
        st = os.stat(os.path.join(tdir, fe["path"]))
        out[fe["path"]] = (st.st_ino, st.st_mtime_ns, st.st_size)
    return out


def test_append_is_pure_file_add(spark, sf_smoke):
    """An append must not rewrite pre-existing data files: same paths,
    same inodes, same mtimes afterwards (VERDICT r01 item #1)."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_append_"))
    store.create_database("s")
    orders = load_table(spark, sf_smoke, "orders")
    store.write("s", "t", orders.filter("o_orderkey <= 500"))
    before = _data_files(store, "s", "t")
    assert before
    store.append("s", "t", orders.filter("o_orderkey > 500"))
    after = _data_files(store, "s", "t")
    # every pre-existing file survives bit-identical (inode + mtime)
    for path, ident in before.items():
        assert after[path] == ident, f"append rewrote pre-existing file {path}"
    assert len(after) > len(before)  # delta files were added
    assert store.row_count("s", "t") == orders.count()


def test_probes_run_zero_spark_jobs(spark, sf_smoke, monkeypatch):
    """row_count / columns / max_value come from manifest footer stats
    — no DataFrame action may execute (scheduler.py polls these every
    5 s; a count() storm at cluster scale is the anti-pattern)."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_probe_"))
    store.create_database("s")
    orders = load_table(spark, sf_smoke, "orders")
    store.write("s", "t", orders)
    expected_max = orders.agg({"o_orderkey": "max"}).first()[0]
    expected_cnt = orders.count()

    def _boom(*a, **k):  # any action => test failure
        raise AssertionError("probe executed a Spark job")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "first", _boom)
    assert store.row_count("s", "t") == expected_cnt
    assert store.columns("s", "t") == orders.columns
    assert store.max_value("s", "t", "o_orderkey") == expected_max


def test_delete_where_rewrites_only_affected_files(spark):
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_delete_"))
    store.create_database("s")
    # two groups with disjoint key ranges → the delete must only touch
    # the group whose footer range contains the victims
    store.write("s", "t", spark.range(0, 1000).withColumnRenamed("id", "k").coalesce(1))
    store.append("s", "t", spark.range(1000, 2000).withColumnRenamed("id", "k").coalesce(1))
    before = _data_files(store, "s", "t")
    low_files = {p for p in before if True}
    store.delete_where("s", "t", "k < 10")
    after = _data_files(store, "s", "t")
    untouched = [p for p in before if p in after]
    rewritten = [p for p in before if p not in after]
    # exactly one original file (the low-range one) was replaced
    assert len(rewritten) == 1 and len(untouched) == 1
    for p in untouched:
        assert after[p] == before[p]
    assert store.row_count("s", "t") == 1990
    got = sorted(r["k"] for r in store.read("s", "t").filter("k < 20").collect())
    assert got == list(range(10, 20))
    assert low_files  # silence lint


def test_update_rewrites_only_affected_files(spark, sf_smoke):
    """O5 with updates hitting one file's key range must leave the
    other files untouched (ALTER UPDATE = affected parts only)."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_update_"))
    store.create_database("s")
    store.write("s", "t", spark.range(0, 1000).selectExpr("id as k", "id * 2 as v").coalesce(1))
    store.append("s", "t", spark.range(1000, 2000).selectExpr("id as k", "id * 2 as v").coalesce(1))
    before = _data_files(store, "s", "t")
    spec = TableSpec(schema="s", name="t", operation=Operation.UPDATE, update_fields=["v"])
    updates = spark.range(0, 5).selectExpr("id as k", "cast(-1 as bigint) as v")
    n = op_update(store, spec, updates, key_columns=["k"])
    assert n == 5
    after = _data_files(store, "s", "t")
    untouched = [p for p in before if p in after]
    assert len(untouched) == 1  # high-range file carried over by reference
    for p in untouched:
        assert after[p] == before[p]
    assert store.row_count("s", "t") == 2000
    assert store.read("s", "t").filter("v = -1").count() == 5


def test_append_where_is_file_pruned(spark, sf_smoke):
    """O2 end-to-end through the file-pruned delete + pure-add append."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_aw_"))
    store.create_database("s")
    li = load_table(spark, sf_smoke, "lineitem")
    store.write("s", "li", li.filter("l_linenumber <= 2").coalesce(2))
    spec = TableSpec(
        schema="s",
        name="li",
        operation=Operation.APPEND_WHERE,
        where_filter="l_linenumber = 2",
    )
    copied = op_append_where(store, spec, li)
    assert copied == li.filter("l_linenumber = 2").count()
    assert store.row_count("s", "li") == li.filter("l_linenumber <= 2").count()


def test_truncate_keeps_schema_without_writing_data(spark, sf_smoke):
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_trunc_"))
    store.create_database("s")
    region = load_table(spark, sf_smoke, "region")
    store.write("s", "t", region)
    store.truncate("s", "t")
    assert store.row_count("s", "t") == 0
    assert store.columns("s", "t") == region.columns
    assert store.read("s", "t").count() == 0
    # and appends after truncate still work
    store.append("s", "t", region)
    assert store.row_count("s", "t") == 5


def test_retention_keeps_recent_snapshots(spark, sf_smoke):
    """ADVICE r01: two quick writes must not invalidate a lazy plan
    still reading the previous snapshot (retention-based GC)."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_ret_"), retention_sec=300)
    store.create_database("s")
    region = load_table(spark, sf_smoke, "region")
    store.write("s", "t", region)
    old_plan = store.read("s", "t")  # lazy — not executed yet
    store.write("s", "t", region.limit(3))
    store.write("s", "t", region.limit(1))
    store.write("s", "t", region.limit(2))  # several quick snapshots
    assert old_plan.count() == 5  # the old files must still exist


def test_max_value_falls_back_without_stats(spark):
    """Columns with no usable footer stats (e.g. all-null) must fall
    back to a Spark aggregate, not silently misreport."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_mv_"))
    store.create_database("s")
    df = spark.range(10).selectExpr("id as k", "cast(null as bigint) as w")
    store.write("s", "t", df)
    assert store.max_value("s", "t", "k") == 9
    assert store.max_value("s", "t", "w") is None
    with pytest.raises(KeyError):
        store.row_count("s", "missing")


def test_auto_compact_folds_small_files_leaves_big_ones(spark, sf_smoke):
    """Background-merge policy: once small files accumulate past the
    threshold, the next append folds them (and ONLY them) into one
    right-sized group — files already at target size carry over by
    reference (same inode), so amortized append cost stays O(delta)."""
    store = TableStore(
        spark,
        tempfile.mkdtemp(prefix="manifest_ac_"),
        auto_compact_small_files=4,
        auto_compact_min_bytes=20_000,
    )
    store.create_database("s")
    orders = load_table(spark, sf_smoke, "orders")
    store.write("s", "t", orders.coalesce(1))  # one "big" file
    big = {
        p: ident
        for p, ident in _data_files(store, "s", "t").items()
        if ident[2] >= 20_000
    }
    assert big, "fixture assumption: the full write produces a >=20k file"
    total = orders.count()
    # five 1-row appends, each a tiny file → crosses the threshold
    for i in range(5):
        store.append("s", "t", spark.sql(
            f"select {10_000_000 + i} as o_orderkey, 1 as o_custkey,"
            " 'O' as o_orderstatus, cast(1.0 as double) as o_totalprice,"
            " timestamp'2020-01-01' as o_orderdate, 'x' as o_orderpriority"
        ))
    files = _data_files(store, "s", "t")
    small_n = sum(1 for ident in files.values() if ident[2] < 20_000)
    assert small_n <= 2, f"small files were not folded: {small_n}"
    # the big file was carried over by reference, not rewritten
    for p, ident in big.items():
        assert files.get(p) == ident, f"compaction touched big file {p}"
    assert store.row_count("s", "t") == total + 5
    assert store.read("s", "t").count() == total + 5


def test_compact_small_noop_cases(spark, sf_smoke):
    """compact_small is a no-op for <2 small files and for partitioned
    tables (their file identity spans hive dirs)."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_ac2_"))
    store.create_database("s")
    region = load_table(spark, sf_smoke, "region")
    store.write("s", "t", region.coalesce(1))
    assert store.compact_small("s", "t") == 0
    store.write("s", "p", region, partition_by=["r_regionkey"])
    assert store.compact_small("s", "p") == 0


def test_zone_map_predicate_classification():
    """Pure classification: all / none / maybe from file min/max."""
    from ora_ch_spark.store import _classify_file, _parse_simple_conjunction

    conds = _parse_simple_conjunction("k >= 100 AND k < 200")
    assert conds == [("k", ">=", 100), ("k", "<", 200)]

    def fe(lo, hi, nulls=0):
        return {"stats": {"k": {"min": [lo, "int"], "max": [hi, "int"], "nulls": nulls}}}

    assert _classify_file(fe(100, 199), conds) == "all"
    assert _classify_file(fe(0, 99), conds) == "none"
    assert _classify_file(fe(200, 300), conds) == "none"
    assert _classify_file(fe(50, 150), conds) == "maybe"
    assert _classify_file({"stats": {}}, conds) == "maybe"
    # parquet min/max exclude NULLs: a file with NULL rows (or an
    # unknown null count) must never classify 'all' — the NULL rows
    # don't satisfy the predicate and a whole-file drop would delete
    # them; 'none' is unaffected (NULL rows never match either)
    assert _classify_file(fe(100, 199, nulls=3), conds) == "maybe"
    assert _classify_file(fe(100, 199, nulls=-1), conds) == "maybe"
    assert _classify_file(fe(0, 99, nulls=3), conds) == "none"
    # richer predicates refuse (→ probe fallback), never misparse
    assert _parse_simple_conjunction("k >= 100 OR j = 2") is None
    assert _parse_simple_conjunction("substr(s,1,2) = 'ab'") is None
    assert _parse_simple_conjunction("k in (1,2)") is None
    # timestamp literals (the O2 splice form)
    c = _parse_simple_conjunction("l_shipdate >= timestamp'1996-06-01'")
    assert c[0][0] == "l_shipdate" and c[0][2].year == 1996


def test_delete_where_boundary_aligned_range_is_metadata_only(spark, monkeypatch):
    """A range delete aligned to file boundaries on a time-clustered
    table decides every file from manifest min/max: fully-covered
    files drop manifest-only, others carry over — ZERO Spark jobs,
    zero files read."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_zm_"))
    store.create_database("s")
    df = spark.range(300).selectExpr("id as k", "id * 2 as v")
    # range-clustered layout: 3 files with disjoint k-ranges
    store.write("s", "t", df.repartitionByRange(3, "k"))
    assert len(store._manifest("s", "t")["files"]) == 3
    before = _data_files(store, "s", "t")

    def _boom(*a, **k):
        raise AssertionError("boundary-aligned delete executed a Spark job")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    store.delete_where("s", "t", "k >= 100 AND k < 200")
    monkeypatch.undo()
    assert store.row_count("s", "t") == 200
    assert store.read("s", "t").filter("k >= 100 AND k < 200").count() == 0
    # surviving files carried over by reference, not rewritten
    after = _data_files(store, "s", "t")
    for p, ident in after.items():
        assert before[p] == ident


def test_delete_where_unclustered_still_exact(spark, sf_smoke):
    """Files spanning the predicate range (no clustering) go through
    the probe path and the result is exact."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_zm2_"))
    store.create_database("s")
    df = spark.range(1000).selectExpr("id as k", "id % 7 as v")
    store.write("s", "t", df.repartition(4))  # every file spans [0,1000)
    store.delete_where("s", "t", "k >= 250 AND k < 750")
    assert store.row_count("s", "t") == 500
    assert store.read("s", "t").filter("k >= 250 AND k < 750").count() == 0


def test_snapshot_time_travel(spark, sf_smoke):
    """Retained snapshots are addressable: reading an old snapshot
    returns the table exactly as it was (data files are immutable),
    while the current read sees all mutations since."""
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_tt_"), retention_sec=300
    )
    store.create_database("s")
    df = spark.range(5).selectExpr("id as k", "id * 2 as v")
    store.write("s", "t", df)
    snaps0 = store.snapshots("s", "t")
    assert len(snaps0) == 1 and snaps0[0]["rows"] == 5
    store.append("s", "t", spark.range(5, 7).selectExpr("id as k", "id * 2 as v"))
    store.delete_where("s", "t", "k = 0")
    snaps = store.snapshots("s", "t")
    assert [s["rows"] for s in snaps] == [5, 7, 6]
    # time travel to each retained state
    assert store.read_snapshot("s", "t", snaps[0]["name"]).count() == 5
    assert store.read_snapshot("s", "t", snaps[1]["name"]).count() == 7
    assert store.read("s", "t").count() == 6
    with pytest.raises(KeyError):
        store.read_snapshot("s", "t", "m-nope.json")


def test_stream_upsert_merges_by_key(spark, sf_smoke):
    """stream_upsert_files: first run lands the initial keys, a
    second run with the same checkpoint applies ONLY the new file and
    replaces matched keys (latest seq wins); a third run with no new
    files is a no-op."""
    import os

    from ora_ch_spark.store import TableStore
    from ora_ch_spark.streaming.ingest import stream_upsert_files

    src = tempfile.mkdtemp(prefix="ups_src_")
    ckpt = tempfile.mkdtemp(prefix="ups_ck_")
    store = TableStore(spark, tempfile.mkdtemp(prefix="ups_store_"))
    store.create_database("s")
    import pyarrow as pa
    import pyarrow.parquet as pq

    def land(name, rows):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array([r[0] for r in rows], pa.int32()),
                    "v": pa.array([r[1] for r in rows], pa.string()),
                    "seq": pa.array([r[2] for r in rows], pa.int32()),
                }
            ),
            os.path.join(src, name),
        )

    land("a.parquet", [(1, "old", 1), (2, "x", 1)])

    def run(name):
        return {
            r["k"]: r["v"]
            for r in stream_upsert_files(
                spark, src, store, "s", "t", ckpt,
                key_cols=["k"], seq_col="seq", query_name=name,
            ).collect()
        }

    assert run("u1") == {1: "old", 2: "x"}
    land("b.parquet", [(1, "new", 2), (3, "y", 1)])
    assert run("u2") == {1: "new", 2: "x", 3: "y"}
    assert run("u3") == {1: "new", 2: "x", 3: "y"}  # no-op replay
    # a LATE batch carrying an OLDER seq for key 1 must lose to the
    # stored seq=2 row (cross-batch comparison, not just in-batch)
    land("c.parquet", [(1, "stale", 1), (4, "z", 1)])
    assert run("u4") == {1: "new", 2: "x", 3: "y", 4: "z"}
    # the reliable winners stage (ADVICE r06) is dropped once its
    # epoch commits — the checkpoint dir must not grow per epoch
    winners_root = os.path.join(ckpt, "__winners")
    assert (not os.path.exists(winners_root)) or os.listdir(winners_root) == []


def test_snapshot_diff_changelog(spark, sf_smoke):
    """snapshot_diff emits the row-level changelog between two
    retained snapshots (added / removed / changed by key), reads only
    the FILE delta (shared immutable files are skipped), and
    compaction-style verbatim rewrites cancel out."""
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_diff_"), retention_sec=300
    )
    store.create_database("s")
    df = spark.range(6).selectExpr("id as k", "id * 2 as v")
    store.write("s", "t", df)
    v1 = store.snapshots("s", "t")[-1]["name"]
    # mutate: delete k=0, change k=1 (delete+append), add k=10
    store.delete_where("s", "t", "k = 0")
    store.delete_where("s", "t", "k = 1")
    store.append(
        "s", "t", spark.sql("SELECT 1 k, 999 v UNION ALL SELECT 10 k, 20 v")
    )
    v2 = store.snapshots("s", "t")[-1]["name"]
    got = {
        r["k"]: r["change"]
        for r in store.snapshot_diff("s", "t", v1, v2, ["k"]).collect()
    }
    assert got == {0: "removed", 1: "changed", 10: "added"}
    # identical snapshots diff to nothing
    assert store.snapshot_diff("s", "t", v2, v2, ["k"]).count() == 0
    # compaction rewrites every row into new files — but values are
    # untouched, so the changelog vs the pre-compaction snapshot is
    # still ONLY the real mutations
    store.compact("s", "t")
    v3 = store.snapshots("s", "t")[-1]["name"]
    assert store.snapshot_diff("s", "t", v2, v3, ["k"]).count() == 0
    assert {
        r["k"]: r["change"]
        for r in store.snapshot_diff("s", "t", v1, v3, ["k"]).collect()
    } == got


def test_partition_pruned_delete_is_metadata_only(spark, sf_smoke, monkeypatch):
    """DROP-PARTITION semantics: a delete whose predicate touches only
    partition columns is decided per file from the hive path (the
    value is a point) — zero Spark jobs, and reads honor the manifest
    (dead files awaiting GC are not resurrected)."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_pp_"))
    store.create_database("s")
    df = spark.range(300).selectExpr("id as k", "id % 3 as p", "id * 2 as v")
    store.write("s", "t", df, partition_by=["p"])
    before_rows = store.row_count("s", "t")
    assert before_rows == 300

    def _boom(*a, **k):
        raise AssertionError("partition-pruned delete executed a Spark job")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    store.delete_where("s", "t", "p = 1")
    monkeypatch.undo()
    assert store.row_count("s", "t") == 200
    out = store.read("s", "t")
    assert out.count() == 200
    assert out.filter("p = 1").count() == 0
    assert set(out.columns) == {"k", "p", "v"}
    # non-partition-column predicate still works (rewrite fallback)
    store.delete_where("s", "t", "v >= 400")
    assert store.read("s", "t").filter("v >= 400").count() == 0


def test_delete_where_keeps_null_predicate_rows(spark):
    """SQL DELETE semantics: rows where the predicate evaluates NULL
    are KEPT (predicate is not true) — both on the probed-rewrite
    path and under zone-map classification (a file with NULL rows
    never classifies 'all')."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_null_"))
    store.create_database("s")
    df = spark.sql(
        "select * from values (1, 10), (2, cast(null as int)), (3, 200)"
        " as t(id, k)"
    )
    store.write("s", "t", df.coalesce(1))
    store.delete_where("s", "t", "k >= 0")  # matches ids 1,3; NULL for id 2
    rows = {r.id for r in store.read("s", "t").collect()}
    assert rows == {2}


def test_gc_spares_young_orphan_groups(spark, sf_smoke):
    """An unreferenced group directory younger than the retention
    window is NOT collected (it may be a concurrent writer's
    in-flight data — cross-process safety net; same-process writes
    are additionally protected by the in-flight registry); with
    retention 0 it is collected."""
    import shutil

    region = load_table(spark, sf_smoke, "region")
    for retention, survives in ((300.0, True), (0.0, False)):
        store = TableStore(
            spark, tempfile.mkdtemp(prefix="manifest_gc_"), retention_sec=retention
        )
        store.create_database("s")
        store.write("s", "t", region)
        orphan = os.path.join(store._tdir("s", "t"), "data", "g-orphan")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "part-x.parquet"), "w") as f:
            f.write("x")
        store.write("s", "t", region.limit(2))  # commit triggers GC
        assert os.path.isdir(orphan) == survives, f"retention={retention}"


def test_concurrent_writers_and_readers_no_lost_files(spark, sf_smoke):
    """The documented /task + /calc scenario: two threads mutate the
    same table while a third reads — no FileNotFoundException, no
    torn snapshot, and the final state is consistent. Pins the GC
    in-flight guard (an uncommitted group must never be collected by
    the other thread's commit)."""
    import threading

    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_cc_"), retention_sec=300
    )
    store.create_database("s")
    region = load_table(spark, sf_smoke, "region")
    store.write("s", "t", region)
    errors = []

    def writer(which):
        try:
            for i in range(6):
                if which == 0:
                    store.append("s", "t", region.limit(1))
                else:
                    store.write("s", "w2", region.limit(2 + i % 3))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            for _ in range(10):
                store.read("s", "t").count()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(0,)),
        threading.Thread(target=writer, args=(1,)),
        threading.Thread(target=reader),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert store.row_count("s", "t") == 5 + 6
    assert store.read("s", "t").count() == 11


def test_partition_drop_shrinks_groups_and_gc_collects(spark):
    """ADVICE r02: the manifest-only partition drop must also drop the
    partition's now-empty data groups from m['groups'] — append carries
    groups forward verbatim, so a stale group entry keeps the deleted
    partition's files alive to GC forever (disk leak unbounded by
    retention)."""
    store = TableStore(
        spark,
        tempfile.mkdtemp(prefix="manifest_pdrop_"),
        keep_versions=0,
        retention_sec=0.0,
    )
    store.create_database("s")
    df1 = spark.sql("select id, 1 as k from range(5)")
    df2 = spark.sql("select id, 2 as k from range(5)")
    store.write("s", "t", df1, partition_by=["k"])
    store.append("s", "t", df2)  # its own group, holding only k=2 files
    m = store._manifest("s", "t")
    assert len(m["groups"]) == 2
    doomed = {
        store._group_of(fe["path"]) for fe in m["files"] if "k=2" in fe["path"]
    }
    assert len(doomed) == 1
    store.delete_where("s", "t", "k = 2")  # manifest-only DROP PARTITION
    m2 = store._manifest("s", "t")
    assert doomed.isdisjoint(m2["groups"]), "dropped group still in manifest"
    # with zero retention the delete's own commit GCs the orphan group
    tdir = store._tdir("s", "t")
    gone = next(iter(doomed))
    assert not os.path.isdir(os.path.join(tdir, gone)), "group dir leaked"
    # survivors untouched
    assert {r.k for r in store.read("s", "t").collect()} == {1}
    assert store.row_count("s", "t") == 5


# ---------------------------------------------------------------------------
# Layout clustering (Z-order) + zone-map pruned reads
# ---------------------------------------------------------------------------

def _mk_zorder_table(spark, root):
    from pyspark.sql import functions as F

    store = TableStore(spark, root, keep_versions=1)
    store.create_database("ch")
    df = spark.range(40000).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).cast("double").alias("value"),
    )
    nulls = spark.range(40000, 40100).select(
        F.col("id").alias("event_id"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("double").alias("value"),
    )
    # unclustered baseline: hash layout on event_id → every file spans
    # the full (user_id, value) range, zone maps can prove nothing
    store.write("ch", "ev", df.unionByName(nulls).repartition(16, "event_id"))
    return store


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    from ora_ch_spark.operators.layout import cluster_table

    store = _mk_zorder_table(spark, str(tmp_path / "zs"))
    pred = "user_id >= 10 and user_id < 20 and value >= 100 and value < 200"
    expected = sorted(
        map(tuple, store.read("ch", "ev").filter(pred).collect())
    )
    keep0, total0 = store.prune_files("ch", "ev", pred)
    assert total0 == 16 and len(keep0) == total0  # hash layout: no skip

    cluster_table(store, "ch", "ev", ["user_id", "value"], bits=10)
    keep1, total1 = store.prune_files("ch", "ev", pred)
    assert total1 == 16
    assert len(keep1) <= total1 // 3  # 1% rectangle → few curve tiles
    # pruning on EACH dimension alone (the z-order property a linear
    # sort on user_id would not give for value)
    for one_dim in ("user_id >= 90", "value >= 900.0"):
        kept, tot = store.prune_files("ch", "ev", one_dim)
        assert len(kept) < tot, one_dim
    # results identical to the unpruned filter (NULL rows stay out)
    got = sorted(map(tuple, store.read_pruned("ch", "ev", pred).collect()))
    assert got == expected


def test_read_pruned_falls_back_on_rich_predicates(spark, tmp_path):
    store = _mk_zorder_table(spark, str(tmp_path / "zs2"))
    pred = "user_id = 5 or user_id = 95"  # OR → unprunable, must still be exact
    keep, total = store.prune_files("ch", "ev", pred)
    assert len(keep) == total
    a = store.read_pruned("ch", "ev", pred).count()
    b = store.read("ch", "ev").filter(pred).count()
    assert a == b > 0


def test_linear_sort_is_zorder_k1_and_prunes_sort_key(spark, tmp_path):
    from ora_ch_spark.operators.layout import cluster_table

    store = _mk_zorder_table(spark, str(tmp_path / "zs3"))
    cluster_table(store, "ch", "ev", ["user_id"], bits=10)
    kept, tot = store.prune_files("ch", "ev", "user_id >= 90")
    assert len(kept) <= max(2, tot // 4)
    assert store.read_pruned("ch", "ev", "user_id >= 90").count() == \
        store.read("ch", "ev").filter("user_id >= 90").count()


# ---------------------------------------------------------------------------
# Additive schema evolution on append
# ---------------------------------------------------------------------------

def test_evolve_append_adds_column_nulls_for_old_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from ora_ch_spark.store import SchemaMismatch

    store = TableStore(spark, str(tmp_path / "ev"), keep_versions=2)
    store.create_database("ch")
    store.write("ch", "t", spark.range(100).select("id", (F.col("id") * 2).alias("a")))
    # delta carries a NEW column b and DROPS a
    delta = spark.range(100, 150).select("id", F.lit("x").alias("b"))
    store.append("ch", "t", delta, evolve=True)
    got = store.read("ch", "t")
    assert got.columns == ["id", "a", "b"]
    rows = {r["id"]: r for r in got.collect()}
    assert len(rows) == 150
    assert rows[0]["a"] == 0 and rows[0]["b"] is None       # old file: b NULL
    assert rows[120]["a"] is None and rows[120]["b"] == "x"  # delta: a NULL
    # metadata probes unaffected; stats-less old files fall back cleanly
    assert store.row_count("ch", "t") == 150
    assert store.max_value("ch", "t", "id") == 149
    # zone-map pruning on the new column stays correct: old files have
    # no stats for b → 'maybe', never wrongly skipped
    keep, total = store.prune_files("ch", "t", "id >= 120")
    assert len(keep) < total
    assert store.read_pruned("ch", "t", "id >= 120").count() == 30


def test_evolve_refuses_type_change_and_default_drops_extras(spark, tmp_path):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ora_ch_spark.store import SchemaMismatch

    store = TableStore(spark, str(tmp_path / "ev2"), keep_versions=2)
    store.create_database("ch")
    store.write("ch", "t", spark.range(10).select("id", (F.col("id") * 2).alias("a")))
    bad = spark.range(5).select("id", F.col("id").cast("string").alias("a"))
    with _pytest.raises(SchemaMismatch):
        store.append("ch", "t", bad, evolve=True)
    # non-evolve append silently drops unknown columns (historic contract)
    extra = spark.range(10, 15).select("id", (F.col("id") * 2).alias("a"),
                                       F.lit(1).alias("zzz"))
    store.append("ch", "t", extra)
    assert store.read("ch", "t").columns == ["id", "a"]
    assert store.row_count("ch", "t") == 15


def test_compact_with_cluster_by_preserves_pruning(spark, tmp_path):
    """Appends on a clustered table degrade pruning (new groups span
    the full key range); compact(cluster_by=...) restores it, while a
    plain compact would interleave groups."""
    from pyspark.sql import functions as F

    from ora_ch_spark.operators.layout import cluster_table

    store = _mk_zorder_table(spark, str(tmp_path / "zc"))
    cluster_table(store, "ch", "ev", ["user_id", "value"], bits=10)
    # unclustered append: spans the whole key space
    delta = spark.range(50000, 54000).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).cast("double").alias("value"),
    )
    store.append("ch", "ev", delta.repartition(4, "event_id"))
    pred = "user_id >= 10 and user_id < 20 and value >= 100 and value < 200"
    expected = store.read("ch", "ev").filter(pred).count()
    kept_dirty, tot_dirty = store.prune_files("ch", "ev", pred)
    store.compact("ch", "ev", target_partitions=16,
                  cluster_by=["user_id", "value"], cluster_bits=10)
    kept_clean, tot_clean = store.prune_files("ch", "ev", pred)
    assert tot_clean == 16
    assert len(kept_clean) <= tot_clean // 3
    # the dirty layout scanned strictly more of its files
    assert len(kept_dirty) / tot_dirty > len(kept_clean) / tot_clean
    assert store.read_pruned("ch", "ev", pred).count() == expected


def test_bloom_index_prunes_string_equality(spark, tmp_path):
    """Per-file Bloom value index: `col = 'x'` skips files whose
    filter proves absence (zero Spark jobs), never changes results,
    and appends inherit the index setting from the manifest."""
    from ora_ch_spark.io import load_table
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "bl"))
    store.create_database("ch")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # value-cluster files by source so equality has files to skip
    store.write(
        "ch", "docs", docs.repartitionByRange(4, "source"),
        bloom_columns=["source", "lang"],
    )
    val = docs.select("source").distinct().orderBy("source").first()[0]
    keep, total = store.prune_files("ch", "docs", f"source = '{val}'")
    assert total == 4 and len(keep) < total
    # absent value → every file provably empty, no scan at all
    keep0, _ = store.prune_files("ch", "docs", "source = '___absent___'")
    assert keep0 == []
    # result identical to the unpruned filter
    a = sorted(r["doc_id"] for r in store.read_pruned("ch", "docs", f"source = '{val}'").collect())
    b = sorted(
        r["doc_id"]
        for r in store.read("ch", "docs").filter(f"source = '{val}'").collect()
    )
    assert a == b and a
    # conjunction with a numeric zone-map cond composes
    keep2, _ = store.prune_files(
        "ch", "docs", f"source = '{val}' and doc_id >= 0"
    )
    assert len(keep2) <= len(keep)
    # append without bloom args inherits the index
    store.append("ch", "docs", docs.limit(7))
    fe = store._manifest("ch", "docs")["files"][-1]
    assert set(fe["bloom"]) == {"source", "lang"}
    # recreate WITHOUT bloom_columns drops it (write is authoritative)
    store.write("ch", "docs", docs)
    assert "bloom" not in store._manifest("ch", "docs")["files"][0]


def test_bloom_index_probe_runs_zero_spark_jobs(spark, tmp_path, monkeypatch):
    from ora_ch_spark.io import load_table
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "bl0"))
    store.create_database("ch")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    store.write(
        "ch", "docs", docs.repartitionByRange(4, "source"),
        bloom_columns=["source"],
    )

    def _boom(*a, **k):
        raise AssertionError("prune_files must not launch Spark jobs")

    monkeypatch.setattr(spark.sparkContext, "runJob", _boom)
    keep, total = store.prune_files("ch", "docs", "source = 'src0'")
    assert total == 4 and len(keep) <= total


def test_partition_string_predicates_escape_and_op_safety(spark, tmp_path):
    """Hive-escaped partition values must compare unescaped, and
    non-equality string ops must fall back to the rewrite path (no
    silent misclassification)."""
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "ps"))
    store.create_database("ch")
    df = spark.createDataFrame(
        [(1, "a:b"), (2, "a:b"), (3, "plain")], "id bigint, src string"
    )
    store.write("ch", "t", df, partition_by=["src"])
    # equality against the escaped dir value ('a%3Ab') must match rows
    store.delete_where("ch", "t", "src = 'a:b'")
    left = sorted(r["src"] for r in store.read("ch", "t").collect())
    assert left == ["plain"]
    # range op on a string partition: falls back, still exact
    store2 = TableStore(spark, str(tmp_path / "ps2"))
    store2.create_database("ch")
    store2.write("ch", "t", df, partition_by=["src"])
    store2.delete_where("ch", "t", "src >= 'b'")
    assert sorted(r["src"] for r in store2.read("ch", "t").collect()) == ["a:b", "a:b"]


def test_apply_ttl_and_deduplicate(spark, tmp_path):
    """TTL expiry routes through zone-map delete; DEDUPLICATE keeps
    one row per full value / per key with a deterministic winner."""
    import datetime

    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "ttl"))
    store.create_database("ch")
    rows = [
        (i, datetime.datetime(2024, 1, 1 + (i % 20)), float(i % 3))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp, v double")
    store.write("ch", "t", df.repartitionByRange(4, "ts"))
    store.apply_ttl("ch", "t", "ts", datetime.datetime(2024, 1, 11))
    left = store.read("ch", "t")
    assert left.count() == sum(1 for _, ts, _ in rows if ts >= datetime.datetime(2024, 1, 11))
    assert left.filter("ts < timestamp'2024-01-11 00:00:00'").count() == 0

    # full-row dedup
    store.write("ch", "d", spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k bigint, s string"))
    store.deduplicate("ch", "d")
    assert store.read("ch", "d").count() == 2
    # keyed dedup keeps the deterministic min-struct winner
    store.write("ch", "d2", spark.createDataFrame(
        [(1, "z"), (1, "a"), (2, "m")], "k bigint, s string"))
    store.deduplicate("ch", "d2", by=["k"])
    got = {r["k"]: r["s"] for r in store.read("ch", "d2").collect()}
    assert got == {1: "a", 2: "m"}


def test_delete_by_keys_rewrites_only_affected_files(spark, tmp_path):
    """GDPR-style keyed delete: files without matching keys carry over
    by reference (same inode), matching rows vanish everywhere."""
    import os

    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "gdpr"))
    store.create_database("ch")
    df = spark.createDataFrame(
        [(i, i % 10, f"u{i % 50}") for i in range(1000)],
        "id bigint, bucket bigint, user string",
    )
    # user-clustered layout: each user's rows land in few files
    store.write("ch", "t", df.repartitionByRange(8, "user"))
    before = {
        fe["path"]: os.stat(os.path.join(store._tdir("ch", "t"), fe["path"])).st_ino
        for fe in store._manifest("ch", "t")["files"]
    }
    # forget two users whose ids live in a subset of the range files
    keys = spark.createDataFrame([("u3",), ("u7",)], "user string")
    n = store.delete_by_keys("ch", "t", keys, ["user"])
    assert n > 0
    after = store.read("ch", "t")
    assert after.filter("user in ('u3','u7')").count() == 0
    assert after.count() == 1000 - sum(1 for i in range(1000) if i % 50 in (3, 7))
    # at least the carried-over files kept their inodes (no rewrite)
    now = {
        fe["path"]: os.stat(os.path.join(store._tdir("ch", "t"), fe["path"])).st_ino
        for fe in store._manifest("ch", "t")["files"]
    }
    carried = set(before) & set(now)
    assert carried and all(before[p] == now[p] for p in carried)
    # no-match delete is a no-op (0 files rewritten)
    assert store.delete_by_keys(
        "ch", "t", spark.createDataFrame([("nobody",)], "user string"), ["user"]
    ) == 0


def test_zero_copy_clone_divergence_and_gc_safety(spark, tmp_path):
    """clone() hardlinks data files (no bytes copied); both sides then
    diverge independently and neither side's GC breaks the other."""
    import os

    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "cl"), keep_versions=1,
                       retention_sec=0.0)
    store.create_database("ch")
    df = spark.createDataFrame([(i, float(i)) for i in range(500)], "id bigint, v double")
    store.write("ch", "src", df.repartition(4))
    store.clone("ch", "src", "ch", "dst")
    src_files = {fe["path"]: fe for fe in store._manifest("ch", "src")["files"]}
    dst_files = {fe["path"]: fe for fe in store._manifest("ch", "dst")["files"]}
    assert src_files.keys() == dst_files.keys()
    for p in src_files:
        a = os.stat(os.path.join(store._tdir("ch", "src"), p))
        b = os.stat(os.path.join(store._tdir("ch", "dst"), p))
        assert a.st_ino == b.st_ino  # same bytes on disk, once
    assert store.read("ch", "dst").count() == 500
    # diverge: delete on the clone; source untouched
    store.delete_where("ch", "dst", "id < 100")
    assert store.read("ch", "dst").count() == 400
    assert store.read("ch", "src").count() == 500
    # source-side full rewrite + GC: clone still reads its snapshot
    store.write("ch", "src", df.filter("id >= 250").repartition(2))
    assert store.read("ch", "src").count() == 250
    assert store.read("ch", "dst").count() == 400


def test_delete_by_keys_partitioned_table_keeps_partition_values(spark, tmp_path):
    """Keyed delete on a hive-partitioned table must not NULL the
    partition column (per-file rewrite reads bare parquet where the
    value lives in the dir name — the path must fall back)."""
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "gdprp"))
    store.create_database("ch")
    df = spark.createDataFrame(
        [(i, i % 4, f"u{i % 5}") for i in range(100)],
        "id bigint, part bigint, user string",
    )
    store.write("ch", "t", df, partition_by=["part"])
    keys = spark.createDataFrame([("u1",)], "user string")
    store.delete_by_keys("ch", "t", keys, ["user"])
    left = store.read("ch", "t")
    assert left.filter("user = 'u1'").count() == 0
    assert left.filter("part IS NULL").count() == 0
    assert left.count() == 80
    assert store._manifest("ch", "t")["partition_by"] == ["part"]


def test_maintenance_preserves_bloom_index(spark, tmp_path):
    """deduplicate / compact / delete_where-fallback / delete_by_keys
    (partitioned) are maintenance, not DDL: they must carry the
    manifest's bloom_columns through their internal write() instead of
    silently dropping the per-file value index (ADVICE r04)."""
    from ora_ch_spark.io import load_table
    from ora_ch_spark.store import TableStore

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")

    def blooms(store, tbl):
        m = store._manifest("ch", tbl)
        assert m.get("bloom_columns") == ["source"], m.get("bloom_columns")
        assert all(set(fe.get("bloom", [])) == {"source"} for fe in m["files"])

    store = TableStore(spark, str(tmp_path / "mb"))
    store.create_database("ch")
    store.write("ch", "d1", docs, bloom_columns=["source"])
    store.deduplicate("ch", "d1")
    blooms(store, "d1")
    store.compact("ch", "d1")
    blooms(store, "d1")
    store.delete_where("ch", "d1", "length(text) < -1 or doc_id % 97 = 0")
    blooms(store, "d1")

    # partitioned table: delete_by_keys takes the full-rewrite path
    store.write(
        "ch", "d2", docs, partition_by=["lang"], bloom_columns=["source"]
    )
    keys = docs.select("doc_id").limit(5)
    store.delete_by_keys("ch", "d2", keys, ["doc_id"])
    m = store._manifest("ch", "d2")
    assert m.get("bloom_columns") == ["source"]


def test_update_and_cluster_preserve_bloom_index(spark, tmp_path):
    """The two remaining maintenance rewrites outside store.py —
    op_update's full-merge branch and layout.cluster_table — must also
    carry bloom_columns through their write() (round-5 review)."""
    from pyspark.sql import functions as F

    from ora_ch_spark.io import load_table
    from ora_ch_spark.operators.layout import cluster_table
    from ora_ch_spark.operators.load_ops import op_update
    from ora_ch_spark.specs import Operation, TableSpec
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "ub"))
    store.create_database("ch")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    # partitioned table => op_update takes the full-merge write branch
    store.write(
        "ch", "ev", ev, partition_by=["event_type"],
        bloom_columns=["user_id"],
    )
    upd = ev.limit(10).withColumn("value", F.col("value") + 1.0)
    spec = TableSpec(
        schema="ch", name="ev", operation=Operation.UPDATE,
        update_fields=["value"],
    )
    op_update(store, spec, upd, key_columns=["event_id"])
    assert store._manifest("ch", "ev").get("bloom_columns") == ["user_id"]

    # unpartitioned clustered rewrite
    store.write("ch", "ev2", ev, bloom_columns=["event_type"])
    cluster_table(store, "ch", "ev2", ["user_id", "value"], bits=8)
    m = store._manifest("ch", "ev2")
    assert m.get("bloom_columns") == ["event_type"]
    assert all(set(fe.get("bloom", [])) == {"event_type"} for fe in m["files"])


def test_manifest_commit_latency_bound_at_1e5_files(spark, tmp_path):
    """r9 verdict design-watch → r10 measured guarantee: the driver-
    side JSON manifest must stay usable at 10^5 file entries (a table
    auto-compaction would never let grow this far — compact_small
    bounds real tables orders of magnitude below). Measures the three
    driver-side paths that scale with the file count — commit
    (serialize + atomic publish + GC scan), manifest read, zone-map
    prune over every entry — and pins generous wall bounds so a
    complexity regression (anything super-linear) fails loudly. The
    measured curve (1e4 vs 1e5 ≈ linear) is recorded in PLANS.md."""
    import json as _json
    import time as _time

    from ora_ch_spark.io import load_table
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "big"))
    store.create_database("ch")
    seed = load_table(spark, "/root/testdata/sf0.001", "region")
    store.write("ch", "t", seed)

    base = store._manifest("ch", "t")
    real = base["files"][0]
    timings: dict[int, dict[str, float]] = {}
    for n in (10_000, 100_000):
        files = []
        for i in range(n):
            fe = dict(real)
            fe["path"] = f"data/g0/part-{i:06d}.parquet"
            fe["rows"] = 1000
            fe["bytes"] = 1 << 20
            fe["stats"] = {
                "k": {"min": [i * 1000, "int"], "max": [i * 1000 + 999, "int"],
                       "nulls": 0},
                "v": {"min": [0.0, "float"], "max": [1.0, "float"], "nulls": 0},
            }
            files.append(fe)
        # re-read per iteration: _commit CAS-verifies the base snapshot
        # (r13) — committing a view taken before the previous loop's
        # commit is exactly the stale-write it exists to reject
        m = dict(store._manifest("ch", "t"))
        m["files"] = files
        t0 = _time.perf_counter()
        store._commit("ch", "t", m)
        t_commit = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        m2 = store._manifest("ch", "t")
        t_read = _time.perf_counter() - t0
        assert len(m2["files"]) == n and m2["rows"] == n * 1000
        t0 = _time.perf_counter()
        keep, total = store.prune_files("ch", "t", "k = 12345678")
        t_prune = _time.perf_counter() - t0
        assert total == n and len(keep) <= 1
        timings[n] = {
            "commit": t_commit, "read": t_read, "prune": t_prune,
        }
    big = timings[100_000]
    # generous CI-safe ceilings; the point is catching super-linear
    # regressions (real measurements are ~10x under these)
    assert big["commit"] < 15.0, big
    assert big["read"] < 5.0, big
    assert big["prune"] < 10.0, big
    # rough linearity: 10x the entries must stay within ~40x the time
    # (JSON parse constants dominate at 1e4, so allow generous slack)
    small = timings[10_000]
    for k in ("commit", "read", "prune"):
        assert big[k] < max(40 * small[k], 1.0), (k, timings)
    # manifest size itself stays bounded (~30 MB at 1e5 entries)
    mdir = tmp_path / "big" / "ch" / "t" / "manifests"
    sizes = sorted(p.stat().st_size for p in mdir.iterdir())
    assert sizes[-1] < 120 * (1 << 20)
    print("manifest-scale timings:", _json.dumps(timings))


def test_manifest_sharded_commit_flat_at_1e6_files(spark, tmp_path):
    """r10 verdict item 1 → r11 guarantee: the manifest is sharded
    (small m-* root index + immutable s-* file-list shards, shared
    across snapshots by name), so a DELTA commit serializes only the
    new shard + the root index — O(delta + segments), never O(all
    files). Pins that at 1e6 entries: (a) an append-protocol commit
    on a 1e6-file table costs within a small constant of the same
    commit on a 1e4-file table (flat-per-commit — the single-JSON
    design this replaces was ~linear: 4.5 s / 30 MB per commit at
    1e5), (b) the root manifest file stays KB-sized, (c) the
    metadata probes (row_count / max_value) answer from the root
    index in milliseconds."""
    import time as _time

    from ora_ch_spark.io import load_table
    from ora_ch_spark.store import TableStore

    store = TableStore(spark, str(tmp_path / "huge"))
    store.create_database("ch")
    seed = load_table(spark, "/root/testdata/sf0.001", "region")
    store.write("ch", "t", seed)
    base = store._manifest("ch", "t")
    real = base["files"][0]

    def entry(i: int) -> dict:
        fe = dict(real)
        fe["path"] = f"data/g0/part-{i:07d}.parquet"
        fe["rows"] = 1000
        fe["bytes"] = 1 << 20
        fe["stats"] = {
            "k": {"min": [i * 1000, "int"], "max": [i * 1000 + 999, "int"],
                  "nulls": 0},
        }
        return fe

    delta_cost: dict[int, float] = {}
    probe_cost: dict[int, float] = {}
    for n in (10_000, 1_000_000):
        m = dict(store._manifest("ch", "t"))
        m["files"] = [entry(i) for i in range(n)]
        t0 = _time.perf_counter()
        store._commit("ch", "t", m)
        build = _time.perf_counter() - t0
        # delta commits via the append protocol: 10 new files each
        times = []
        for j in range(5):
            m = store._manifest("ch", "t")
            m.pop("files", None)
            m["__delta_add"] = [entry(n + 1 + j * 10 + k) for k in range(10)]
            t0 = _time.perf_counter()
            store._commit("ch", "t", m)
            times.append(_time.perf_counter() - t0)
        delta_cost[n] = min(times)
        t0 = _time.perf_counter()
        rc = store.row_count("ch", "t")
        mv = store.max_value("ch", "t", "k")
        probe_cost[n] = _time.perf_counter() - t0
        assert rc == (n + 50) * 1000
        assert mv >= n * 1000
        print(f"sharded-manifest n={n}: build={build:.2f}s "
              f"delta={delta_cost[n]*1e3:.1f}ms probes={probe_cost[n]*1e3:.1f}ms")
    # flat-per-commit: 100x the table, delta commit within 5x (plus an
    # absolute floor so scheduler jitter on a loaded CI box can't flake
    # a sub-ms comparison)
    assert delta_cost[1_000_000] < max(5 * delta_cost[10_000], 0.5), (
        delta_cost
    )
    # metadata probes stay O(segments): flat, never reparse file lists
    assert probe_cost[1_000_000] < max(20 * probe_cost[10_000], 0.25), (
        probe_cost
    )
    # the root index itself stays small — the 30 MB single-JSON
    # manifest is gone
    mdir = tmp_path / "huge" / "ch" / "t" / "manifests"
    roots = [p for p in mdir.iterdir() if p.name.startswith("m-")]
    assert max(p.stat().st_size for p in roots) < 1 << 20


def test_op_update_sort_merge_fallback_plan(spark):
    """r10 verdict item 4: force BROADCAST_UPDATES_MAX_ROWS below the
    update size so O5's beyond-broadcast path runs, and plan-assert
    the merge is a shuffle join with NO broadcast node (Spark's own
    size-based auto-broadcast disabled for the assertion), with the
    merged values still exact."""
    import ora_ch_spark.operators.load_ops as LO

    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_smj_"))
    store.create_database("s")
    store.write(
        "s", "t",
        spark.range(0, 2000).selectExpr("id as k", "id * 2 as v").coalesce(2),
    )
    spec = TableSpec(
        schema="s", name="t", operation=Operation.UPDATE, update_fields=["v"]
    )
    # large update (>= 1/4 of rows) routes to the full-merge branch
    updates = spark.range(0, 1500).selectExpr(
        "id as k", "cast(-1 as bigint) as v"
    )
    old_thr = LO.BROADCAST_UPDATES_MAX_ROWS
    old_auto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    LO.BROADCAST_UPDATES_MAX_ROWS = 0
    LO._DEBUG_CAPTURE_PLAN = True
    LO._last_merge_plan = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n = LO.op_update(store, spec, updates, key_columns=["k"])
    finally:
        LO.BROADCAST_UPDATES_MAX_ROWS = old_thr
        LO._DEBUG_CAPTURE_PLAN = False
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_auto)
    assert n == 1500
    plan = LO._last_merge_plan or ""
    assert "BroadcastHashJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert store.read("s", "t").filter("v = -1").count() == 1500
    assert store.read("s", "t").filter("k >= 1500 and v = k * 2").count() == 500


def test_op_update_affected_files_cap_falls_back_to_merge(spark):
    """r10 verdict item 6: a pathological scattered-key update (string
    keys → no zone-map pre-route) whose probe would touch more files
    than the cap must abandon the file-pruned path and run ONE full
    merge instead of collecting an unbounded affected list — asserted
    by spying that replace_files is never called, with exact values."""
    import ora_ch_spark.operators.load_ops as LO

    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_cap_"))
    store.create_database("s")
    # 8 files, string keys spread across all of them
    df = spark.range(0, 800).selectExpr(
        "concat('key-', cast(id as string)) as k", "id as v"
    )
    store.write("s", "t", df.repartition(8))
    spec = TableSpec(
        schema="s", name="t", operation=Operation.UPDATE, update_fields=["v"]
    )
    # small update (passes the 1/4 rule) but scattered over every file
    updates = spark.sql(
        "select concat('key-', cast(id * 7 as string)) as k, "
        "cast(-1 as bigint) as v from range(0, 100)"
    )
    calls = {"replace": 0}
    orig_replace = store.replace_files

    def spy_replace(*a, **kw):
        calls["replace"] += 1
        return orig_replace(*a, **kw)

    store.replace_files = spy_replace
    old_cap = LO.AFFECTED_FILES_ABS_MAX
    LO.AFFECTED_FILES_ABS_MAX = 2  # cap below the 8 files the probe hits
    try:
        n = LO.op_update(store, spec, updates, key_columns=["k"])
    finally:
        LO.AFFECTED_FILES_ABS_MAX = old_cap
        store.replace_files = orig_replace
    assert n == 100
    assert calls["replace"] == 0  # fell back to full merge
    assert store.read("s", "t").filter("v = -1").count() == 100
    # untouched rows keep their values
    assert (
        store.read("s", "t").filter("k = 'key-1' and v = 1").count() == 1
    )


def test_prune_files_skips_whole_shards(spark):
    """r11: prune_files drops shards whose ROOT-INDEX min/max prove
    'none' without loading the shard at all — planning cost scales
    with the matching shards, not the table."""
    import ora_ch_spark.store as ST

    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_segprune_"))
    store.create_database("s")
    store.write(
        "s", "t",
        spark.range(0, 1000).selectExpr("id as k", "id * 2 as v").coalesce(1),
    )
    store.append(
        "s", "t",
        spark.range(10_000, 11_000).selectExpr("id as k", "id * 2 as v").coalesce(1),
    )
    m = store._manifest("s", "t")
    assert len(m["segments"]) == 2  # write shard + append delta shard
    loaded: list[str] = []
    orig = ST._load_segment

    def spy(path):
        loaded.append(os.path.basename(path))
        return orig(path)

    ST._load_segment = spy
    try:
        keep, total = store.prune_files("s", "t", "k >= 10500")
    finally:
        ST._load_segment = orig
    assert total == 2
    assert len(keep) == 1
    # only the high-range shard was parsed; the low shard was skipped
    # on the root index alone
    high = m["segments"][1]["name"]
    low = m["segments"][0]["name"]
    assert high in loaded and low not in loaded


def test_compact_small_folds_hive_partitions(spark):
    """r11: compact_small on a hive-partitioned table folds slivers
    PER PARTITION DIRECTORY (partition values restored from the dir
    names), leaving full-size files and single-sliver dirs by
    reference — the MergeTree within-partition merge. Previously
    partitioned tables never folded (only full compact())."""
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_hivefold_"),
        auto_compact_min_bytes=1 << 20,
    )
    store.create_database("s")
    base = spark.range(0, 300).selectExpr(
        "id as k", "cast(id % 3 as string) as part", "id * 2 as v"
    )
    store.write("s", "t", base, partition_by=["part"])
    # three sliver appends, each landing one file per partition dir
    for i in range(3):
        store.append(
            "s", "t",
            spark.range(1000 + i * 10, 1010 + i * 10).selectExpr(
                "id as k", "cast(id % 3 as string) as part", "id * 2 as v"
            ).coalesce(1),
        )
    m0 = store._manifest("s", "t")
    n_files0 = len(m0["files"])
    before = store.read("s", "t").orderBy("k").collect()
    folded = store.compact_small("s", "t")
    assert folded >= 6  # >= 2 slivers in each of 3 dirs (base incl.)
    m1 = store._manifest("s", "t")
    assert len(m1["files"]) < n_files0
    # every file still lives under a hive dir of its partition value
    assert all("part=" in fe["path"] for fe in m1["files"])
    after = store.read("s", "t").orderBy("k").collect()
    assert after == before
    # partition-column values survived the bare-file fold
    assert store.read("s", "t").filter("part = '1'").count() == sum(
        1 for r in before if r["part"] == "1"
    )
    # hive partition pruning still applies after the fold
    pruned = store.read("s", "t").filter("part = '2'")
    assert pruned.count() == sum(1 for r in before if r["part"] == "2")


def test_time_travel_survives_shard_folding(spark):
    """r11: snapshot roots share shards BY NAME, and GC keeps every
    shard referenced by a retained root — so time travel to a snapshot
    taken before many delta appends (and the small-shard folding they
    trigger) still reads the exact historical table."""
    store = TableStore(spark, tempfile.mkdtemp(prefix="manifest_tt_"))
    store.create_database("s")
    store.write("s", "t", spark.range(0, 100).selectExpr("id as k"))
    snap0 = store.snapshots("s", "t")[-1]["name"]
    # enough tiny appends to trip _SEG_FOLD_TRIGGER folding
    for i in range(10):
        store.append(
            "s", "t",
            spark.range(1000 + i * 10, 1010 + i * 10).selectExpr("id as k").coalesce(1),
        )
    m = store._manifest("s", "t")
    assert len(m["segments"]) < 11  # folding actually happened
    assert store.row_count("s", "t") == 200
    old = store.read_snapshot("s", "t", snap0)
    assert old.count() == 100
    assert old.agg({"k": "max"}).first()[0] == 99


def test_vacuum_reclaims_crash_orphans(spark, sf_smoke):
    """A writer dying between data-file land and pointer publish
    (r12 verdict item 3) leaves an orphaned g-* group and an s-*
    shard that no manifest references. Readers never see them (data
    lands before any manifest points at it); vacuum() reclaims both
    once they age past the grace, reports counts, and leaves every
    retained snapshot readable."""
    region = load_table(spark, sf_smoke, "region")
    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_vac_"), retention_sec=300
    )
    store.create_database("s")
    store.write("s", "t", region)
    store.append("s", "t", region.limit(2))
    tdir = store._tdir("s", "t")
    # simulate the crash: data group + file-list shard landed, no
    # root manifest / pointer publish ever happened (a dead process
    # holds no in-flight registry entries — the registry is cleared
    # by simply not registering these)
    orphan_g = os.path.join(tdir, "data", "g-deadbeef-crashed")
    os.makedirs(orphan_g)
    with open(os.path.join(orphan_g, "part-0.parquet"), "w") as f:
        f.write("x")
    orphan_s = os.path.join(tdir, "manifests", "s-deadbeef-crashed.json")
    with open(orphan_s, "w") as f:
        f.write('{"files": []}')
    before = store.read("s", "t").count()
    # young debris survives the default grace (could be another
    # process's in-flight write)...
    res = store.vacuum("s", "t")
    assert res["groups"] == 0 and res["segments"] == 0
    assert os.path.isdir(orphan_g) and os.path.exists(orphan_s)
    # ...and is reclaimed once the caller asserts it is stale
    res = store.vacuum("s", "t", older_than_sec=0)
    assert res["groups"] == 1 and res["segments"] == 1
    assert not os.path.isdir(orphan_g) and not os.path.exists(orphan_s)
    assert store.read("s", "t").count() == before
    from ora_ch_spark.store import TableNotFound

    with pytest.raises(TableNotFound):
        store.vacuum("s", "missing")


def test_vacuum_keeps_retained_snapshots_readable(spark, sf_smoke):
    """Concurrent-reader safety: vacuum(older_than_sec=0) computes
    liveness from EVERY retained manifest, so a time-travel reader
    holding a lazy plan on an older retained snapshot still collects
    fine after the vacuum removed genuine orphans next to it."""
    region = load_table(spark, sf_smoke, "region")
    store = TableStore(
        spark,
        tempfile.mkdtemp(prefix="manifest_vac2_"),
        keep_versions=3,
        retention_sec=300,
    )
    store.create_database("s")
    store.write("s", "t", region)
    v1 = store.snapshots("s", "t")[-1]["name"]
    store.append("s", "t", region.limit(3))
    old_reader = store.read_snapshot("s", "t", v1)  # lazy plan
    orphan_g = os.path.join(store._tdir("s", "t"), "data", "g-dead-2")
    os.makedirs(orphan_g)
    with open(os.path.join(orphan_g, "p.parquet"), "w") as f:
        f.write("x")
    res = store.vacuum("s", "t", older_than_sec=0)
    assert res["groups"] == 1
    assert old_reader.count() == region.count()  # v1 files intact
    assert store.read("s", "t").count() == region.count() + 3


def test_failed_write_releases_inflight_and_vacuums(spark, sf_smoke):
    """A write that THROWS mid-materialization (executor failure)
    must not pin its half-written group in the in-flight registry —
    otherwise vacuum could never reclaim it within the process's
    lifetime."""
    from ora_ch_spark.store import _INFLIGHT_GROUPS

    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_vac3_"), retention_sec=300
    )
    store.create_database("s")
    region = load_table(spark, sf_smoke, "region")
    store.write("s", "t", region)
    bad = spark.range(3).selectExpr(
        "assert_true(id < 2, 'boom') as chk", "id"
    )
    n_before = len(_INFLIGHT_GROUPS)
    with pytest.raises(Exception):
        store.append("s", "t", bad.select("id"))
    assert len(_INFLIGHT_GROUPS) == n_before, "failed write leaked inflight"
    # the half-written debris is now reclaimable
    store.vacuum("s", "t", older_than_sec=0)
    data_dirs = os.listdir(os.path.join(store._tdir("s", "t"), "data"))
    assert len(data_dirs) == 1  # only the committed group remains
    assert store.read("s", "t").count() == region.count()


def test_op_update_routing_on_1e6_file_manifest(spark, tmp_path):
    """r12 (verdict item 6): the O5 routing pre-checks hold at a
    MILLION-file manifest built on the sharded root. (a) A clustered
    update routes to the file-pruned path: the zone-map range
    pre-check (prune_files, zero Spark jobs, shard-level root-index
    skip) narrows 1e6 files to exactly the 2 real candidate files,
    the semi-join probe reads ONLY those, and replace_files rewrites
    only them. (b) A scattered update range is recognized at the
    decision level (candidates * 2 > total_files) so the full-merge
    fallback stays the worst case. (c) The probe cap saturates at
    AFFECTED_FILES_ABS_MAX — never half a million driver rows."""
    import time as _time

    import ora_ch_spark.operators.load_ops as LO
    from ora_ch_spark.io import load_table  # noqa: F401

    store = TableStore(spark, str(tmp_path / "huge_upd"))
    store.create_database("s")
    store.write(
        "s", "t",
        spark.range(0, 2000).selectExpr("id as k", "id * 2 as v").coalesce(2),
    )
    m0 = store._manifest("s", "t")
    real = list(m0["files"])
    assert len(real) == 2

    def entry(i: int) -> dict:
        fe = dict(real[0])
        fe["path"] = f"data/g-synth/part-{i:07d}.parquet"
        fe["rows"] = 1000
        # above auto_compact_min_bytes — the post-update sliver merge
        # must never classify the (fileless) synthetic entries as
        # small and try to read them
        fe["bytes"] = 256 << 20
        fe["stats"] = {
            "k": {"min": [10_000_000 + i * 1000, "int"],
                  "max": [10_000_000 + i * 1000 + 999, "int"], "nulls": 0},
            "v": {"min": [0, "int"], "max": [1, "int"], "nulls": 0},
        }
        return fe

    m = dict(m0)
    m["files"] = real + [entry(i) for i in range(1_000_000)]
    store._commit("s", "t", m)
    n_files = sum(ref["nfiles"] for ref in store._manifest("s", "t")["segments"])
    assert n_files == 1_000_002

    # (b+c) decision level: a scattered range keeps ~every file ⇒ the
    # router must choose full merge; and the probe cap formula
    # saturates at the absolute ceiling, not n_files // 2
    t0 = _time.perf_counter()
    cand, total = store.prune_files(
        "s", "t", "k >= 0 AND k <= 2000000000")
    prune_wall = _time.perf_counter() - t0
    assert total == 1_000_002 and len(cand) * 2 > total
    cap = min(max(64, n_files // 2), LO.AFFECTED_FILES_ABS_MAX)
    assert cap == LO.AFFECTED_FILES_ABS_MAX
    # (a) clustered update: range pre-check narrows to the real files
    t0 = _time.perf_counter()
    cand, total = store.prune_files("s", "t", "k >= 100 AND k <= 150")
    prune_narrow_wall = _time.perf_counter() - t0
    # the range lives entirely in the first real split (0..999) — the
    # zone maps prove the second (1000..1999) and every synthetic
    # file out
    real_paths = {fe["path"] for fe in real}
    assert set(cand) < real_paths and len(cand) == 1
    probed: list[list] = []
    orig_rwf = store.read_with_file

    def spy_rwf(schema, table, rel_paths=None, **kw):
        probed.append(rel_paths)
        return orig_rwf(schema, table, rel_paths, **kw)

    store.read_with_file = spy_rwf
    replaced: list[list] = []
    orig_replace = store.replace_files

    def spy_replace(schema, table, paths, df, **kw):
        replaced.append(list(paths))
        return orig_replace(schema, table, paths, df, **kw)

    store.replace_files = spy_replace
    spec = TableSpec(
        schema="s", name="t", operation=Operation.UPDATE,
        update_fields=["v"],
    )
    updates = spark.sql(
        "select id as k, cast(-7 as bigint) as v from range(100, 150)")
    try:
        t0 = _time.perf_counter()
        n = LO.op_update(store, spec, updates, key_columns=["k"])
        update_wall = _time.perf_counter() - t0
    finally:
        store.read_with_file = orig_rwf
        store.replace_files = orig_replace
    assert n == 50
    assert probed and all(list(p) == cand for p in probed)
    assert len(replaced) == 1 and replaced[0] == cand
    # values exact in the rewritten group (read it directly — the
    # synthetic entries have no backing files, so no full-table read)
    new_real = [
        fe["path"] for fe in store._manifest("s", "t")["files"]
        if not fe["path"].startswith("data/g-synth/")
    ]
    rows = {r["k"]: r["v"]
            for r in store.read_files("s", "t", new_real).collect()}
    assert all(rows[k] == -7 for k in range(100, 150))
    assert rows[99] == 198 and rows[150] == 300  # neighbors untouched
    print(f"1e6-file O5 routing: prune(wide)={prune_wall*1e3:.0f}ms "
          f"prune(narrow)={prune_narrow_wall*1e3:.0f}ms "
          f"update={update_wall:.1f}s")
    # prune is driver-only metadata work; generous ceilings, but they
    # pin the order of magnitude (shard skip ⇒ narrow ≪ wide)
    assert prune_narrow_wall < 2.0, prune_narrow_wall
    assert prune_wall < 60.0, prune_wall


def test_vacuum_concurrent_with_writers_and_readers(spark, sf_smoke):
    """vacuum racing live commits and reads must never break either
    side: the in-flight registry protects uncommitted groups from the
    0-grace vacuum, readers never hit a missing file, and the final
    state is consistent."""
    import threading

    store = TableStore(
        spark, tempfile.mkdtemp(prefix="manifest_vacrace_"),
        retention_sec=300,
    )
    store.create_database("s")
    region = load_table(spark, sf_smoke, "region")
    store.write("s", "t", region)
    errors = []

    def writer():
        try:
            for _ in range(5):
                store.append("s", "t", region.limit(1))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def vacuumer():
        try:
            for _ in range(8):
                store.vacuum("s", "t", older_than_sec=0)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def reader():
        try:
            for _ in range(8):
                store.read("s", "t").count()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=f) for f in (writer, vacuumer, reader)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert store.read("s", "t").count() == region.count() + 5


def test_full_rewrite_detects_interleaved_commit(spark, tmp_path):
    """r13: maintenance FULL rewrites (compact / deduplicate / the
    partitioned delete paths) publish with a compare-and-swap on the
    snapshot they were computed from. An append landing between the
    rewrite's snapshot read and its pointer swap must make the
    publish fail LOUDLY (StoreConflict) — before r13 the rewrite
    silently discarded the appended rows — and the append survives."""
    import pytest as _pytest

    from ora_ch_spark.store import StoreConflict

    store = TableStore(spark, str(tmp_path / "casrw"))
    store.create_database("s")
    store.write("s", "t", spark.range(0, 100).selectExpr("id as k"))

    orig = store._write_group
    fired = {"done": False}

    def sneaky(schema, table, df, partition_by, bloom_columns=None):
        # interleave a real append while the compact's data files are
        # being written (i.e. after its snapshot read, before publish)
        if not fired["done"]:
            fired["done"] = True
            store.append("s", "t", spark.range(100, 110).selectExpr("id as k"))
        return orig(schema, table, df, partition_by, bloom_columns)

    store._write_group = sneaky
    try:
        with _pytest.raises(StoreConflict, match="concurrent commit"):
            store.compact("s", "t")
    finally:
        store._write_group = orig
    # the interleaved append's rows are intact, nothing lost
    assert store.row_count("s", "t") == 110

    # same guard on deduplicate
    fired["done"] = False
    store._write_group = sneaky
    try:
        with _pytest.raises(StoreConflict, match="concurrent commit"):
            store.deduplicate("s", "t")
    finally:
        store._write_group = orig
    assert store.row_count("s", "t") == 120
    # and with no interference the maintenance rewrites succeed
    store.deduplicate("s", "t")
    assert store.row_count("s", "t") == 110  # dups from the two appends
    store.compact("s", "t")
    assert store.row_count("s", "t") == 110


def test_commit_gc_amortized_cadence(spark, tmp_path):
    """r14 (verdict item 4): the retention-GC scan is OFF the
    per-commit path — it runs on the first commit of a table (cold
    state), then every gc_every-th commit (or after retention_sec,
    not reachable in this fast test), so commit latency at history
    depth is no longer dominated by the manifests-dir walk. Cold
    state counts as freshly scanned (barrier-starting writer fleets
    must not all walk a deep dir on their first commit). Policy
    unchanged: zero-retention stores keep the eager every-commit
    scan (their callers contract on the very next commit
    collecting — pinned by test_gc_respects_retention_grace and the
    partition-drop test)."""
    from ora_ch_spark.store import TableStore

    def spy(store):
        calls = []
        orig = store._gc

        def wrapped(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        store._gc = wrapped
        return calls

    store = TableStore(spark, str(tmp_path / "am"), gc_every=4)
    calls = spy(store)
    store.create_database("s")
    df = spark.range(5).selectExpr("id as k")
    store.write("s", "t", df)          # commit 1: cold -> counted, no scan
    for _ in range(2):
        store.append("s", "t", df)     # commits 2-3: amortized away
    assert calls == []
    store.append("s", "t", df)         # commit 4: gc_every-th -> scan
    assert len(calls) == 1
    for _ in range(3):
        store.append("s", "t", df)     # commits 5-7: amortized away
    assert len(calls) == 1
    store.append("s", "t", df)         # commit 8: scan again
    assert len(calls) == 2
    # nothing lost while scans were skipped
    assert store.row_count("s", "t") == 40

    eager = TableStore(
        spark, str(tmp_path / "ez"), keep_versions=0, retention_sec=0.0,
        gc_every=8,
    )
    ecalls = spy(eager)
    eager.create_database("s")
    eager.write("s", "t", df)
    eager.append("s", "t", df)
    eager.append("s", "t", df)
    assert len(ecalls) == 3, "zero-retention store must scan every commit"
